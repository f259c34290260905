"""Device color-space conversion for the frame-return path.

The host<->device link is the end-to-end bottleneck (the reference never
has this problem: its GPU and muxer share a PCIe-local filesystem,
text2video_audio.sh:42-44). Raw RGB uint8 frames cost 3 bytes/px; every
final container is chroma-subsampled anyway (mp4 yuv420p, MJPEG 4:2:0),
so frames convert to studio-swing BT.601 YUV420 on device and cross the
link at 1.5 bytes/px — lossless relative to the *encoded* output.

Coefficients are the ITU-R BT.601 studio-swing matrix, verified to
round-trip against cv2.COLOR_YUV2BGR_I420 within 1 gray level on flat
colors (tests/test_video_mux.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def rgb_norm_to_yuv420_float(frames: jnp.ndarray):
    """[..., H, W, 3] float frames in [-1, 1] (H, W even) ->
    (y [..., H, W], u [..., H/2, W/2], v [..., H/2, W/2]) float32 planes
    in 0..255 (not yet rounded — feedstock for the uint8 wire format or
    the DCT wire codec, ops/dct.py)."""
    x = (frames.astype(jnp.float32) + 1.0) * 127.5
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 16.0 + (65.738 * r + 129.057 * g + 25.064 * b) * (1.0 / 256.0)
    u = 128.0 + (-37.945 * r - 74.494 * g + 112.439 * b) * (1.0 / 256.0)
    v = 128.0 + (112.439 * r - 94.154 * g - 18.285 * b) * (1.0 / 256.0)

    def _sub(c):
        s = c.shape
        c = c.reshape(s[:-2] + (s[-2] // 2, 2, s[-1] // 2, 2))
        return c.mean(axis=(-3, -1))

    return y, _sub(u), _sub(v)


def rgb_norm_to_yuv420(frames: jnp.ndarray):
    """[..., H, W, 3] float frames in [-1, 1] (H, W even) ->
    (y [..., H, W], u [..., H/2, W/2], v [..., H/2, W/2]) uint8."""
    y, u, v = rgb_norm_to_yuv420_float(frames)

    def _u8(c):
        return jnp.clip(jnp.round(c), 0.0, 255.0).astype(jnp.uint8)

    return _u8(y), _u8(u), _u8(v)
