"""Truncated-DCT wire codec for the frame-return path.

The tunneled host<->device link (~9 MB/s here) is the end-to-end
bottleneck; the reference never sees it because its GPU and muxer share a
PCIe-local filesystem (reference: text2video_audio.sh:42-44). YUV420
already halves raw RGB; this codec takes the remaining step the final
containers take anyway (mp4/MJPEG are 8x8-DCT codecs): each YUV plane is
transformed on device with an 8x8 blockwise DCT, quantized with
JPEG-style tables, and only the first K zigzag coefficients cross the
link as int8 — ~4x fewer bytes than YUV420 at visually transparent
quality (roundtrip PSNR bounds in tests/test_wire_codec.py). The host
side (dequantize + IDCT, two small matmuls over all blocks at once) runs
between chunk pulls, off the critical path.

Everything device-side is static-shaped dense math (one stride-8
convolution against the quant-scaled DCT basis) — exactly what XLA
tiles onto the MXU;
there is no entropy coding because variable-length output would force a
host round trip, and the fixed-K truncation already captures most of the
win.
"""

from __future__ import annotations

import numpy as np

try:  # jax is optional for the host-side decoder
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jnp = None

# Standard JPEG zigzag order: ZIGZAG[i] = row-major index of the i-th
# zigzag coefficient.
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int32,
)

# Annex-K JPEG base quantization tables (quality 50).
_LUMA_BASE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)
_CHROMA_BASE = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float64,
)

# int8 coefficient safety floors: the orthonormal DCT of a 128-shifted
# uint8 block is bounded by |coef| <= 1024, so a quantizer step below
# 1024/127 ~ 8.07 could clip the DC of an extreme flat block. AC floors
# guard hard synthetic edges (real GAN frames sit far inside the range).
_DC_MIN = 9.0
_AC_MIN = 5.0


def dct_matrix8() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix (float32)."""
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    d = np.cos((2 * n + 1) * k * np.pi / 16.0)
    d[0] *= 1.0 / np.sqrt(2.0)
    return (d * 0.5).astype(np.float32)


def quant_tables(quality: int = 80):
    """JPEG-style quality scaling -> (luma, chroma) float32 8x8 tables,
    floored so quantized coefficients always fit int8."""
    quality = int(np.clip(quality, 1, 100))
    scale = 5000.0 / quality if quality < 50 else 200.0 - 2.0 * quality

    def _scaled(base):
        q = np.floor((base * scale + 50.0) / 100.0)
        q = np.clip(q, _AC_MIN, 255.0)
        q[0, 0] = max(q[0, 0], _DC_MIN)
        return q.astype(np.float32)

    return _scaled(_LUMA_BASE), _scaled(_CHROMA_BASE)


def _encode_kernel(quant: np.ndarray, k: int) -> np.ndarray:
    """[8, 8, 1, k] conv kernel whose output channel c is the c-th zigzag
    DCT-II basis function pre-divided by its quantizer step:
    K[u, v, 0, c] = D[zr(c), u] * D[zc(c), v] / quant[zr(c), zc(c)]."""
    d = dct_matrix8()
    zr, zc = ZIGZAG[:k] // 8, ZIGZAG[:k] % 8
    basis = d[zr][:, :, None] * d[zc][:, None, :]  # [k, 8, 8]
    scale = quant.astype(np.float32)[zr, zc]  # [k]
    return np.transpose(
        basis / scale[:, None, None], (1, 2, 0)
    )[:, :, None, :].astype(np.float32)


def encode_plane(plane, quant, k: int):
    """Device encode: [..., H, W] float plane (0..255) -> [..., ceil(H/8),
    ceil(W/8), k] int8 of zigzag-truncated quantized DCT coefficients.

    The blockwise 8x8 DCT + quantize + zigzag-truncate collapses into ONE
    stride-8 convolution with a [8, 8, 1, k] kernel of quant-scaled basis
    functions: a single MXU-shaped op instead of per-block 8x8
    contractions (the einsum formulation lowered to thousands of tiny
    dots and cost ~38 ms/frame on a v5e — ~5x the whole generator).

    Planes whose dims are not multiples of 8 (e.g. the 540x960 chroma of
    a 1080p canvas) are edge-padded up; the decoder returns the padded
    size and the caller crops (render.py::render_stream_yuv)."""
    h, w = plane.shape[-2:]
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        pad = [(0, 0)] * (plane.ndim - 2) + [(0, ph), (0, pw)]
        plane = jnp.pad(plane, pad, mode="edge")
        h, w = h + ph, w + pw
    lead = plane.shape[:-2]
    x = plane.astype(jnp.float32).reshape((-1, h, w, 1)) - 128.0
    kern = jnp.asarray(_encode_kernel(np.asarray(quant), k))
    import jax

    q = jax.lax.conv_general_dilated(
        x, kern,
        window_strides=(8, 8),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    q = jnp.round(q).reshape(lead + (h // 8, w // 8, k))
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


_DECODE_KERNELS: dict = {}


def _decode_kernel(quant: np.ndarray, k: int) -> np.ndarray:
    """[k, 64] dequant+IDCT matrix: row c is the c-th zigzag basis block
    (flattened row-major) scaled by its quantizer step, so decoding is
    ONE BLAS matmul ``coeffs @ K``. (A 3-operand np.einsum here ran the
    naive nested-loop path: 25 s per 32-frame plane — 100x the
    transfer it was supposed to hide.)"""
    key = (quant.tobytes(), k)
    kern = _DECODE_KERNELS.get(key)
    if kern is None:
        d = dct_matrix8()
        zr, zc = ZIGZAG[:k] // 8, ZIGZAG[:k] % 8
        basis = d[zr][:, :, None] * d[zc][:, None, :]  # [k, 8, 8]
        scale = quant.astype(np.float32)[zr, zc]  # [k]
        kern = (basis * scale[:, None, None]).reshape(k, 64)
        _DECODE_KERNELS[key] = kern
    return kern


def decode_plane_np(coeffs: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """Host decode: [..., Hb, Wb, k] int8 -> [..., Hb*8, Wb*8] uint8.

    Dequantize + IDCT as a single [N*Hb*Wb, k] @ [k, 64] matmul —
    ~25 MFLOP/frame at 512x384, negligible next to the transfer it
    replaces."""
    *lead, hb, wb, k = coeffs.shape
    kern = _decode_kernel(np.asarray(quant), k)
    flat = coeffs.reshape(-1, k).astype(np.float32) @ kern
    blocks = flat.reshape(*lead, hb, wb, 8, 8)
    pix = np.moveaxis(blocks, -3, -2).reshape(*lead, hb * 8, wb * 8)
    # np.rint, not np.round: round's decimals machinery ran ~1000x
    # slower on this host class for large arrays.
    return np.clip(np.rint(pix + 128.0), 0.0, 255.0).astype(np.uint8)


def encode_yuv(y, u, v, quality: int = 80, k_luma: int = 20,
               k_chroma: int = 8):
    """Device encode of float YUV planes (0..255) -> int8 coefficient
    arrays (yq, uq, vq)."""
    lq, cq = quant_tables(quality)
    return (
        encode_plane(y, lq, k_luma),
        encode_plane(u, cq, k_chroma),
        encode_plane(v, cq, k_chroma),
    )


def decode_yuv_np(yq, uq, vq, quality: int = 80):
    """Host decode of pulled int8 coefficient arrays -> uint8 planes."""
    lq, cq = quant_tables(quality)
    return (
        decode_plane_np(np.asarray(yq), lq),
        decode_plane_np(np.asarray(uq), cq),
        decode_plane_np(np.asarray(vq), cq),
    )
