"""Autoregressive pose2frame rendering engine.

Replaces the reference's per-frame GPU inference loop — vid2vid
``test.py --dataset_mode pose --openpose_only --no_first_img --how_many
1200`` walking JPEG label files one at a time (reference:
text2video_audio.sh:42; SURVEY.md §3.1 hot loop #4) — with a single
jitted ``lax.scan`` over the whole utterance:

  * the label maps for all T frames live on device as one [T, H, W, 3]
    array (produced by ops/rasterize.py without ever touching disk);
  * the autoregressive dependence (each frame warps the previous output)
    is the scan carry;
  * utterance length is bucketed to multiples of ``time_bucket`` so XLA
    compiles one program per (bucket, H, W), not one per sentence;
  * multiple utterances batch on a leading axis sharded over the mesh's
    "data" axis — cross-utterance parallelism is how a sequential model
    fills a TPU pod (SURVEY.md §2.5).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from text2video_tpu.config import RenderConfig
from text2video_tpu.models.generator import CompositeGenerator


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@dataclasses.dataclass
class Renderer:
    """Holds generator params and compiled render programs."""

    generator: CompositeGenerator
    params: dict
    config: RenderConfig = dataclasses.field(default_factory=RenderConfig)
    time_bucket: int = 64

    @staticmethod
    def create(
        config: Optional[RenderConfig] = None,
        height: int = 384,
        width: int = 512,
        seed: int = 0,
        base_ch: int = 64,
        n_blocks: int = 9,
        dtype=jnp.bfloat16,
    ) -> "Renderer":
        """Random-init renderer (weights come from training / checkpoints)."""
        config = config or RenderConfig()
        gen = CompositeGenerator(base_ch=base_ch, n_blocks=n_blocks, dtype=dtype)
        labels = jnp.zeros((1, height, width, 3 * config.n_frames_ctx))
        prev = jnp.zeros((1, height, width, 3 * config.use_prev_frames))
        params = gen.init(jax.random.PRNGKey(seed), labels, prev, jnp.ones((1,)))
        return Renderer(generator=gen, params=params, config=config or RenderConfig())

    # ------------------------------------------------------------------

    def _scan_step(self, params, carry, label):
        """One autoregressive step. carry: (prev_imgs, prev_labels, step)."""
        prev_imgs, prev_labels, step = carry
        labels_ctx = jnp.concatenate([label, prev_labels], axis=-1)
        has_prev = jnp.broadcast_to(
            (step > 0).astype(jnp.float32), (label.shape[0],)
        )
        frame, _, _ = self.generator.apply(
            params, labels_ctx, prev_imgs, has_prev
        )
        frame = frame.astype(prev_imgs.dtype)
        new_prev_imgs = jnp.concatenate(
            [frame, prev_imgs[..., :-3]], axis=-1
        )
        new_prev_labels = jnp.concatenate(
            [label, prev_labels[..., :-3]], axis=-1
        )
        return (new_prev_imgs, new_prev_labels, step + 1), frame

    @property
    def _render_jit(self):
        """Per-instance jitted render program (cached)."""
        fn = getattr(self, "_render_jit_cache", None)
        if fn is None:
            fn = jax.jit(self._render_impl)
            object.__setattr__(self, "_render_jit_cache", fn)
        return fn

    def _render_impl(self, params, labels: jax.Array) -> jax.Array:
        """labels: [B, T, H, W, 3] in [-1, 1] -> frames [B, T, H, W, 3]."""
        b, t, h, w, _ = labels.shape
        cfg = self.config
        dt = jnp.float32
        prev_imgs = jnp.zeros((b, h, w, 3 * cfg.use_prev_frames), dt)
        prev_labels = jnp.zeros((b, h, w, 3 * (cfg.n_frames_ctx - 1)), dt)
        step = jnp.zeros((), jnp.int32)

        labels_t = jnp.moveaxis(labels.astype(dt), 1, 0)  # [T,B,H,W,3]

        def step_fn(carry, lab):
            return self._scan_step(params, carry, lab)

        _, frames = jax.lax.scan(
            step_fn, (prev_imgs, prev_labels, step), labels_t
        )
        return jnp.moveaxis(frames, 0, 1)  # [B,T,H,W,3]

    # ------------------------------------------------------------------

    def render(self, labels_u8: np.ndarray) -> np.ndarray:
        """[T, H, W, 3] uint8 label maps -> [T, H, W, 3] uint8 frames."""
        t = labels_u8.shape[0]
        t_pad = min(
            _round_up(max(t, 1), self.time_bucket), self.config.max_frames
        )
        t_use = min(t, self.config.max_frames)
        labels = labels_u8[:t_use].astype(np.float32) / 127.5 - 1.0
        if t_pad > t_use:
            labels = np.concatenate(
                [labels, np.zeros((t_pad - t_use,) + labels.shape[1:], np.float32)]
            )
        frames = self._render_jit(self.params, jnp.asarray(labels[None]))
        frames = np.asarray(frames[0, :t_use], dtype=np.float32)
        return np.clip((frames + 1.0) * 127.5, 0, 255).astype(np.uint8)
