"""Fused 3x3 conv + instance-norm statistics as a Pallas TPU kernel —
the residual-block hot path of the pose2frame generator.

Capability target: the 18 reflect-padded 3x3 convs of the vid2vid-style
residual stack (reference: the external vid2vid fork's ResnetBlock,
SURVEY.md §2.3), which carry ~66% of the generator's FLOPs. XLA's
batch-1 lowering space-to-batches each conv and materializes an
~18 MB windowed layout copy per conv against a 3 MB activation
(out/hlo_r4c, the [50,4,8,11,512] copies) — the measured reason the
forward sits at ~39% MFU against an 88% roofline.

The kernel keeps the reflect-padded activation in HBM and DMAs each
grid step's row tile (with its 1-row halo) into a VMEM scratch — full
VMEM residency OOM'd the 16 MiB scoped budget at the 896-wide xuesong
trunk — then runs the conv as nine static-shift [TH*W, C] @ [C, C] MXU
contractions with float32 accumulation, adds the bias, and emits

  * the conv output in the compute dtype, and
  * per-row-tile partial sums (sum, sum of squares) per channel,

so the caller finishes the instance-norm statistics with a tiny [T, C]
reduction and applies the affine + relu (+ residual add) as ordinary
XLA elementwise work that fuses into neighbours. HBM traffic per conv
drops to read x + write y + weights (~11 MB) and the stats come from
the f32 accumulator — strictly more precise than the bf16-rounded
activation XLA reduces today.

Off-TPU the kernel runs in Pallas interpret mode, so the CPU test mesh
exercises the same code path (pattern from ops/fused_pose.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _pick_tile(h: int, w: int, c: int, elt: int) -> int:
    """Largest row-tile dividing h whose kernel VMEM footprint fits
    well under the 16 MiB scoped budget. Resident per grid step: the
    DMA'd input tile ((th+2)(w+2)c), the weights (9c^2), the f32
    accumulator (th*w*c*4) and the double-buffered output block
    (2*th*w*c*elt — Mosaic pipelines outputs, which an earlier
    full-input-residency version of this kernel did not account for
    and OOM'd at the 896-wide xuesong shape: 18.97M > 16M)."""
    budget = 12 * 1024 * 1024
    for th in (16, 12, 8, 4, 2, 1):
        if h % th:
            continue
        need = (
            (th + 2) * (w + 2) * c * elt
            + 9 * c * c * elt
            + th * w * c * 4
            + 2 * th * w * c * elt
        )
        if need <= budget:
            return th
    return 1


def _conv_kernel(xp_hbm, k_ref, b_ref, y_ref, part_ref, scratch, sem, *,
                 th, w, c, out_dtype):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bi = pl.program_id(0)
    i = pl.program_id(1)
    # Input stays in HBM (batch rides the grid — vmap cannot batch an
    # ANY-space operand); copy this tile's th+2 rows (row halo
    # included) into the VMEM scratch. The copy is microseconds against
    # the tile's ~th*w*c*c*18 FLOP of MXU work.
    dma = pltpu.make_async_copy(
        xp_hbm.at[bi, pl.ds(i * th, th + 2)], scratch, sem
    )
    dma.start()
    dma.wait()
    acc = jnp.zeros((th * w, c), jnp.float32)
    for dy in range(3):
        rows = scratch[pl.ds(dy, th), :, :]  # [th, w+2, c]
        for dx in range(3):
            xs = rows[:, dx : dx + w, :].reshape(th * w, c)
            acc = acc + jax.lax.dot_general(
                xs,
                k_ref[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc = acc + b_ref[0][None, :]
    y_ref[0] = acc.reshape(th, w, c).astype(out_dtype)
    part_ref[0, 0, 0, :] = jnp.sum(acc, axis=0)
    part_ref[0, 0, 1, :] = jnp.sum(acc * acc, axis=0)


@functools.partial(jax.jit, static_argnames=("w", "interpret"))
def _conv3x3_stats_batched(xp, k, b, *, w: int, interpret: bool):
    """xp [B, H+2, >=W+2, C] (compute dtype, W axis 8-aligned), k
    [3, 3, C, C] (compute dtype), b [1, C] f32 -> (y [B, H, W, C]
    compute dtype, parts [B, T, 2, C] f32). Batch rides the leading
    grid axis."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, hp, wp, c = xp.shape
    h = hp - 2
    th = _pick_tile(h, w, c, xp.dtype.itemsize)
    n_tiles = h // th
    kernel = functools.partial(
        _conv_kernel, th=th, w=w, c=c, out_dtype=xp.dtype
    )
    return pl.pallas_call(
        kernel,
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # HBM; DMA'd per tile
            pl.BlockSpec((3, 3, c, c), lambda bi, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, th, w, c), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, c), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h, w, c), xp.dtype),
            jax.ShapeDtypeStruct((bsz, n_tiles, 2, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((th + 2, wp, c), xp.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, k, b)


def conv3x3_stats(
    x: jax.Array, k: jax.Array, b: jax.Array, interpret: bool = None
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Reflect-padded 3x3 conv + bias with fused IN statistics.

    x [B, H, W, C] compute dtype, k [3, 3, C, C] float32 params,
    b [C] float32 -> (y [B, H, W, C], mean [B, C] f32, var [B, C] f32).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz, h, w, c = x.shape
    xp = jnp.pad(
        x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect"
    )
    # Mosaic DMAs slice the HBM array along the sublane-tiled W axis,
    # which must be 8-aligned (measured: "Slice shape along dimension 2
    # must be aligned to tiling (8), but is 114" at the 896-wide
    # shape); pad W+2 up with zero columns the window loop never reads.
    wpad = (-(w + 2)) % 8
    if wpad:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, wpad), (0, 0)))
    kc = k.astype(x.dtype)
    b2 = b.reshape(1, c).astype(jnp.float32)
    y, parts = _conv3x3_stats_batched(
        xp, kc, b2, w=w, interpret=interpret
    )
    n = float(h * w)
    s1 = jnp.sum(parts[:, :, 0, :], axis=1)
    s2 = jnp.sum(parts[:, :, 1, :], axis=1)
    mean = s1 / n
    var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
    return y, mean, var
