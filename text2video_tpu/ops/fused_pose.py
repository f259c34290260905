"""Fused pose synthesis: table gather + blend + IIR smoothing + mouth
re-pin in ONE Pallas kernel.

This is the BASELINE.json "fuse interp_landmarks_motion's interpolation and
temporal smoothing into a single Pallas kernel" item. The reference runs
these as two Python passes re-reading JSON files per frame
(...VidTIMIT_smooth.py:151-173, 230-267); ops/interp.py + ops/smooth.py
already fuse them into one XLA program (gather + lax.scan). This kernel
goes one step further for the serial part:

  * the whole keypoint table (N x 285 floats — ~1 MB for fadg0) and the
    utterance tracks live in VMEM for the kernel's lifetime;
  * pass 1 blends all T frames (two dynamic-row reads per frame);
  * pass 2 runs the recursive smoothing **in place**: rows behind the
    cursor already hold smoothed values when the window reads them, which
    is exactly the reference's mutate-while-iterating semantics, and the
    mouth re-pin uses the not-yet-overwritten current row;
  * one kernel launch replaces a T-step lax.scan of 285-float FMAs, whose
    per-step overhead dominates at these sizes.

Indices/weights ride in SMEM (scalar memory); tracks are padded to lane
multiples (face 210->256, pose 75->128). Falls back to interpret mode off
TPU, so the CPU test mesh runs the same code path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from text2video_tpu.ops.smooth import (
    MOUTH_CENTER_HI,
    MOUTH_CENTER_LO,
    MOUTH_HI,
    MOUTH_LO,
)

FACE_D, FACE_PAD = 210, 256
POSE_D, POSE_PAD = 75, 128


def _kernel(
    t_actual_ref,  # SMEM [1] int32
    i1_ref,        # SMEM [Tpad] int32
    i2_ref,        # SMEM [Tpad] int32
    w2_ref,        # SMEM [Tpad] float32
    tabf_ref,      # VMEM [N, FACE_PAD] float32
    tabp_ref,      # VMEM [N, POSE_PAD] float32
    outf_ref,      # VMEM [Tpad, FACE_PAD] float32 (output)
    outp_ref,      # VMEM [Tpad, POSE_PAD] float32 (output)
    *,
    t_pad: int,
    smooth_width: int,
):
    import jax.experimental.pallas as pl

    t_actual = t_actual_ref[0]

    # ---- pass 1: gather + blend --------------------------------------
    def blend_body(t, _):
        i1 = i1_ref[t]
        i2 = i2_ref[t]
        w2 = w2_ref[t]
        f1 = tabf_ref[pl.ds(i1, 1), :]
        f2 = tabf_ref[pl.ds(i2, 1), :]
        outf_ref[pl.ds(t, 1), :] = f1 * (1.0 - w2) + f2 * w2
        p1 = tabp_ref[pl.ds(i1, 1), :]
        p2 = tabp_ref[pl.ds(i2, 1), :]
        outp_ref[pl.ds(t, 1), :] = p1 * (1.0 - w2) + p2 * w2
        return 0

    jax.lax.fori_loop(0, t_pad, blend_body, 0)

    # ---- pass 2: in-place recursive smoothing + mouth re-pin ---------
    # Window s in [-sw, sw) with weight 1/(|s|+1); rows at s<0 are already
    # smoothed (IIR feedback), s>=0 still original.
    def smooth_body(t, _):
        cur_f = outf_ref[pl.ds(t, 1), :]
        sum_f = jnp.zeros((1, FACE_PAD), jnp.float32)
        sum_p = jnp.zeros((1, POSE_PAD), jnp.float32)
        sum_w = jnp.zeros((), jnp.float32)
        for s in range(-smooth_width, smooth_width):
            sidx = t + s
            valid = jnp.logical_and(sidx >= 0, sidx < t_actual)
            clamped = jnp.clip(sidx, 0, t_pad - 1)
            wt = jnp.where(valid, 1.0 / (abs(s) + 1.0), 0.0)
            sum_f += outf_ref[pl.ds(clamped, 1), :] * wt
            sum_p += outp_ref[pl.ds(clamped, 1), :] * wt
            sum_w += wt
        inv = 1.0 / jnp.maximum(sum_w, 1e-20)
        ave_f = sum_f * inv
        ave_p = sum_p * inv

        # Mouth re-pin (reference mouth_center/mouth_shift):
        # centre = mean of points [48, 60); shift original points [48, 68)
        # by (smoothed centre - original centre) in x,y and paste. No
        # .at[].set(): scatter has no Pallas TPU lowering — the paste is a
        # lane-mask select and the shift a broadcast over a lane pattern.
        lo, hi = MOUTH_LO * 3, MOUTH_HI * 3
        clo, chi = MOUTH_CENTER_LO * 3, MOUTH_CENTER_HI * 3
        n_c = MOUTH_CENTER_HI - MOUTH_CENTER_LO
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, FACE_PAD), 1)
        center_mask = jnp.logical_and(lane >= clo, lane < chi)
        # Per-channel means over the centre points (x: lane%3==0, y: ==1).
        chan = lane % 3
        def cmean(row, c):
            sel = jnp.logical_and(center_mask, chan == c)
            return jnp.sum(jnp.where(sel, row, 0.0)) / n_c
        off_x = cmean(ave_f, 0) - cmean(cur_f, 0)
        off_y = cmean(ave_f, 1) - cmean(cur_f, 1)
        off_row = jnp.where(chan == 0, off_x,
                            jnp.where(chan == 1, off_y, 0.0))
        mouth_mask = jnp.logical_and(lane >= lo, lane < hi)
        ave_f = jnp.where(mouth_mask, cur_f + off_row, ave_f)

        keep = t < t_actual
        outf_ref[pl.ds(t, 1), :] = jnp.where(keep, ave_f, cur_f)
        cur_p = outp_ref[pl.ds(t, 1), :]
        outp_ref[pl.ds(t, 1), :] = jnp.where(keep, ave_p, cur_p)
        return 0

    jax.lax.fori_loop(0, t_pad, smooth_body, 0)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("t_pad", "smooth_width", "interpret"))
def _fused_call(
    tabf, tabp, t_actual, i1, i2, w2, *, t_pad, smooth_width, interpret
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(
        _kernel, t_pad=t_pad, smooth_width=smooth_width
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, FACE_PAD), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, POSE_PAD), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(t_actual, i1, i2, w2, tabf, tabp)


# VMEM budget for (table + tracks); beyond this fall back to the XLA path.
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def fits_vmem(n_rows: int, t_frames: int) -> bool:
    table = n_rows * (FACE_PAD + POSE_PAD) * 4
    tracks = _round_up(max(t_frames, 1), 128) * (FACE_PAD + POSE_PAD) * 4
    return table + tracks <= _VMEM_BUDGET_BYTES


def synthesize_and_smooth_pallas(
    plan, table, smooth_width: int = 4, interpret: bool | None = None
) -> Tuple[np.ndarray, np.ndarray]:
    """PosePlan + KeypointTable -> smoothed (face [T,210], pose [T,75]).

    One fused kernel; numerical contract matches
    synthesize_device + smooth_device within float32 tolerance.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    t = plan.num_frames
    t_pad = _round_up(t, 128)

    face_tab, pose_tab = table.tracks_f32()
    tabf = jnp.pad(face_tab, ((0, 0), (0, FACE_PAD - FACE_D)))
    tabp = jnp.pad(pose_tab, ((0, 0), (0, POSE_PAD - POSE_D)))

    def pad_idx(x, dtype):
        out = np.zeros(t_pad, dtype)
        out[:t] = x
        return jnp.asarray(out)

    outf, outp = _fused_call(
        tabf,
        tabp,
        jnp.asarray([t], jnp.int32),
        pad_idx(plan.i1, np.int32),
        pad_idx(plan.i2, np.int32),
        pad_idx(plan.w2.astype(np.float32), np.float32),
        t_pad=t_pad,
        smooth_width=smooth_width,
        interpret=interpret,
    )
    return (
        np.asarray(outf[:t, :FACE_D], dtype=np.float64),
        np.asarray(outp[:t, :POSE_D], dtype=np.float64),
    )
