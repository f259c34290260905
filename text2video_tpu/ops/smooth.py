"""Temporal smoothing with mouth re-pinning.

The reference smooths face (210-dim) and pose (75-dim) tracks with an
asymmetric inverse-distance window ``s in range(-smooth_width, smooth_width)``
(note: excludes +smooth_width) weighted ``1/(|s|+1)``, then *re-pins the
mouth*: the original (un-smoothed) mouth points 48-67 are shifted by the
difference of smoothed vs original mouth centers (average of points 48-59)
and pasted over the smoothed face, so lip articulation is not blurred
(reference: interp_landmarks_motion_phoneme_VidTIMIT_smooth.py:230-258,
mouth_center/mouth_shift at :104-114).

Crucial quirk: the reference mutates its frame list *in place* while
iterating (:257-258), so neighbors at negative offsets contribute their
already-smoothed, mouth-re-pinned values — the filter is recursive (IIR),
not a plain convolution. Both implementations here preserve that:
``smooth_host`` is the bit-exact float64 sequential loop; ``smooth_device``
is a float32 ``lax.scan`` carrying the last ``smooth_width`` smoothed frames.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

MOUTH_CENTER_LO, MOUTH_CENTER_HI = 48, 60  # points averaged for the center
MOUTH_LO, MOUTH_HI = 48, 68  # points shifted & re-pinned


def smooth_host(
    face: np.ndarray, pose: np.ndarray, smooth_width: int = 4
) -> Tuple[np.ndarray, np.ndarray]:
    """(face [T,210], pose [T,75]) float64 -> smoothed copies, bit-exact.

    ``wf``/``wp`` play the role of the reference's in-place-mutated
    ``jsonlist``: rows before the current index already hold smoothed
    values when the window reads them.
    """
    T = face.shape[0]
    wf = face.copy()
    wp = pose.copy()
    for idx in range(T):
        sum_fc = np.zeros((1, 210), dtype=np.float64)
        sum_ps = np.zeros((1, 75), dtype=np.float64)
        sum_w = 0.0
        for s in range(-smooth_width, smooth_width):
            sidx = s + idx
            if 0 <= sidx < T:
                wt = 1.0 / (abs(s) + 1.0)
                sum_fc += wf[sidx] * wt
                sum_ps += wp[sidx] * wt
                sum_w += wt
        ave_fc = sum_fc / sum_w
        ave_ps = sum_ps / sum_w

        orig_fc = wf[idx].copy()
        c_t = np.average(
            ave_fc.reshape(70, 3)[MOUTH_CENTER_LO:MOUTH_CENTER_HI, :], axis=0
        )
        c_s = np.average(
            orig_fc.reshape(70, 3)[MOUTH_CENTER_LO:MOUTH_CENTER_HI, :], axis=0
        )
        off = c_t - c_s
        for i in range(MOUTH_LO, MOUTH_HI):
            orig_fc[i * 3] = orig_fc[i * 3] + off[0]
            orig_fc[i * 3 + 1] = orig_fc[i * 3 + 1] + off[1]
        ave_fc[0, MOUTH_LO * 3 : MOUTH_HI * 3] = orig_fc[
            MOUTH_LO * 3 : MOUTH_HI * 3
        ]
        wf[idx] = ave_fc[0]
        wp[idx] = ave_ps[0]
    return wf, wp


def smooth_device(face, pose, smooth_width: int = 4):
    """Float32 recursive smoothing as a ``lax.scan`` over frames.

    The carry holds the last ``smooth_width`` smoothed frames (the IIR
    feedback); future frames are read from static shifts of the input. The
    per-step work is a handful of 285-float FMAs — latency-bound but tiny,
    and fused into one compiled program with the interpolation gather that
    feeds it.
    """
    import jax
    import jax.numpy as jnp

    sw = smooth_width
    T = face.shape[0]
    D_F, D_P = face.shape[1], pose.shape[1]

    # Forward windows x[t + s] for s = 0..sw-1, padded with zeros past the
    # end, plus validity masks. Shapes [T, sw, D].
    def fwd_windows(x):
        cols = [
            jnp.pad(x[s:], ((0, s), (0, 0))) for s in range(0, sw)
        ]
        return jnp.stack(cols, axis=1)

    t_ar = jnp.arange(T)[:, None]
    s_fwd = jnp.arange(0, sw)[None, :]
    fwd_valid = (t_ar + s_fwd < T).astype(face.dtype)  # [T, sw]
    w_fwd = (1.0 / (jnp.abs(s_fwd) + 1.0)).astype(face.dtype) * fwd_valid
    s_bwd = jnp.arange(-sw, 0)[None, :]
    bwd_valid = (t_ar + s_bwd >= 0).astype(face.dtype)
    w_bwd = (1.0 / (jnp.abs(s_bwd) + 1.0)).astype(face.dtype) * bwd_valid

    face_w = fwd_windows(face)  # [T, sw, 210]
    pose_w = fwd_windows(pose)  # [T, sw, 75]

    def repin(ave_fc, orig_fc):
        ave3 = ave_fc.reshape(70, 3)
        orig3 = orig_fc.reshape(70, 3)
        c_t = jnp.mean(ave3[MOUTH_CENTER_LO:MOUTH_CENTER_HI, :], axis=0)
        c_s = jnp.mean(orig3[MOUTH_CENTER_LO:MOUTH_CENTER_HI, :], axis=0)
        off = (c_t - c_s).at[2].set(0.0)
        shifted = orig3[MOUTH_LO:MOUTH_HI, :] + off[None, :]
        return ave3.at[MOUTH_LO:MOUTH_HI, :].set(shifted).reshape(-1)

    def step(carry, inputs):
        prev_f, prev_p = carry  # [sw, 210], [sw, 75]: smoothed t-sw..t-1
        fw, pw, wgt_f, wgt_b, cur_f = inputs
        sum_w = jnp.sum(wgt_f) + jnp.sum(wgt_b)
        sum_fc = wgt_b @ prev_f + wgt_f @ fw
        sum_ps = wgt_b @ prev_p + wgt_f @ pw
        ave_fc = sum_fc / sum_w
        ave_ps = sum_ps / sum_w
        ave_fc = repin(ave_fc, cur_f)
        new_prev_f = jnp.concatenate([prev_f[1:], ave_fc[None]], axis=0)
        new_prev_p = jnp.concatenate([prev_p[1:], ave_ps[None]], axis=0)
        return (new_prev_f, new_prev_p), (ave_fc, ave_ps)

    init = (
        jnp.zeros((sw, D_F), dtype=face.dtype),
        jnp.zeros((sw, D_P), dtype=pose.dtype),
    )
    (_, _), (out_f, out_p) = jax.lax.scan(
        step, init, (face_w, pose_w, w_fwd, w_bwd, face)
    )
    return out_f, out_p


def smooth_device_jit(face, pose, smooth_width: int = 4):
    import jax

    return jax.jit(
        lambda f, p: smooth_device(f, p, smooth_width)
    )(face, pose)
