"""Training-time label augmentation on device.

vid2vid trains its pose dataset with random keypoint dropping/noise
(reference: keypoint2img.py:119-123 — ``random_drop_prob`` edge
dropping; ``remove_face_labels`` blanks the face region) so the
generator is robust to imperfect OpenPose detections at test time. The
reference perturbs keypoints on the CPU per sample; here perturbation
AND rasterization run inside the jitted train step, so augmented label
maps are regenerated on device every step from the (tiny) keypoint
tracks — fresh noise each epoch, no label images ever cross the host
link.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def augment_tracks(
    face: jnp.ndarray,
    pose: jnp.ndarray,
    hand_l: jnp.ndarray,
    hand_r: jnp.ndarray,
    key: jax.Array,
    drop_prob: float = 0.0,
    jitter_px: float = 0.0,
    face_drop_prob: float = 0.0,
):
    """Perturb keypoint tracks ([M,210]/[M,75]/[M,63]/[M,63] x,y,conf
    triples) for one batch of frames.

    * jitter_px: Gaussian x/y noise added to every confident point;
    * drop_prob: per-point confidence zeroing (an edge with a dropped
      endpoint is not drawn — the reference's random edge drop);
    * face_drop_prob: per-frame whole-face blanking (remove_face_labels).
    """
    kj, kd, kf = jax.random.split(key, 3)

    def per_track(x, n_pts, key_j, key_d):
        pts = x.reshape(x.shape[0], n_pts, 3)
        xy, conf = pts[..., :2], pts[..., 2:]
        if jitter_px > 0.0:
            noise = jitter_px * jax.random.normal(key_j, xy.shape, xy.dtype)
            xy = xy + noise * (conf > 0.0)
        if drop_prob > 0.0:
            keep = (
                jax.random.uniform(key_d, conf.shape) >= drop_prob
            ).astype(conf.dtype)
            conf = conf * keep
        return jnp.concatenate([xy, conf], axis=-1).reshape(x.shape)

    kjs = jax.random.split(kj, 4)
    kds = jax.random.split(kd, 4)
    face = per_track(face, 70, kjs[0], kds[0])
    pose = per_track(pose, 25, kjs[1], kds[1])
    hand_l = per_track(hand_l, 21, kjs[2], kds[2])
    hand_r = per_track(hand_r, 21, kjs[3], kds[3])

    if face_drop_prob > 0.0:
        keep_f = (
            jax.random.uniform(kf, (face.shape[0], 1)) >= face_drop_prob
        ).astype(face.dtype)
        conf_mask = jnp.ones((1, 210), face.dtype).reshape(1, 70, 3)
        conf_mask = conf_mask.at[..., 2].set(0.0).reshape(1, 210)
        # keep_f==0 -> zero the confidence channel of every face point.
        face = face * (keep_f + (1.0 - keep_f) * conf_mask)
    return face, pose, hand_l, hand_r


# ---- random scaleHeight + aligned crop (reference README.md:169-171:
# --resize_or_crop randomScaleHeight_and_scaledCrop --loadSize 544
# --fineSize 512 — every training step sees a randomly up-scaled then
# randomly cropped view of the real frame, with the label keypoints
# transformed by the SAME affine so the pair stays registered). ---------

def scale_crop_scales(scale_max: float) -> tuple:
    """The discrete scale set standing in for the reference's continuous
    [1, loadSize/fineSize] draw (dynamic shapes can't trace; three
    branches cover identity / half / full zoom)."""
    return (1.0, 1.0 + scale_max / 2.0, 1.0 + scale_max)


def scale_crop_transform_track(track, n_pts, s, off, h: int, w: int):
    """Affine-transform one keypoint track array [M, n_pts*3] by scale
    ``s`` and per-frame crop offset ``off`` [M, 1, 2] (x, y); points
    leaving the canvas get their confidence zeroed (an edge with an
    off-canvas endpoint is not drawn — matching the reference's crop,
    which simply never rasterizes outside the window)."""
    pts = track.reshape(track.shape[0], n_pts, 3)
    xy, conf = pts[..., :2], pts[..., 2:]
    # jax.image.resize(linear) maps source p to p*s + (s-1)/2.
    xy2 = xy * s + (s - 1.0) / 2.0 - off
    inside = (
        (xy2[..., 0] >= 0.0)
        & (xy2[..., 0] <= w - 1.0)
        & (xy2[..., 1] >= 0.0)
        & (xy2[..., 1] <= h - 1.0)
    )[..., None]
    conf2 = conf * inside
    return jnp.concatenate([xy2, conf2], axis=-1).reshape(track.shape)


def make_scale_crop_branches(b: int, t: int, h: int, w: int, scales):
    """One lax.switch branch per scale: resize the real clip batch
    [B, T, H, W, 3] float to the zoomed size and take a per-sample
    random crop back to (H, W). Each branch returns
    (cropped_reals, off_xy [B, 2] float, s scalar) with ``s`` baked in."""

    def make(s):
        hi, wi = round(h * s), round(w * s)
        s_arr = jnp.asarray(s, jnp.float32)

        def branch(reals_f, u):
            if (hi, wi) == (h, w):
                return reals_f, jnp.zeros((b, 2), jnp.float32), s_arr
            rs = jax.image.resize(
                reals_f, (b, t, hi, wi, 3), method="linear"
            )
            oy = jnp.floor(u[:, 0] * (hi - h + 1)).astype(jnp.int32)
            ox = jnp.floor(u[:, 1] * (wi - w + 1)).astype(jnp.int32)
            crop = jax.vmap(
                lambda img, y0, x0: jax.lax.dynamic_slice(
                    img, (0, y0, x0, 0), (t, h, w, 3)
                )
            )(rs, oy, ox)
            off = jnp.stack([ox, oy], axis=-1).astype(jnp.float32)
            return crop, off, s_arr

        return branch

    return [make(s) for s in scales]
