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
