"""Halo-exchange sharded smoothing (shard_map + ppermute over ICI)."""

import numpy as np

from text2video_tpu.ops.smooth import smooth_fir_host, smooth_fir_sharded
from text2video_tpu.parallel.mesh import make_mesh


def test_fir_sharded_matches_host():
    rng = np.random.RandomState(0)
    T = 64  # divides over 8 shards
    face = rng.rand(T, 210) * 300
    pose = rng.rand(T, 75) * 300
    ref_f, ref_p = smooth_fir_host(face, pose)

    mesh = make_mesh(n_data=8, n_model=1)
    out_f, out_p = smooth_fir_sharded(
        face.astype(np.float32), pose.astype(np.float32), mesh
    )
    np.testing.assert_allclose(np.asarray(out_f), ref_f, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_p), ref_p, rtol=2e-4, atol=2e-3)


def test_fir_sharded_boundary_halos_masked():
    """Edge shards must not absorb wrapped-ring halo garbage: constant
    input stays constant everywhere (weights renormalize at the edges)."""
    mesh = make_mesh(n_data=8, n_model=1)
    face = np.full((32, 210), 7.0, np.float32)
    pose = np.full((32, 75), 3.0, np.float32)
    out_f, out_p = smooth_fir_sharded(face, pose, mesh)
    np.testing.assert_allclose(np.asarray(out_f), 7.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_p), 3.0, atol=1e-4)
