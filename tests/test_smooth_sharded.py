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


def test_fir_sharded_padded_tail_masked():
    """With t_valid < T (padded tail), padding rows must not bleed into
    the last valid frames."""
    rng = np.random.RandomState(3)
    t_true = 37
    face = rng.randn(t_true, 210).astype(np.float32)
    pose = rng.randn(t_true, 75).astype(np.float32)
    t_pad = 40  # next multiple of 8
    fp = np.pad(face, ((0, t_pad - t_true), (0, 0)))
    pp = np.pad(pose, ((0, t_pad - t_true), (0, 0)))
    mesh = make_mesh(n_data=8, n_model=1)
    f_s, p_s = smooth_fir_sharded(fp, pp, mesh, 4, t_valid=t_true)
    f_ref, p_ref = smooth_fir_host(
        face.astype(np.float64), pose.astype(np.float64), 4
    )
    np.testing.assert_allclose(
        np.asarray(f_s)[:t_true], f_ref, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(p_s)[:t_true], p_ref, rtol=1e-4, atol=1e-4
    )


def test_pipeline_utterance_spans_mesh(tmp_path):
    """Pipeline-level sequence parallelism: one utterance's pose smoothing
    and rasterization span the 8-device mesh (SURVEY.md §2.5); output
    matches the unsharded pipeline except for the documented FIR-vs-IIR
    smoothing deviation (compared against the FIR host reference)."""
    import os

    import pytest

    from tests.conftest import REFERENCE_DIR, has_reference_data

    if not has_reference_data():
        pytest.skip("reference data assets not mounted")

    from text2video_tpu.config import PipelineConfig, get_profile
    from text2video_tpu.frontend.timestamps import load_timestamp_file
    from text2video_tpu.pipeline import Text2VideoPipeline
    from text2video_tpu.pose_stage import PoseStage

    profile = get_profile("fadg0")
    ts = load_timestamp_file(
        f"{REFERENCE_DIR}/input_timestamp/fadg0/phones/Dotheymake.txt"
    )
    mesh = make_mesh(n_data=8, n_model=1)
    pipe = Text2VideoPipeline(
        PipelineConfig(person=profile, out_dir=str(tmp_path)), mesh=mesh
    )
    run = pipe.synthesize(ts, "sharded", keep_arrays=True)
    assert run.num_frames > 10
    assert run.label_maps.shape[1:] == (384, 512, 3)
    assert (run.label_maps > 0).mean() > 0.001
    for f in run.files:
        assert os.path.getsize(f) > 0

    # The sharded smoothing equals the FIR host reference on the tracks.
    stage = PoseStage(profile)
    res_sharded = stage.run(ts, mesh=mesh)
    res_host = stage.run(ts, device=False)
    f_ref, p_ref = smooth_fir_host(res_host.face, res_host.pose, 4)
    np.testing.assert_allclose(
        res_sharded.face_smooth, f_ref, rtol=1e-3, atol=2e-2
    )
    np.testing.assert_allclose(
        res_sharded.pose_smooth, p_ref, rtol=1e-3, atol=2e-2
    )

    # Unsharded pipeline output on the same utterance: identical except
    # the smoothing variant; label maps must still be close (the pin-back
    # keeps the mouth identical, so differences are sub-pixel drift).
    pipe2 = Text2VideoPipeline(
        PipelineConfig(person=profile, out_dir=str(tmp_path))
    )
    run2 = pipe2.synthesize(ts, "unsharded", keep_arrays=True)
    same = (run.label_maps == run2.label_maps).mean()
    assert same > 0.98, same
