"""Fused Pallas pose-synthesis kernel vs the bit-exact host reference."""

import numpy as np
import pytest

from tests.conftest import REFERENCE_DIR, requires_reference_data


@requires_reference_data
def test_fused_kernel_matches_host_path():
    from text2video_tpu.config import get_profile
    from text2video_tpu.frontend.timestamps import load_timestamp_file
    from text2video_tpu.io.dicts import KeypointTable, PoseDictionary
    from text2video_tpu.ops.fused_pose import (
        fits_vmem,
        synthesize_and_smooth_pallas,
    )
    from text2video_tpu.ops.interp import plan_pose_track, synthesize_host
    from text2video_tpu.ops.smooth import smooth_host

    profile = get_profile("fadg0")
    pdict = PoseDictionary.load(profile.dict_path, "clip")
    table = KeypointTable.load_dir(profile.keypoints_dir, "clip")
    ts = load_timestamp_file(
        f"{REFERENCE_DIR}/input_timestamp/fadg0/phones/Shehadyour.txt"
    )
    plan = plan_pose_track(ts, pdict, table, profile)
    assert fits_vmem(len(table), plan.num_frames)

    face_ref, pose_ref = smooth_host(
        *synthesize_host(plan, table), profile.smooth_width
    )
    face, pose = synthesize_and_smooth_pallas(
        plan, table, profile.smooth_width
    )
    assert face.shape == face_ref.shape and pose.shape == pose_ref.shape
    np.testing.assert_allclose(face, face_ref, atol=2e-3)
    np.testing.assert_allclose(pose, pose_ref, atol=2e-3)


def test_fits_vmem_bounds():
    from text2video_tpu.ops.fused_pose import fits_vmem

    assert fits_vmem(763, 87)          # fadg0-sized
    assert not fits_vmem(12735, 1200)  # henan-sized table spills
