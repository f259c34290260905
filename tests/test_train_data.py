"""Training data pipeline + short training-loop integration test."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import REFERENCE_DIR, requires_reference_data

IMAGES = f"{REFERENCE_DIR}/*phoneme_data/VidTIMIT/fadg0/images_fadg0"
KEYPOINTS = f"{REFERENCE_DIR}/*phoneme_data/VidTIMIT/fadg0/keypoints_fadg0"


@pytest.fixture(scope="module")
def dataset():
    from text2video_tpu.train.data import PoseClipDataset

    return PoseClipDataset(
        images_dir=IMAGES,
        keypoints_dir=KEYPOINTS,
        canvas=(128, 96),
        source_canvas=(512, 384),
        clip_len=4,
        cache_labels=False,
    )


@requires_reference_data
def test_dataset_batch_shapes(dataset):
    rng = np.random.RandomState(0)
    batch = dataset.batch(rng, 2)
    assert batch["labels"].shape == (2, 4, 96, 128, 3)
    assert batch["reals"].shape == (2, 4, 96, 128, 3)
    assert batch["face_centers"].shape == (2, 4, 2)
    # Normalized [-1, 1]; labels mostly background (-1) with drawing.
    assert batch["labels"].min() >= -1.0 and batch["labels"].max() <= 1.0
    assert (batch["labels"] > -1.0).mean() > 0.001
    assert batch["reals"].std() > 0.1
    # Mouth centres land inside the scaled canvas.
    c = batch["face_centers"]
    assert (c[..., 0] > 0).all() and (c[..., 0] < 128).all()
    assert (c[..., 1] > 0).all() and (c[..., 1] < 96).all()


@requires_reference_data
def test_dataset_clip_contiguity(dataset):
    rng = np.random.RandomState(1)
    for _ in range(5):
        labels, reals, centers = dataset.sample_clip(rng)
        assert labels.shape[0] == 4
        # Consecutive real frames of one clip are similar (no clip jumps).
        diffs = np.abs(
            reals[1:].astype(np.int32) - reals[:-1].astype(np.int32)
        ).mean(axis=(1, 2, 3))
        assert (diffs < 60).all(), diffs


@requires_reference_data
def test_short_training_run_and_checkpoint(dataset, tmp_path):
    from text2video_tpu.train.checkpoints import load_renderer
    from text2video_tpu.train.loop import train_gan
    from text2video_tpu.train.trainer import TrainConfig

    cfg = TrainConfig(
        height=96,
        width=128,
        face_crop=24,
        base_ch=8,
        n_blocks=1,
        d_base_ch=8,
        use_vgg=False,
        dtype=jnp.float32,
    )
    logs = []
    ckpt_dir = str(tmp_path / "ckpt")
    state = train_gan(
        dataset,
        cfg,
        steps=3,
        batch_size=2,
        ckpt_dir=ckpt_dir,
        save_every=100,
        log_every=1,
        log_fn=logs.append,
    )
    assert int(state.step) == 3
    assert len(logs) == 3
    assert "g_loss" in logs[-1]

    # Resume picks up the saved step.
    state2 = train_gan(
        dataset, cfg, steps=1, batch_size=2, ckpt_dir=ckpt_dir,
        log_fn=logs.append,
    )
    assert int(state2.step) == 4

    # The inference renderer loads generator params from the checkpoint.
    from text2video_tpu.config import PersonProfile

    profile = PersonProfile(
        name="tiny", language="en", canvas=(128, 96), dict_path="",
        keypoints_dir="", keypoint_layout="clip",
    )
    renderer = load_renderer(ckpt_dir, profile)
    assert renderer.generator.base_ch == 8 and renderer.generator.n_blocks == 1
    labels = np.zeros((2, 96, 128, 3), np.uint8)
    frames = renderer.render(labels)
    assert frames.shape == (2, 96, 128, 3)


@requires_reference_data
def test_device_data_mode(dataset, tmp_path):
    from text2video_tpu.train.loop import train_gan
    from text2video_tpu.train.trainer import TrainConfig

    cfg = TrainConfig(
        height=96, width=128, face_crop=24, base_ch=8, n_blocks=1,
        d_base_ch=8, use_vgg=False, dtype=jnp.float32,
    )
    logs = []
    state = train_gan(
        dataset, cfg, steps=2, batch_size=2, device_data=True,
        log_every=1, log_fn=logs.append,
    )
    assert int(state.step) == 2
    assert any("device-resident" in l for l in logs)
    assert any("g_loss" in l for l in logs)


@requires_reference_data
def test_training_snapshots(dataset, tmp_path):
    from text2video_tpu.train.loop import train_gan
    from text2video_tpu.train.trainer import TrainConfig

    cfg = TrainConfig(
        height=96, width=128, face_crop=24, base_ch=8, n_blocks=1,
        d_base_ch=8, use_vgg=False, dtype=jnp.float32,
    )
    ckpt_dir = str(tmp_path / "ck")
    train_gan(
        dataset, cfg, steps=2, batch_size=2, ckpt_dir=ckpt_dir,
        sample_every=1, log_fn=lambda s: None,
    )
    snaps = [f for f in os.listdir(ckpt_dir) if f.startswith("sample_")]
    assert len(snaps) == 2
