"""End-to-end pipeline tests (skeleton renderer, real reference assets)."""

import os

import numpy as np
import pytest

from tests.conftest import REFERENCE_DIR, requires_reference_data


@pytest.fixture(scope="module")
def aligner():
    from text2video_tpu.frontend.align_english import (
        EnglishAligner,
        PronouncingDict,
        train_acoustic_model,
    )
    from text2video_tpu.frontend.audio import load_wav_for_alignment

    ref = REFERENCE_DIR
    pdict = PronouncingDict.load(f"{ref}/aligner/english/dict")

    def words_of(path):
        return " ".join(
            p[2]
            for p in (l.split() for l in open(path))
            if len(p) == 3 and p[2] != "SIL"
        )

    utts = [
        (
            load_wav_for_alignment(f"{ref}/input_audio/fadg0/Dotheymake.wav"),
            words_of(f"{ref}/input_timestamp/fadg0/words/Dotheymake.txt"),
        ),
        (
            load_wav_for_alignment(
                f"{ref}/*phoneme_data/VidTIMIT/fadg0/audio/sa1.wav"
            ),
            "She had your dark suit in greasy wash water all year",
        ),
    ]
    model = train_acoustic_model(utts, pdict)
    return EnglishAligner(model, pdict)


@requires_reference_data
def test_run_audio_end_to_end(aligner, tmp_path):
    from text2video_tpu.config import PipelineConfig, get_profile
    from text2video_tpu.pipeline import Text2VideoPipeline

    config = PipelineConfig(
        person=get_profile("fadg0"),
        out_dir=str(tmp_path),
        emit_intermediates=True,
    )
    pipe = Text2VideoPipeline(config, aligner=aligner)
    run = pipe.run_audio(
        "Do they make it",
        f"{REFERENCE_DIR}/input_audio/fadg0/Dotheymake.wav",
        keep_arrays=True,
    )
    assert run.num_frames > 10
    assert run.label_maps.shape[1:] == (384, 512, 3)
    # Skeleton passthrough: non-trivial drawing on the canvas.
    assert (run.label_maps > 0).mean() > 0.001
    for f in run.files:
        assert os.path.exists(f) and os.path.getsize(f) > 0
    exts = {f.rsplit(".", 1)[-1] for f in run.files}
    assert {"mp4", "wav"} <= exts

    inter = os.path.join(str(tmp_path), "fadg0", run.name + "_intermediates")
    assert os.path.isdir(os.path.join(inter, "pose_smooth"))
    assert os.path.exists(os.path.join(inter, "timestamps.txt"))
    assert os.path.exists(os.path.join(inter, "words.txt"))


@requires_reference_data
def test_run_tts_formant_fallback(aligner, tmp_path):
    from text2video_tpu.config import PipelineConfig, get_profile
    from text2video_tpu.pipeline import Text2VideoPipeline

    config = PipelineConfig(
        person=get_profile("fadg0"), out_dir=str(tmp_path)
    )
    pipe = Text2VideoPipeline(config, aligner=aligner)
    run = pipe.run_tts("she had a suit", "f")
    assert run.num_frames > 5
    assert any(f.endswith(".mp4") for f in run.files)


@requires_reference_data
def test_cli_train_and_audio(tmp_path):
    from text2video_tpu.cli import main

    ref = REFERENCE_DIR
    model_path = str(tmp_path / "aligner" / "fadg0.am")
    rc = main(
        [
            "train-aligner",
            "--out",
            model_path,
            f"{ref}/input_audio/fadg0/Dotheymake.wav",
            "Do they make it",
        ]
    )
    assert rc == 0 and os.path.exists(model_path)

    rc = main(
        [
            "audio",
            "Do they make it",
            "fadg0",
            "--out",
            str(tmp_path),
            "--aligner-model",
            model_path,
            "--wav",
            f"{ref}/input_audio/fadg0/Dotheymake.wav",
        ]
    )
    assert rc == 0
    out_dir = os.path.join(str(tmp_path), "fadg0")
    assert any(f.endswith(".mp4") for f in os.listdir(out_dir))


@requires_reference_data
def test_run_audio_batch_sharded(aligner, tmp_path):
    """Batched serving: two utterances rendered as one mesh-sharded batch
    must match the per-utterance path."""
    from text2video_tpu.config import PipelineConfig, get_profile
    from text2video_tpu.parallel.mesh import make_mesh
    from text2video_tpu.pipeline import Text2VideoPipeline

    config = PipelineConfig(
        person=get_profile("fadg0"), out_dir=str(tmp_path)
    )
    pipe = Text2VideoPipeline(config, aligner=aligner)
    items = [
        ("Do they make it",
         f"{REFERENCE_DIR}/input_audio/fadg0/Dotheymake.wav"),
        ("She slipped and sprained her ankle",
         f"{REFERENCE_DIR}/input_audio/fadg0/sheslipped.wav"),
    ]
    mesh = make_mesh(n_data=2, n_model=1)
    results = pipe.run_audio_batch(items, mesh=mesh, keep_arrays=True)
    assert len(results) == 2
    assert results[0].name == "Dotheymake"
    assert results[0].num_frames != results[1].num_frames  # ragged batch
    for r in results:
        assert all(os.path.getsize(f) > 0 for f in r.files)
    # Skeleton passthrough: batch output equals the single-utterance path.
    single = pipe.run_audio(*items[0], keep_arrays=True)
    np.testing.assert_array_equal(
        results[0].label_maps, single.label_maps
    )


@requires_reference_data
def test_load_size_renderer_rasterizes_at_target(tmp_path):
    """With a load_size GAN (reference --loadSize 512 scaleHeight,
    text2video_audio.sh:42) the pipeline rasterizes scaled tracks at the
    GAN's working resolution — matching training labels — and the
    streamed video comes out at that resolution."""
    import cv2

    from text2video_tpu.config import (
        PipelineConfig,
        RenderConfig,
        get_profile,
    )
    from text2video_tpu.frontend import load_timestamp_file
    from text2video_tpu.pipeline import Text2VideoPipeline
    from text2video_tpu.render import Renderer

    ts = load_timestamp_file(
        f"{REFERENCE_DIR}/input_timestamp/fadg0/phones/Dotheymake.txt"
    )
    # fadg0 canvas 512x384, load_size 128 -> working res 192x128.
    renderer = Renderer.create(
        config=RenderConfig(load_size=128),
        height=128, width=192, base_ch=4, n_blocks=1,
    )
    pipe = Text2VideoPipeline(
        PipelineConfig(person=get_profile("fadg0"), out_dir=str(tmp_path)),
        renderer=renderer,
    )
    run = pipe.synthesize(
        ts, "t", audio=np.zeros(16000, np.float32)
    )
    mp4 = [f for f in run.files if f.endswith(".mp4")][0]
    cap = cv2.VideoCapture(mp4)
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 192
    assert int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == 128
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == run.num_frames
    cap.release()


def test_jacobi_decode_pipeline(tmp_path):
    """decode_mode="jacobi" drives the full pipeline: the streaming wire
    + muxer path and the keep_arrays path both work, and the array path
    agrees with the exact scan at high sweep counts (convergence math in
    tests/test_render_jacobi.py).

    Equivalence is asserted on the pre-saturation PREFIX: the scan and
    Jacobi recurrences are algorithmically identical (manual emulations
    are bit-equal, tools/jacobi_bisect_probe.py), but two
    differently-compiled programs of the same generator differ per
    forward (~1e-6 relative in f32, up to ~0.07 in bf16 —
    tools/jacobi_bisect2.py) and a RANDOM-weight warp recurrence is
    chaotic: the difference grows ~3.5x/frame until it saturates
    (measured f32 frame maxes 0,1,1,1,7,25,72,... on this exact
    configuration). So the renderer runs in f32 (smallest seed noise)
    and the tight assertion covers the first 6 frames (measured
    52.3 dB), with a loose full-clip floor (measured 26.9 dB); trained
    weights amplify far less (42 dB at 2 sweeps over full clips,
    tools/jacobi_quality.py). test_jacobi_bf16_divergence_bounded
    bounds the production-dtype case."""
    import dataclasses

    import cv2

    from text2video_tpu.config import (
        PipelineConfig,
        RenderConfig,
        get_profile,
    )
    from text2video_tpu.frontend import load_timestamp_file
    from text2video_tpu.pipeline import Text2VideoPipeline
    from text2video_tpu.render import Renderer

    ts = load_timestamp_file(
        f"{REFERENCE_DIR}/input_timestamp/fadg0/phones/Dotheymake.txt"
    )
    import jax.numpy as jnp

    renderer = Renderer.create(
        config=RenderConfig(
            load_size=128, decode_mode="jacobi", jacobi_sweeps=2
        ),
        height=128, width=192, base_ch=4, n_blocks=1,
        dtype=jnp.float32,
    )
    pipe = Text2VideoPipeline(
        PipelineConfig(person=get_profile("fadg0"), out_dir=str(tmp_path)),
        renderer=renderer,
    )
    # Streaming path (wire chunks encoded from Jacobi frames).
    run = pipe.synthesize(ts, "jac", audio=np.zeros(16000, np.float32))
    mp4 = [f for f in run.files if f.endswith(".mp4")][0]
    cap = cv2.VideoCapture(mp4)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == run.num_frames
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 192
    cap.release()

    # keep_arrays path; many sweeps ~= the exact sequential scan.
    pipe.renderer = dataclasses.replace(
        renderer,
        config=dataclasses.replace(
            renderer.config, jacobi_sweeps=renderer.time_bucket
        ),
    )
    run_j = pipe.synthesize(
        ts, "jac_arr", audio=np.zeros(16000, np.float32), keep_arrays=True
    )
    pipe.renderer = dataclasses.replace(
        renderer, config=dataclasses.replace(renderer.config,
                                             decode_mode="scan"),
    )
    run_s = pipe.synthesize(
        ts, "scan_arr", audio=np.zeros(16000, np.float32), keep_arrays=True
    )
    assert run_j.frames.shape == run_s.frames.shape

    def _psnr(a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return 10 * np.log10(255.0**2 / max(mse, 1e-12))

    diff = np.abs(run_j.frames.astype(int) - run_s.frames.astype(int))
    assert diff[:4].max() <= 3, diff[:4].max()  # measured <= 1
    p6 = _psnr(run_j.frames[:6], run_s.frames[:6])
    assert p6 >= 45.0, p6  # measured 52.3
    pfull = _psnr(run_j.frames, run_s.frames)
    assert pfull >= 24.0, pfull  # measured 26.9 (chaos-saturated tail)


def test_jacobi_bf16_divergence_bounded():
    """Production-dtype (bfloat16) scan vs Jacobi at full sweeps, SAME
    conv lowering on both sides (fused_batch off): the divergence is
    compile-level rounding amplified by the recurrence (see
    test_jacobi_decode_pipeline docstring). This pins the two
    structural guarantees that hold in that regime: the early prefix is
    uint8-tight (the amplification needs frames to compound), and the
    whole-clip error stays bounded even on worst-case random weights —
    trained weights measure 42 dB at 2 sweeps (tools/jacobi_quality.py,
    README measured table). With the default fused batch path the
    scan (XLA convs) and Jacobi (Pallas convs) are DIFFERENT bf16
    lowerings, whose per-op rounding compounds through ~20 normalized
    layers on random weights — even frame 0 diverges by >100 levels —
    so cross-lowering fidelity is a trained-weights measurement, not a
    random-weight assertion (test_fused_resblock_matches_plain bounds
    the per-block difference)."""
    import dataclasses

    from text2video_tpu.config import RenderConfig
    from text2video_tpu.render import Renderer

    rng = np.random.RandomState(0)
    t = 18
    labels = rng.randint(0, 256, size=(t, 128, 192, 3), dtype=np.uint8)
    r = dataclasses.replace(
        Renderer.create(
            config=RenderConfig(load_size=128),
            height=128, width=192, base_ch=4, n_blocks=1,
        ),
        fused_batch=False,
    )
    r.time_bucket = 32
    seq = r.render(labels)
    jac = r.render_jacobi(labels, sweeps=t)
    diff = np.abs(seq.astype(int) - jac.astype(int))
    # measured: frames 0-2 exact to 1 level (tools/jacobi_divergence_probe.py)
    assert diff[:3].max() <= 3, diff[:3].max()
    mse = np.mean((seq.astype(np.float64) - jac.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255.0**2 / max(mse, 1e-12))
    # measured 23.3 dB on this seed; bound loosely (random-weight worst case)
    assert psnr >= 18.0, psnr
