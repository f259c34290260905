"""Benchmark: pose2frame autoregressive inference throughput on one chip.

North-star metric (BASELINE.md): frames/sec/chip at 512-class resolution.
The reference pipeline's renderer ran vid2vid test.py frame-by-frame on one
GPU at --loadSize 512 (reference: text2video_audio.sh:42) and published no
throughput numbers, so the baseline is the operational bar it had to meet:
real-time playback, 25 fps (align_english.py:34).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_FPS = 25.0  # real-time at the reference's output frame rate
H, W = 384, 512
T = 64  # frames timed per run (one scan bucket)
WARMUP_RUNS = 1
TIMED_RUNS = 3


def main() -> None:
    import jax

    from text2video_tpu.render import Renderer

    renderer = Renderer.create(height=H, width=W)
    rng = np.random.RandomState(0)
    labels = rng.randint(0, 256, size=(T, H, W, 3), dtype=np.uint8)

    for _ in range(WARMUP_RUNS):
        renderer.render(labels)

    times = []
    for _ in range(TIMED_RUNS):
        t0 = time.perf_counter()
        frames = renderer.render(labels)
        times.append(time.perf_counter() - t0)
    assert frames.shape == (T, H, W, 3)

    fps = T / min(times)
    print(
        json.dumps(
            {
                "metric": "pose2frame_inference_fps_512x384_1chip",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
