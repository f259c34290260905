"""Benchmark: pose2frame autoregressive generation throughput on one chip.

North-star metric (BASELINE.md): frames/sec/chip at 512-class resolution.
The reference renderer ran vid2vid test.py frame-by-frame on one GPU at
--loadSize 512 (reference: text2video_audio.sh:42) and published no
throughput numbers, so the baseline bar is real-time playback: 25 fps
(align_english.py:34).

Measures on-device generation throughput of the chunked autoregressive
scan (synchronised via a scalar pull per run). Host delivery of uint8
frames is pipelined against compute (render.py) but on this environment's
tunneled device transfers are not representative of production PCIe, so
the headline metric is generation throughput.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_FPS = 25.0  # real-time at the reference's output frame rate
H, W = 384, 512
T = 64
TIMED_RUNS = 3


def main() -> None:
    import jax
    import jax.numpy as jnp

    from text2video_tpu.render import Renderer

    renderer = Renderer.create(height=H, width=W)
    rng = np.random.RandomState(0)
    labels_u8 = rng.randint(0, 256, size=(1, T, H, W, 3), dtype=np.uint8)
    labels = jnp.asarray(labels_u8.astype(np.float32) / 127.5 - 1.0)

    def generate_once() -> None:
        chunks = renderer.generate_device(labels)
        # Synchronise with a tiny transfer (checksum), not the frames.
        _ = int(jnp.sum(chunks[-1][:, -1, ::64, ::64].astype(jnp.int32)))

    generate_once()  # compile + warm
    times = []
    for _ in range(TIMED_RUNS):
        t0 = time.perf_counter()
        generate_once()
        times.append(time.perf_counter() - t0)

    fps = T / min(times)
    print(
        json.dumps(
            {
                "metric": "pose2frame_generation_fps_512x384_1chip",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
