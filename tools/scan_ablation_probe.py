#!/usr/bin/env python3
"""Ablate suspected overhead sources on the PRODUCTION decode path (the
chunked ``lax.scan``, the path bench.py times at 175 fps) and time each
variant on the real chip.

tools/fwd_ablation_probe.py ablates the raw per-frame forward, but that
measurement carries a ~32 ms dispatch RTT per run and none of the scan's
fusion context. This probe times ``Renderer.generate_device`` on one
32-frame chunk per variant, so each number is directly comparable to the
shipped 5.7 ms/frame:

  full       the shipped generator forward (phase_form=True)
  nowarp     flow_warp replaced by identity (kills the 196k-row gather)
  nonorm     InstanceNorm replaced by identity (kills f32 stats passes)
  nores      residual blocks replaced by identity (the roofline's 58%)
  noboth     nowarp + nonorm

  python tools/scan_ablation_probe.py --variants full,nowarp,nonorm
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--variants", default="full,nowarp,nonorm,noboth")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    import text2video_tpu.models.generator as G
    import text2video_tpu.models.layers as L
    from text2video_tpu.render import Renderer

    h, w, c = args.height, args.width, args.chunk
    rng = np.random.RandomState(0)
    labels = jnp.asarray(
        rng.rand(1, c, h, w, 3).astype(np.float32) * 2 - 1
    )

    orig_warp = G.flow_warp
    orig_norm = L.InstanceNorm.__call__
    orig_res = L.ResBlock.__call__

    def set_variant(name):
        G.flow_warp = orig_warp
        L.InstanceNorm.__call__ = orig_norm
        L.ResBlock.__call__ = orig_res
        if name in ("nowarp", "noboth"):
            G.flow_warp = lambda img, flow: img
        if name in ("nonorm", "noboth"):
            L.InstanceNorm.__call__ = lambda self, x: x
        if name == "nores":
            L.ResBlock.__call__ = lambda self, x: x

    for name in args.variants.split(","):
        set_variant(name)
        renderer = Renderer.create(height=h, width=w)
        out = renderer.generate_device(labels)  # compile
        _ = float(jnp.sum(out[0].astype(jnp.float32)[:, :, ::64, ::64]))
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            out = renderer.generate_device(labels)
            _ = float(
                jnp.sum(out[0].astype(jnp.float32)[:, :, ::64, ::64])
            )
            times.append(time.perf_counter() - t0)
        ms = min(times) * 1e3 / c
        print(json.dumps({
            "variant": name,
            "ms_per_frame": round(ms, 3),
            "fps": round(1e3 / ms, 1),
        }), flush=True)
    set_variant("full")


if __name__ == "__main__":
    main()
