#!/usr/bin/env python3
"""Ablate suspected overhead sources in the generator forward on the
real chip and time each variant.

HLO analysis (out/hlo_r4, tools/hlo_summary.py) shows the forward is
HBM/layout-bound: XLA space-to-batches the convs at small batch and pays
hundreds of MB/frame in layout copies, and executed traffic is ~2.2x the
per-layer roofline model. This probe quantifies which graph features the
time actually follows:

  full       the shipped generator forward
  nowarp     flow_warp replaced by identity (kills the 196k-row gather)
  nonorm     InstanceNorm replaced by identity (kills f32 stats passes)
  plain      phase_form=False (the pre-round-4 padded tail)

  python tools/fwd_ablation_probe.py --batches 1,4 [--xla-flags "..."]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,4")
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--variants", default="full,nowarp,nonorm,plain")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import text2video_tpu.models.generator as G
    import text2video_tpu.models.layers as L
    from text2video_tpu.render import Renderer

    h, w = args.height, args.width
    rtt_ms = None

    def timed_forward(renderer, b):
        nonlocal rtt_ms
        cfg = renderer.config
        rng = np.random.RandomState(0)
        lc = jnp.asarray(rng.rand(b, h, w, 3 * cfg.n_frames_ctx)
                         .astype(np.float32))
        pi = jnp.asarray(rng.rand(b, h, w, 3 * cfg.use_prev_frames)
                         .astype(np.float32))
        hp = jnp.ones((b,), jnp.float32)

        @jax.jit
        def fwd(params, lc, pi, hp):
            f, _, _ = renderer.generator.apply(params, lc, pi, hp)
            return jnp.sum(f[:, ::64, ::64].astype(jnp.float32))

        _ = float(fwd(renderer.params, lc, pi, hp))  # compile
        if rtt_ms is None:
            _ = float(jnp.sum(jnp.ones((2,))))  # compile the RTT program
            rtts = []
            for _ in range(10):
                t0 = time.perf_counter()
                _ = float(jnp.sum(jnp.ones((2,))))
                rtts.append(time.perf_counter() - t0)
            rtt_ms = min(rtts) * 1e3
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = float(fwd(renderer.params, lc, pi, hp))
            times.append(time.perf_counter() - t0)
        ms = min(times) * 1e3
        return (ms - rtt_ms) / b

    orig_warp = G.flow_warp
    orig_norm = L.InstanceNorm.__call__

    def set_variant(name):
        G.flow_warp = orig_warp
        L.InstanceNorm.__call__ = orig_norm
        if name == "nowarp":
            G.flow_warp = lambda img, flow: img
        elif name == "nonorm":
            L.InstanceNorm.__call__ = lambda self, x: x

    for name in args.variants.split(","):
        set_variant(name)
        phase = name != "plain"
        for b in [int(x) for x in args.batches.split(",") if x]:
            renderer = Renderer.create(height=h, width=w, phase_form=phase)
            ms = timed_forward(renderer, b)
            print(json.dumps({
                "variant": name, "batch": b,
                "ms_per_frame": round(ms, 3),
                "rtt_ms": round(rtt_ms, 2),
            }), flush=True)
    set_variant("full")


if __name__ == "__main__":
    main()
