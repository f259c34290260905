"""Bisect the generation-throughput roofline on the real chip.

bench.py measures 123 fps (MFU 0.247) for the batch-1 autoregressive
scan at 512x384 and — surprisingly — *lower* total throughput at
batch 4. This probe separates the three candidate costs:

  1. raw generator forward at batch B (frames-as-batch, the Jacobi /
     batched-serving regime) — pure MXU efficiency vs batch;
  2. the lax.scan chunk at batch B — (1) plus carry concat + dispatch;
  3. per-dispatch tunnel overhead (timed empty-ish program).

Each config costs one remote compile; output is one JSON line per
config so a partial run still yields data.

  python tools/mfu_probe.py --batches 1,4,16,32 --scan-batches 1,4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")

V5E_BF16_PEAK_FLOPS = 197e12


def _time(fn, sync, runs: int = 5) -> float:
    fn()  # compile + warm
    sync()
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        sync()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--batches", default="1,4,16,32")
    p.add_argument("--scan-batches", default="1,4")
    p.add_argument("--chunk", type=int, default=32)
    p.add_argument("--no-phase", action="store_true",
                   help="probe the plain (pre-round-4) decoder tail")
    p.add_argument("--fused-resblocks", action="store_true",
                   help="route the residual stack through the Pallas "
                   "fused conv+IN kernel (ops/fused_resblock.py)")
    p.add_argument("--dump-hlo", default="",
                   help="directory: write optimized HLO of the raw "
                   "forward per batch size (the b1-vs-b4 layout diff)")
    p.add_argument("--compiler-options", default="",
                   help="JSON dict of XLA compiler options shipped with "
                   "the compile request (e.g. "
                   '\'{"xla_tpu_run_space_to_batch": false}\' to test '
                   "the space-to-batch layout-copy hypothesis)")
    args = p.parse_args()
    copts = json.loads(args.compiler_options) if args.compiler_options else None

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from bench import _analytic_frame_flops
    from text2video_tpu.render import Renderer

    h, w = args.height, args.width
    renderer = Renderer.create(
        height=h, width=w, phase_form=not args.no_phase,
        fused_resblocks=args.fused_resblocks,
        compiler_options=copts,
    )
    cfg = renderer.config
    frame_flops = _analytic_frame_flops(h, w)
    rng = np.random.RandomState(0)

    def emit(name, frames, secs):
        fps = frames / secs
        print(
            json.dumps(
                {
                    "config": name,
                    "ms_per_frame": round(1e3 * secs / frames, 3),
                    "fps": round(fps, 1),
                    "mfu": round(frame_flops * fps / V5E_BF16_PEAK_FLOPS, 4),
                }
            ),
            flush=True,
        )

    # --- 1. raw forward, frames-as-batch ------------------------------
    fwd = jax.jit(
        lambda p_, lc, pi, hp: renderer.generator.apply(p_, lc, pi, hp)[0]
    )
    for b in [int(x) for x in args.batches.split(",") if x]:
        lc = jnp.asarray(
            rng.rand(b, h, w, 3 * cfg.n_frames_ctx).astype(np.float32) * 2 - 1
        )
        pi = jnp.asarray(
            rng.rand(b, h, w, 3 * cfg.use_prev_frames).astype(np.float32)
        )
        hp = jnp.ones((b,), jnp.float32)
        compiled = None
        if copts is not None:
            compiled = fwd.lower(renderer.params, lc, pi, hp).compile(
                compiler_options=copts
            )
        if args.dump_hlo:
            os.makedirs(args.dump_hlo, exist_ok=True)
            if compiled is None:
                compiled_for_text = fwd.lower(
                    renderer.params, lc, pi, hp
                ).compile()
            else:
                compiled_for_text = compiled
            txt = compiled_for_text.as_text()
            path = os.path.join(args.dump_hlo, f"forward_b{b}.hlo")
            with open(path, "w") as f:
                f.write(txt)
            print(json.dumps({"hlo": path, "bytes": len(txt)}), flush=True)
        out = [None]

        def run(lc=lc, pi=pi, hp=hp, out=out, compiled=compiled):
            if compiled is not None:
                out[0] = compiled(renderer.params, lc, pi, hp)
            else:
                out[0] = fwd(renderer.params, lc, pi, hp)

        def sync(out=out):
            _ = float(jnp.sum(jnp.abs(out[0][:, ::64, ::64])))

        emit(f"forward_b{b}", b, _time(run, sync))

    # --- 2. scan chunk --------------------------------------------------
    for b in [int(x) for x in args.scan_batches.split(",") if x]:
        labels = jnp.asarray(
            rng.rand(b, args.chunk, h, w, 3).astype(np.float32) * 2 - 1
        )
        out = [None]

        def run(labels=labels, b=b, out=out):
            out[0] = renderer.generate_device(labels)

        def sync(out=out):
            _ = int(
                jnp.sum(out[0][-1][:, -1, ::64, ::64].astype(jnp.int32))
            )

        emit(f"scan_b{b}_chunk{args.chunk}", b * args.chunk, _time(run, sync))

    # --- 3. dispatch overhead -------------------------------------------
    tiny = jax.jit(lambda x: (x * 1.000001).sum())
    x = jnp.ones((8, 128), jnp.float32)
    res = [None]

    def run_tiny():
        res[0] = tiny(x)

    def sync_tiny():
        _ = float(res[0])

    secs = _time(run_tiny, sync_tiny)
    print(
        json.dumps({"config": "dispatch_roundtrip", "ms": round(1e3 * secs, 2)}),
        flush=True,
    )


if __name__ == "__main__":
    main()
