#!/usr/bin/env python3
"""Per-HLO-op device-time profile of the production decode scan.

The axon backend forwards XLA's device tracing (verified: per-op events
arrive with ``device_duration_ps``, ``hlo_category``, ``bytes_accessed``,
``model_flops`` and the generating source line), so instead of ablation
guesswork we can read exactly where the 5.7 ms/frame goes.

Traces ONE ``Renderer.generate_device`` chunk (32-frame lax.scan) after
warmup, then aggregates device events:

  python tools/scan_profile.py [--out out/scan_profile.json]
      [--top 40] [--by op|category|source]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_device_events(log_dir):
    paths = glob.glob(
        os.path.join(log_dir, "plugins/profile/*/*.trace.json.gz")
    )
    if not paths:
        raise RuntimeError(f"no trace under {log_dir}")
    with gzip.open(sorted(paths)[-1]) as f:
        t = json.load(f)
    ev = t.get("traceEvents", [])
    dev_pids = {
        e["pid"]
        for e in ev
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    return [
        e
        for e in ev
        if e.get("ph") == "X"
        and e.get("pid") in dev_pids
        and "device_duration_ps" in e.get("args", {})
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--by", default="op", choices=["op", "category", "source"])
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from text2video_tpu.render import Renderer

    h, w, c = args.height, args.width, args.chunk
    rng = np.random.RandomState(0)
    labels = jnp.asarray(rng.rand(1, c, h, w, 3).astype(np.float32) * 2 - 1)
    renderer = Renderer.create(height=h, width=w)

    def run():
        out = renderer.generate_device(labels)
        return float(jnp.sum(out[0].astype(jnp.float32)[:, :, ::64, ::64]))

    run()  # compile + warm
    log_dir = tempfile.mkdtemp(prefix="scan_trace_")
    with jax.profiler.trace(log_dir):
        run()

    events = load_device_events(log_dir)
    total_ps = 0
    agg = collections.defaultdict(lambda: [0, 0, 0, 0])  # ps, count, bytes, flops
    for e in events:
        a = e["args"]
        ps = int(a["device_duration_ps"])
        total_ps += ps
        if args.by == "category":
            key = a.get("hlo_category", e.get("name", "?"))
        elif args.by == "source":
            key = a.get("source", a.get("hlo_category", "?"))
        else:
            # long_name leads with "%opname = type[shape] op(...)"
            ln = a.get("long_name", e.get("name", "?"))
            key = ln.split(" = ")[0].lstrip("%")
            # strip trailing .N dedup suffixes so repeats aggregate
            base = key.rstrip("0123456789").rstrip(".")
            key = base or key
            shape = ln.split(" = ")[1].split(" ")[0] if " = " in ln else ""
            key = f"{key} {shape}"
        rec = agg[key]
        rec[0] += ps
        rec[1] += 1
        rec[2] += int(a.get("bytes_accessed", 0))
        rec[3] += int(a.get("model_flops", 0) or 0)

    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    ms_total = total_ps / 1e9
    print(f"device total {ms_total:.3f} ms for {c} frames "
          f"({ms_total / c:.3f} ms/frame), {len(events)} events")
    out_rows = []
    for key, (ps, n, by, fl) in rows[: args.top]:
        ms = ps / 1e9
        row = {
            "key": key,
            "ms": round(ms, 3),
            "pct": round(100 * ps / total_ps, 1),
            "count": n,
            "gb_s": round(by / (ps / 1e12) / 1e9, 1) if ps else 0,
            "tflops": round(fl / (ps / 1e12) / 1e12, 1) if ps else 0,
        }
        out_rows.append(row)
        print(f"{row['pct']:5.1f}%  {ms:8.3f} ms  x{n:<5d} "
              f"{row['gb_s']:7.1f} GB/s {row['tflops']:6.1f} TF/s  {key[:90]}")
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(
                {"ms_total": ms_total, "frames": c, "rows": out_rows}, f,
                indent=1,
            )
        print("wrote", args.out)


if __name__ == "__main__":
    main()
