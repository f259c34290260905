"""Steady-state per-invocation cost of the resblock conv paths on the
real chip: XLA reflect-conv+IN vs the Pallas fused conv+stats kernel
(ops/fused_resblock.py), iterated N times inside ONE jitted program so
the ~26 ms dispatch RTT and compile noise drop out.

  python tools/resblock_micro_probe.py --iters 50 --batch 1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--h", type=int, default=48)
    ap.add_argument("--w", type=int, default=64)
    ap.add_argument("--c", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from text2video_tpu.ops.fused_resblock import conv3x3_stats

    b, h, w, c = args.batch, args.h, args.w, args.c
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 0.1
                     ).astype(jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.02)
    bias = jnp.asarray(rng.randn(c).astype(np.float32) * 0.01)
    flops_per_iter = b * h * w * c * c * 9 * 2

    def xla_conv_in(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        y = jax.lax.conv_general_dilated(
            xp, k.astype(x.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(x.dtype)
        mean = jnp.mean(y, axis=(1, 2), dtype=jnp.float32)
        m2 = jnp.mean(jnp.square(y), axis=(1, 2), dtype=jnp.float32)
        var = jnp.maximum(m2 - jnp.square(mean), 0.0)
        mul = jax.lax.rsqrt(var + 1e-5).astype(x.dtype)
        return jnp.tanh(y * mul[:, None, None, :])

    def pallas_conv_in(x):
        y, mean, var = conv3x3_stats(x, k, bias, interpret=False)
        mul = jax.lax.rsqrt(var + 1e-5).astype(x.dtype)
        return jnp.tanh(y * mul[:, None, None, :])

    for name, f in [("xla", xla_conv_in), ("pallas", pallas_conv_in)]:
        def chain(x, f=f):
            def body(i, xx):
                return f(xx)
            return jax.lax.fori_loop(0, args.iters, body, x)

        jf = jax.jit(chain)
        out = jf(x0)
        _ = float(jnp.sum(jnp.abs(out[:, ::16, ::16, ::64]).astype(jnp.float32)))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            out = jf(x0)
            _ = float(jnp.sum(jnp.abs(out[:, ::16, ::16, ::64]).astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        per_iter = (best - 0.027) / args.iters  # subtract ~1 RTT
        print(json.dumps({
            "variant": name,
            "us_per_conv": round(1e6 * per_iter, 1),
            "mfu": round(flops_per_iter / per_iter / 197e12, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
