"""Micro-probe: instance-norm stats formulations on the real chip.

The B>1 regression traced to InstanceNorm's f32-accumulating reductions:
jnp.mean(square(x), dtype=f32) materializes convert(square(x)) at B=4
(out/hlo_r4c), and the einsum self-dot rewrite materializes convert(x)
at every batch (out/hlo_r5a). This times candidate formulations of
(sum, sumsq) over [B, H, W, C] bf16 -> f32 [B, C] and dumps their
optimized HLO so we can pick one with zero materialized converts.

  python tools/norm_stats_probe.py --batch 4
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def big_convert_bytes(hlo: str) -> float:
    tot = 0
    for line in hlo.splitlines():
        m = re.search(r"\b(copy|convert)[.\d]* = f32\[([\d,]*)\]", line)
        if not m:
            continue
        n = 1
        for d in m.group(2).split(","):
            if d:
                n *= int(d)
        if n * 4 >= 1 << 20:
            tot += n * 4
    return tot / 1e6


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--h", type=int, default=48)
    p.add_argument("--w", type=int, default=64)
    p.add_argument("--c", type=int, default=512)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    b, h, w, c = args.batch, args.h, args.w, args.c
    x = jnp.asarray(
        np.random.RandomState(0).randn(b, h, w, c).astype(np.float32)
    ).astype(jnp.bfloat16)

    def variant_mean(x):
        mean = jnp.mean(x, axis=(1, 2), dtype=jnp.float32)
        m2 = jnp.mean(jnp.square(x), axis=(1, 2), dtype=jnp.float32)
        return mean, m2

    def variant_einsum(x):
        x3 = x.reshape(b, h * w, c)
        ones = jnp.ones((h * w,), x.dtype)
        s1 = jnp.einsum("bnc,n->bc", x3, ones,
                        preferred_element_type=jnp.float32)
        s2 = jnp.einsum("bnc,bnc->bc", x3, x3,
                        preferred_element_type=jnp.float32)
        return s1 / (h * w), s2 / (h * w)

    def variant_twostage(x):
        p1 = jnp.sum(x, axis=2, dtype=jnp.float32)  # [b, h, c] small
        s1 = jnp.sum(p1, axis=1)
        xsq = jnp.square(x)  # bf16
        p2 = jnp.sum(xsq, axis=2, dtype=jnp.float32)
        s2 = jnp.sum(p2, axis=1)
        return s1 / (h * w), s2 / (h * w)

    def variant_dot_ones(x):
        # [b*h, w, c] x [w] contractions -> [b*h, c]: w rides the MXU
        # contraction dim, bf16 in / f32 accum out.
        x3 = x.reshape(b * h, w, c)
        ones = jnp.ones((w,), x.dtype)
        s1 = jnp.einsum("nwc,w->nc", x3, ones,
                        preferred_element_type=jnp.float32)
        s1 = s1.reshape(b, h, c).sum(axis=1)
        s2 = jnp.einsum("nwc,w->nc", jnp.square(x).reshape(b * h, w, c),
                        ones, preferred_element_type=jnp.float32)
        s2 = s2.reshape(b, h, c).sum(axis=1)
        return s1 / (h * w), s2 / (h * w)

    ref = None
    for name, fn in [
        ("mean_f32", variant_mean),
        ("einsum_selfdot", variant_einsum),
        ("twostage", variant_twostage),
        ("dot_ones", variant_dot_ones),
    ]:
        # follow with a consumer so the stats cannot be dead-code'd and
        # the activation is also read by a "main path" like in the net
        def prog(x, fn=fn):
            s1, s2 = fn(x)
            y = x * (s2 - jnp.square(s1))[:, None, None, :].astype(x.dtype)
            return jnp.sum(y.astype(jnp.float32)), s1, s2

        jfn = jax.jit(prog)
        lowered = jfn.lower(x).compile()
        hlo = lowered.as_text()
        out = jfn(x)
        val = float(out[0])
        s1 = np.asarray(out[1], np.float64)
        if ref is None:
            ref = s1
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            r = jfn(x)
            float(r[0])
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "variant": name,
            "ms": round(1e3 * best, 3),
            "f32_copy_convert_MB": round(big_convert_bytes(hlo), 1),
            "mean_err": float(np.abs(s1 - ref).max()),
            "check": round(val, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
