#!/usr/bin/env python3
"""Compiled-structure evidence for the time-sharded Jacobi decoder.

This environment has one real chip and a single-core host, so a
wall-clock multi-chip scaling curve cannot be measured honestly (a
virtual 8-device CPU mesh timeshares one core). What CAN be verified is
the partitioned program itself: compile ``render_jacobi_sharded``'s
jitted sweep loop over an 8-device mesh and inspect the SPMD module —
each shard must run generator convolutions over T/8 frames per sweep,
with the shifted prev-frame/label windows lowered to 1-frame
``collective-permute`` halo exchanges (the ICI pattern on real
hardware). Writes artifacts/bench/jacobi_sharded_evidence.json (cited
by PARITY.md).
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from text2video_tpu.parallel.mesh import make_mesh
    from text2video_tpu.render import Renderer
    from jax.sharding import NamedSharding, PartitionSpec as P

    t, h, w = 32, 64, 64
    n_dev = 8
    mesh = make_mesh(n_data=n_dev, n_model=1)
    r = Renderer.create(height=h, width=w, base_ch=16, n_blocks=2,
                        dtype=jnp.bfloat16)
    labels = jnp.asarray(
        np.random.RandomState(0).rand(t, h, w, 3).astype(np.float32)
    )
    has_prev = (jnp.arange(t) > 0).astype(jnp.float32)
    shard_t = NamedSharding(mesh, P("data"))
    labels = jax.device_put(labels, shard_t)
    has_prev = jax.device_put(has_prev, shard_t)
    params = jax.device_put(r.params, NamedSharding(mesh, P()))

    fn = jax.jit(r._jacobi_sharded_impl, static_argnums=(3,))
    compiled = fn.lower(params, labels, has_prev, 2).compile()
    hlo = compiled.as_text()

    n_cp = len(re.findall(r"collective-permute", hlo))
    # Per-shard conv batch: convolution ops whose batch dim is t/n_dev.
    conv_shapes = re.findall(
        r"convolution\(?[^\n]*?=\s*\w+\[(\d+),(\d+),(\d+),(\d+)\]", hlo
    ) or re.findall(r"= \w+\[(\d+),(\d+),(\d+),(\d+)\][^\n]*convolution",
                    hlo)
    batches = sorted({int(s[0]) for s in conv_shapes})
    out = {
        "mesh_devices": n_dev,
        "timeline_frames": t,
        "per_shard_frames": t // n_dev,
        "collective_permutes": n_cp,
        "conv_batch_dims_seen": batches[:8],
        "per_shard_conv_batch_ok": (t // n_dev) in batches,
        "note": "SPMD module of render_jacobi_sharded's sweep loop on "
                "the 8-device virtual mesh: halo exchanges are "
                "collective-permutes; generator convs run at batch "
                "T/8 per shard.",
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "bench", "jacobi_sharded_evidence.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    assert n_cp > 0, "no collective-permute in the partitioned module"
    assert out["per_shard_conv_batch_ok"], batches


if __name__ == "__main__":
    main()
