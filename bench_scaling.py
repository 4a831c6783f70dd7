"""Scaling benchmark: edge-partitioned simplicial aggregation over a device
mesh (the BASELINE.md north-star harness: edges/s scaling efficiency at
1 chip / 1 host / N hosts on a large synthetic complex).

Builds a synthetic complex (default 1M simplices / 16M edges; pass
``--simplices N`` for the >=10M-simplex workload), partitions edges by
target simplex, and measures edges/s of the shard_mapped EGCL layer
(all_gather feature exchange + local message MLP + sorted local segment
reduce) at every mesh size 1..n_devices.

Usage:
  python bench_scaling.py [--simplices 1000000] [--degree 16]
                          [--hidden 32] [--devices N] [--fwd-only]

Prints one JSON line per mesh size and a final summary line with the
scaling efficiency vs the single-device rate.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--simplices", type=int, default=1_000_000)
    ap.add_argument("--degree", type=int, default=16)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--devices", type=int, default=0)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--exchange", choices=["halo", "allgather"],
                    default="halo")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from csmpn_tpu.algebra import get_algebra
    from csmpn_tpu.nn.egcl import EGCL
    from csmpn_tpu.parallel.edge_partition import (
        make_synthetic_complex,
        partition_edges,
        partition_edges_halo,
        sharded_egcl_apply,
        sharded_egcl_apply_halo,
    )
    from csmpn_tpu.parallel.mesh import make_mesh

    n_devices = args.devices or len(jax.devices())
    n_nodes = (args.simplices // n_devices) * n_devices
    alg = get_algebra((1.0, 1.0, 1.0))

    print(f"# building synthetic complex: {n_nodes} simplices, "
          f"~{n_nodes * args.degree} edges")
    ei = make_synthetic_complex(n_nodes, args.degree, seed=0)
    n_edges = ei.shape[1]
    rng = np.random.RandomState(0)
    h_host = rng.randn(n_nodes, args.hidden, 8).astype(np.float32)

    egcl = EGCL(alg, args.hidden, args.hidden, args.hidden, aggr="mean")
    params = egcl.init(jax.random.PRNGKey(0),
                       jnp.asarray(h_host[:128]),
                       jnp.asarray(ei[:, :128] % 128))

    rates = {}
    for n in range(1, n_devices + 1):
        if n_nodes % n != 0:
            continue
        mesh = make_mesh(n)
        if args.exchange == "halo":
            part = partition_edges_halo(ei, n_nodes, n)
            apply_fn = sharded_egcl_apply_halo
        else:
            part = partition_edges(ei, n_nodes, n)
            apply_fn = sharded_egcl_apply
        h = jnp.asarray(h_host)

        if args.fwd_only:
            def run(p, h):
                return apply_fn(egcl, p, h, part, mesh)
        else:
            def loss(p, h):
                out = apply_fn(egcl, p, h, part, mesh)
                return jnp.mean(out ** 2)

            def run(p, h):
                return jax.grad(loss)(p, h)

        fn = jax.jit(run)
        out = fn(params, h)
        jax.block_until_ready(out)
        # force completion through a host fetch (remote-execution relays
        # can return from block_until_ready early)
        _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = fn(params, h)
        _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
        dt = (time.perf_counter() - t0) / args.steps
        rate = n_edges / dt
        rates[n] = rate
        print(json.dumps({
            "metric": "edge_partitioned_edges_per_s",
            "exchange": args.exchange,
            "mesh_devices": n,
            "value": round(rate, 1),
            "unit": "edges/s",
        }))

    if 1 in rates and n_devices in rates and n_devices > 1:
        eff = rates[n_devices] / (rates[1] * n_devices)
        print(json.dumps({
            "metric": "edges_per_s_scaling_efficiency",
            "mesh_devices": n_devices,
            "value": round(eff, 3),
            "unit": "fraction_of_linear",
        }))


if __name__ == "__main__":
    main()
