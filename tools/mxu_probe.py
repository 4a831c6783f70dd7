"""Machine-envelope probe for the tunnel TPU chip (consolidated, round 4).

Measures the three numbers that decide kernel design on THIS machine —
recorded in NOTES.md "Measured machine envelope" and used as the
practical roofline in tools/perf_breakdown.py:

  1. HBM stream bandwidth (Pallas tiled copy at several tile heights +
     the XLA-native copy) — practical peak ~210-260 GB/s vs the 819
     spec: the machine is bandwidth-lean, so minimize E-row HBM passes
     first;
  2. VMEM-resident MXU matmul rate by operand dtype/precision (no
     streaming, no output-column DCE) — bf16 DEFAULT ~160 TF/s,
     f32 HIGHEST ~23 TF/s, and f32 DEFAULT does NOT demote to one bf16
     pass inside Mosaic: fast-mode kernels must feed the MXU bf16
     operands explicitly (ops/cemlp_kernel._cast_pair);
  3. VPU elementwise fma rate (~7 T elem-op/s marginal) — lane-op GP
     alternatives are not faster than the matmul form at nb=8 on this
     VPU/MXU ratio.

Methodology notes (why this shape): timings scan-chain the op inside one
jit and fetch ONE scalar (the relay returns from block_until_ready early
and moves bulk outputs at ~50 MB/s); resident matmuls perturb the
activation between reps so the compiler cannot hoist the dot; min over
repeats is the device truth under tunnel-load variance (~3x on
HBM-bound ops, stable on compute-bound kernels).

Tile-size conclusions (absorbed from the retired tune_tiles.py sweep):
the segment-sum kernel's (wn=128, te=1024) and the fused MP kernels'
(wn=128, te=128) are the winners and are baked in as their defaults;
per-grid-step fixed costs dominate below te=128.

Usage: python tools/mxu_probe.py [--rows 131072] [--steps 16] [--reps 32]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=131072)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--reps", type=int, default=32,
                    help="resident-matmul repetitions per kernel call")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax.lax import Precision

    R = args.rows
    rng = np.random.RandomState(0)

    def timed(fn, arg):
        def body(c, _):
            o = fn(c)
            return c + o[:1, :1] * 1e-30, 0

        run = jax.jit(lambda a: jax.lax.scan(
            body, a, None, length=args.steps)[0][0, 0])
        float(run(arg))
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            float(run(arg))
            best = min(best, (time.perf_counter() - t0) / args.steps)
        return best

    # ---- 1. HBM stream bandwidth: Pallas tiled copy + XLA copy
    x = jnp.asarray(rng.randn(R, 256), jnp.float32)
    gb = 2 * R * 256 * 4 / 1e9
    for T in (256, 1024, 4096):
        def copy(xx, T=T):
            def kernel(x_ref, o_ref):
                o_ref[:] = x_ref[:] * 2.0

            return pl.pallas_call(
                kernel,
                grid=(R // T,),
                in_specs=[pl.BlockSpec((T, 256), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((T, 256), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((R, 256), jnp.float32),
            )(xx)

        t = timed(copy, x)
        print(f"copy pallas tile {T:5d}: {t*1e3:7.3f} ms  {gb/t:7.1f} GB/s")
    t = timed(lambda xx: xx * 2.0, x)
    print(f"copy XLA (x*2):        {t*1e3:7.3f} ms  {gb/t:7.1f} GB/s")

    # ---- 2. VMEM-resident MXU rate by dtype/precision (no streaming,
    # all output columns kept, activation perturbed between reps)
    M, K, N = 512, 256, 2048
    xs = jnp.asarray(rng.randn(M, K), jnp.float32)
    w = jnp.asarray(rng.randn(K, N).astype(np.float32) / 16)

    def resident(in_dt, prec, reps):
        def kernel(x_ref, w_ref, o_ref):
            a = x_ref[:].astype(in_dt)
            b = w_ref[:].astype(in_dt)
            acc = jnp.zeros((M, N), jnp.float32)
            for _ in range(reps):
                acc = acc + jnp.dot(a, b,
                                    preferred_element_type=jnp.float32,
                                    precision=prec)
                a = a + a * jnp.asarray(1e-7, in_dt)
            o_ref[:] = acc

        def call(xx):
            return pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 << 20),
            )(xx, w)

        return call

    fl = 2.0 * M * K * N * args.reps
    for name, dt, prec in [
        ("bf16 DEFAULT", jnp.bfloat16, Precision.DEFAULT),
        ("f32  DEFAULT", jnp.float32, Precision.DEFAULT),
        ("f32  HIGHEST", jnp.float32, Precision.HIGHEST),
    ]:
        t = timed(resident(dt, prec, args.reps), xs)
        print(f"resident matmul {name}: {t*1e3:7.3f} ms  "
              f"{fl/t/1e12:7.2f} TF/s")

    # ---- 3. VPU: resident fma chain, full-width dependency
    big = jnp.asarray(rng.randn(4096, 512), jnp.float32)

    def vpu(reps):
        def kernel(x_ref, o_ref):
            v = x_ref[:]
            for _ in range(reps):
                v = v * 1.0001 + 0.001
            o_ref[:] = v

        def call(xx):
            return pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((4096, 512), jnp.float32),
            )(xx)

        return call

    t = timed(vpu(256), big)
    ops = 4096 * 512 * 256 * 2.0
    print(f"resident vpu fma x256 on (4096,512): {t*1e3:7.3f} ms  "
          f"{ops/t/1e12:7.2f} T elem-op/s")


if __name__ == "__main__":
    main()
