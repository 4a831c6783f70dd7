"""Microbenchmark: Mosaic (Pallas) matmul rate by operand dtype/precision,
plus VPU elementwise rate — the numbers that decide kernel design
(bf16-feeding vs f32, matmul-GP vs lane-op-GP).

Times a single resident-weight matmul kernel over a tall activation,
scan-chained inside one jit (relay-safe: scalar completion fetch).

Usage: python tools/mxu_probe.py [--rows 131072] [--k 256] [--n 2048]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=131072)
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, K, N, T = args.rows, args.k, args.n, args.tile
    rng = np.random.RandomState(0)
    x32 = jnp.asarray(rng.randn(R, K), jnp.float32)
    w32 = jnp.asarray(rng.randn(K, N) / np.sqrt(K), jnp.float32)

    def matmul(x, w, in_dt, prec):
        def kernel(x_ref, w_ref, o_ref):
            a = x_ref[:].astype(in_dt)
            b = w_ref[:].astype(in_dt)
            # reduce to a narrow output so the timing is MXU-bound, not
            # output-write-bound
            o_ref[:] = jnp.dot(a, b, preferred_element_type=jnp.float32,
                               precision=prec)[:, :128]

        return pl.pallas_call(
            kernel,
            grid=(R // T,),
            in_specs=[
                pl.BlockSpec((T, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        )(x, w)

    def vpu_chain(x, n_ops):
        def kernel(x_ref, o_ref):
            v = x_ref[:]
            for _ in range(n_ops):
                v = v * 1.0001 + 0.001
            o_ref[:] = v

        return pl.pallas_call(
            kernel,
            grid=(R // T,),
            in_specs=[pl.BlockSpec((T, K), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((T, K), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, K), jnp.float32),
        )(x)

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

    flops = 2.0 * R * K * N
    from jax.lax import Precision
    for name, in_dt, prec in [
        ("f32 DEFAULT", jnp.float32, Precision.DEFAULT),
        ("f32 HIGHEST", jnp.float32, Precision.HIGHEST),
        ("bf16 DEFAULT", jnp.bfloat16, Precision.DEFAULT),
    ]:
        t = timed(lambda x, dt=in_dt, p=prec: matmul(x, w32, dt, p), x32)
        print(f"matmul {name:14s} ({R}x{K})@({K}x{N}) tile {T}: "
              f"{t * 1e3:7.3f} ms  {flops / t / 1e12:7.2f} TF/s")

    for n_ops in (16, 64):
        t = timed(functools.partial(vpu_chain, n_ops=n_ops), x32)
        ops = R * K * n_ops * 2.0
        print(f"vpu chain {n_ops:3d} fma ops on (R,{K}): {t * 1e3:7.3f} ms  "
              f"{ops / t / 1e12:7.2f} T elem-op/s")


if __name__ == "__main__":
    main()
