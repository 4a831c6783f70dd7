"""Probe 2: isolate the throughput floor seen in mxu_probe.py.

Variants: pure stream copy (no compute), tile-size sweep, weight-size
sweep (is the constant-index W block re-DMA'd per grid step?), and a
VMEM-only compute loop (no streaming) for true MXU rate.
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
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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

    # ---- pure copy at several tile heights
    for T in (256, 1024, 4096):
        x = jnp.asarray(rng.randn(R, 256), jnp.float32)

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
        gb = 2 * R * 256 * 4 / 1e9
        print(f"copy tile {T:5d}: {t*1e3:7.3f} ms  {gb/t:7.1f} GB/s")

    # ---- XLA-native copy for comparison
    x = jnp.asarray(rng.randn(R, 256), jnp.float32)
    t = timed(lambda xx: xx * 2.0, x)
    print(f"copy XLA (x*2):  {t*1e3:7.3f} ms  {2*R*256*4/1e9/t:7.1f} GB/s")

    # ---- matmul with tiny vs huge resident W, tile 1024
    for N in (256, 2048):
        w = jnp.asarray(rng.randn(256, N) / 16, jnp.float32)

        def mm(xx, w=w, N=N):
            def kernel(x_ref, w_ref, o_ref):
                o_ref[:] = jnp.dot(
                    x_ref[:].astype(jnp.bfloat16),
                    w_ref[:].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)[:, :128]

            return pl.pallas_call(
                kernel,
                grid=(R // 1024,),
                in_specs=[
                    pl.BlockSpec((1024, 256), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((256, N), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1024, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
            )(xx, w)

        t = timed(mm, x)
        fl = 2.0 * R * 256 * N
        print(f"matmul bf16 N={N:5d} tile 1024: {t*1e3:7.3f} ms  "
              f"{fl/t/1e12:7.2f} TF/s")

    # ---- VMEM-resident compute loop: true MXU rate, no streaming
    xs = jnp.asarray(rng.randn(512, 256), jnp.float32)
    w = jnp.asarray(rng.randn(256, 2048) / 16, jnp.float32)

    def resident(xx, reps=64):
        def kernel(x_ref, w_ref, o_ref):
            a = x_ref[:].astype(jnp.bfloat16)
            b = w_ref[:].astype(jnp.bfloat16)
            acc = jnp.zeros((512, 128), jnp.float32)
            for _ in range(reps):
                acc = acc + jnp.dot(
                    a, b, preferred_element_type=jnp.float32)[:, :128]
                a = (a * jnp.bfloat16(1.0001))
            o_ref[:] = acc

        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32),
        )(xx, w)

    t = timed(resident, xs)
    fl = 2.0 * 512 * 256 * 2048 * 64
    print(f"VMEM-resident bf16 matmul x64: {t*1e3:7.3f} ms  "
          f"{fl/t/1e12:7.2f} TF/s")

    # same, f32 HIGHEST
    def resident32(xx, reps=64):
        def kernel(x_ref, w_ref, o_ref):
            a = x_ref[:]
            b = w_ref[:]
            acc = jnp.zeros((512, 128), jnp.float32)
            for _ in range(reps):
                acc = acc + jnp.dot(
                    a, b, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)[:, :128]
                a = a * 1.0001
            o_ref[:] = acc

        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32),
        )(xx, w)

    t = timed(resident32, xs)
    print(f"VMEM-resident f32 HIGHEST x64: {t*1e3:7.3f} ms  "
          f"{fl/t/1e12:7.2f} TF/s")


if __name__ == "__main__":
    main()
