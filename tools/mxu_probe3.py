"""Probe 3: true VMEM-resident MXU rate (no output-column DCE) by dtype
and precision, plus true VPU rate.  Decides f32-vs-bf16 kernel feeding."""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--reps", type=int, default=32)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax.lax import Precision

    rng = np.random.RandomState(0)
    M, K, N = 512, 256, 2048
    xs = jnp.asarray(rng.randn(M, K), jnp.float32)
    w = jnp.asarray(rng.randn(K, N).astype(np.float32) / 16)

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

    def resident(in_dt, prec, reps):
        def kernel(x_ref, w_ref, o_ref):
            a = x_ref[:].astype(in_dt)
            b = w_ref[:].astype(in_dt)
            acc = jnp.zeros((M, N), jnp.float32)
            for r in range(reps):
                acc = acc + jnp.dot(a, b, preferred_element_type=jnp.float32,
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

    # VPU: resident fma chain, full-width dependency
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
                out_shape=jax.ShapeDtypeStruct((M, K), jnp.float32),
            )(xx)

        return call

    big = jnp.asarray(rng.randn(4096, 512), jnp.float32)

    def vpu_big(reps):
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

    t = timed(vpu_big(256), big)
    ops = 4096 * 512 * 256 * 2.0
    print(f"resident vpu fma x256 on (4096,512): {t*1e3:7.3f} ms  "
          f"{ops/t/1e12:7.2f} T elem-op/s")


if __name__ == "__main__":
    main()
