"""On-TPU validation + timing of the fused message-passing kernel
(ops/fused_egcl.py) against the composed EGCL path at the bench shape.

Usage: python tools/validate_fused_mp.py [--edges 131072] [--nodes 8192]
(Needs the TPU chip — do not run while another jax process holds it.)
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
    ap.add_argument("--edges", type=int, default=131072)
    ap.add_argument("--nodes", type=int, default=8192)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from csmpn_tpu.algebra import get_algebra
    from csmpn_tpu.nn.egcl import EGCL
    from csmpn_tpu.ops.segment import set_aggregation_mode

    alg = get_algebra((1.0, 1.0, 1.0))
    rng = np.random.RandomState(0)
    N, E, C = args.nodes, args.edges, args.hidden
    src = rng.randint(0, N, size=E)
    dst = rng.randint(0, N, size=E)
    order = np.lexsort((src, dst))
    ei = jnp.asarray(np.stack([src[order], dst[order]]).astype(np.int32))
    h = jnp.asarray(rng.randn(N, C, 8), jnp.float32)
    so = np.argsort(ei[0], kind="stable").astype(np.int32)
    src_sort = (jnp.asarray(so), jnp.asarray(np.asarray(ei[0])[so]))

    set_aggregation_mode("fast")
    print(f"device={jax.devices()[0].platform} N={N} E={E} C={C}")

    def make(fused_mlp):
        layer = EGCL(alg, C, C, C, aggr="mean", fused_mlp=fused_mlp)
        params = layer.init(jax.random.PRNGKey(0), h, ei,
                            src_sort=src_sort)
        return layer, params

    layer_f, params = make(None)      # auto: fused MP on TPU fast
    layer_c, _ = make(False)          # composed

    # ---- correctness: fwd + grads fused vs composed
    out_f = jax.jit(lambda p: layer_f.apply(p, h, ei,
                                            src_sort=src_sort))(params)
    out_c = jax.jit(lambda p: layer_c.apply(p, h, ei,
                                            src_sort=src_sort))(params)
    rel = (jnp.abs(out_f - out_c).max()
           / jnp.maximum(jnp.abs(out_c).max(), 1e-6))
    print(f"fwd  max rel err fused vs composed: {float(rel):.2e}")

    def loss(layer):
        def f(p):
            return jnp.mean(layer.apply(p, h, ei, src_sort=src_sort) ** 2)
        return f

    g_f = jax.jit(jax.grad(loss(layer_f)))(params)
    g_c = jax.jit(jax.grad(loss(layer_c)))(params)
    errs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()
                           / jnp.maximum(jnp.abs(b).max(), 1e-6)),
        g_f, g_c)
    worst = max(jax.tree.leaves(errs))
    print(f"grad max rel err fused vs composed: {worst:.2e}")

    # ---- timing: full train step (3 layers + adam), scan-chained
    import flax.linen as nn

    def bench(fused_mlp, label):
        class Stack(nn.Module):
            @nn.compact
            def __call__(self, h, ei):
                for i in range(3):
                    h = EGCL(alg, C, C, C, aggr="mean",
                             fused_mlp=fused_mlp,
                             name=f"egcl_{i}")(h, ei, src_sort=src_sort)
                return h

        model = Stack()
        params = model.init(jax.random.PRNGKey(0), h, ei)
        opt = optax.adam(1e-3)
        ost = opt.init(params)

        def step(carry, _):
            p, o = carry
            loss, grads = jax.value_and_grad(
                lambda p: jnp.mean(model.apply(p, h, ei) ** 2))(p)
            up, o = opt.update(grads, o, p)
            return (optax.apply_updates(p, up), o), loss

        run = jax.jit(lambda c: jax.lax.scan(step, c, None,
                                             length=args.steps))
        c = (params, ost)
        c, losses = run(c)
        float(losses[-1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            c, losses = run(c)
            float(losses[-1])
            best = min(best, (time.perf_counter() - t0) / args.steps)
        eps = 3 * E / best
        print(f"{label}: {best*1e3:.2f} ms/step  {eps/1e6:.2f}M edges/s")
        return eps

    e_c = bench(False, "composed (fast mode)")
    e_f = bench(None, "fused MP")
    print(f"speedup: {e_f/e_c:.2f}x")


if __name__ == "__main__":
    main()
