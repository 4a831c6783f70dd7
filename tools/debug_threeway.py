"""Three-way EGCL gradient check on TPU at small shape:
pure-XLA ground truth (jnp.take + one-hot matmul aggregation, standard
autodiff, no custom VJPs) vs the composed path vs the fused-MP path.
Usage: python tools/debug_threeway.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from csmpn_tpu.algebra import get_algebra
    from csmpn_tpu.nn.egcl import EGCL
    from csmpn_tpu.ops.segment import set_aggregation_mode

    alg = get_algebra((1.0, 1.0, 1.0))
    rng = np.random.RandomState(0)
    N, E, C = 512, 4096, 32
    src = rng.randint(0, N, size=E)
    dst = rng.randint(0, N, size=E)
    order = np.lexsort((src, dst))
    ei = jnp.asarray(np.stack([src[order], dst[order]]).astype(np.int32))
    h = jnp.asarray(rng.randn(N, C, 8), jnp.float32)
    so = np.argsort(ei[0], kind="stable").astype(np.int32)
    src_sort = (jnp.asarray(so), jnp.asarray(np.asarray(ei[0])[so]))

    set_aggregation_mode("fast")
    print(f"device={jax.devices()[0].platform} N={N} E={E} C={C}")

    layer_f = EGCL(alg, C, C, C, aggr="mean", fused_mlp=None)
    layer_c = EGCL(alg, C, C, C, aggr="mean", fused_mlp=False)
    params = layer_f.init(jax.random.PRNGKey(0), h, ei, src_sort=src_sort)

    # ground truth: same modules, but gathers/aggregation in plain XLA
    # with standard autodiff (one-hot matmul segment mean)
    oh = jax.nn.one_hot(np.asarray(ei[1]), N, dtype=jnp.float32)  # (E, N)
    counts = jnp.maximum(oh.sum(0), 1.0)

    def truth(p):
        def fwd(mod):
            hi = jnp.take(h, ei[1], axis=0)
            hj = jnp.take(h, ei[0], axis=0)
            msg = mod.message(hi, hj)
            flat = msg.reshape(E, -1)
            agg = (oh.T @ flat) / counts[:, None]
            agg = agg.reshape(N, *msg.shape[1:])
            return mod.update(h, agg)

        out = layer_c.apply(p, method=fwd)
        return jnp.mean(out ** 2)

    def loss(layer):
        def f(p):
            return jnp.mean(layer.apply(p, h, ei, src_sort=src_sort) ** 2)
        return f

    g_t = jax.jit(jax.grad(truth))(params)
    g_f = jax.jit(jax.grad(loss(layer_f)))(params)
    g_c = jax.jit(jax.grad(loss(layer_c)))(params)

    ft = jax.tree_util.tree_flatten_with_path(g_t)[0]
    ff = jax.tree_util.tree_flatten_with_path(g_f)[0]
    fc = jax.tree_util.tree_flatten_with_path(g_c)[0]
    print(f"{'leaf':55s} {'fused_rel':>10s} {'comp_rel':>10s}")
    for (kp, t), (_, a), (_, b) in zip(ft, ff, fc):
        name = jax.tree_util.keystr(kp)
        t = np.asarray(t); a = np.asarray(a); b = np.asarray(b)
        d = max(np.abs(t).max(), 1e-6)
        ra = np.abs(a - t).max() / d
        rb = np.abs(b - t).max() / d
        flag = "  <<<" if max(ra, rb) > 3e-2 else ""
        print(f"{name:55s} {ra:10.3e} {rb:10.3e}{flag}")


if __name__ == "__main__":
    main()
