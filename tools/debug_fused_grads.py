"""Per-leaf gradient comparison fused-MP vs composed on TPU (debug aid).

Usage: python tools/debug_fused_grads.py [--edges 131072] [--nodes 8192]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=131072)
    ap.add_argument("--nodes", type=int, default=8192)
    ap.add_argument("--hidden", type=int, default=32)
    args = ap.parse_args()

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

    layer_f, params = make(None)
    layer_c, _ = make(False)

    def loss(layer):
        def f(p):
            return jnp.mean(layer.apply(p, h, ei, src_sort=src_sort) ** 2)
        return f

    g_f = jax.jit(jax.grad(loss(layer_f)))(params)
    g_c = jax.jit(jax.grad(loss(layer_c)))(params)
    flat_f = jax.tree_util.tree_flatten_with_path(g_f)[0]
    flat_c = jax.tree_util.tree_flatten_with_path(g_c)[0]
    for (kp, a), (_, b) in zip(flat_f, flat_c):
        name = jax.tree_util.keystr(kp)
        a = np.asarray(a); b = np.asarray(b)
        rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)
        print(f"{rel:10.3e}  |fused|={np.abs(a).max():.3e} "
              f"|comp|={np.abs(b).max():.3e}  {name}")


if __name__ == "__main__":
    main()
