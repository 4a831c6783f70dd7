"""fused_message_aggregate grads vs pure-XLA one-hot truth, fast vs exact.
Usage: python tools/debug_fused_truth.py
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
    from csmpn_tpu.nn.modules import CEMLP
    from csmpn_tpu.ops.fused_egcl import fused_message_aggregate
    from csmpn_tpu.ops import segment as seg

    alg = get_algebra((1.0, 1.0, 1.0))
    rng = np.random.RandomState(0)
    N, E, C = 512, 4096, 32
    dst_np = np.sort(rng.randint(0, N, size=E)).astype(np.int32)
    h = jnp.asarray(rng.randn(N, C, 8), jnp.float32)
    hj = jnp.asarray(rng.randn(E, C, 8), jnp.float32)
    dst = jnp.asarray(dst_np)

    cemlp = CEMLP(alg, C, C, C, fused=False)
    params = cemlp.init(jax.random.PRNGKey(0),
                        jnp.zeros((4, C, 8), jnp.float32))

    oh = jax.nn.one_hot(dst_np, N, dtype=jnp.float32)      # (E, N)
    counts = jnp.maximum(oh.sum(0), 1.0)

    def loss_truth(p):
        def run(mod):
            msg = mod(h[dst] - hj)
            flat = msg.reshape(E, -1)
            agg = (oh.T @ flat) / counts[:, None]
            return agg.reshape(N, *msg.shape[1:])
        agg = cemlp.apply(p, method=run)
        return jnp.mean(agg ** 2)

    def loss_fused(p):
        def run(mod):
            return fused_message_aggregate(mod, h, hj, None, dst,
                                           mean=True, interpret=False)
        agg = cemlp.apply(p, method=run)
        return jnp.mean(agg ** 2)

    g_t = jax.jit(jax.grad(loss_truth))(params)

    for mode in ("fast", "exact"):
        seg.set_aggregation_mode(mode)
        g_f = jax.jit(jax.grad(loss_fused))(params)
        ft = jax.tree_util.tree_flatten_with_path(g_t)[0]
        ff = jax.tree_util.tree_flatten_with_path(g_f)[0]
        print(f"--- mode={mode} (vs XLA one-hot truth)")
        for (kp, t), (_, a) in zip(ft, ff):
            t = np.asarray(t); a = np.asarray(a)
            rel = np.abs(a - t).max() / max(np.abs(t).max(), 1e-6)
            if rel > 1e-2:
                print(f"  {rel:10.3e} |f|={np.abs(a).max():.3e} "
                      f"|t|={np.abs(t).max():.3e} "
                      f"{jax.tree_util.keystr(kp)}")
        print("  (leaves above 1e-2 shown)")


if __name__ == "__main__":
    main()
