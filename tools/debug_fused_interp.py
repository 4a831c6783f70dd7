"""Isolate the fused-MP hardware gradient bug: same fused call,
interpret=True vs interpret=False, same inputs, one TPU process.
Usage: python tools/debug_fused_interp.py
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
    from csmpn_tpu.ops.segment import set_aggregation_mode

    set_aggregation_mode("fast")
    alg = get_algebra((1.0, 1.0, 1.0))
    rng = np.random.RandomState(0)
    N, E, C = 512, 4096, 32
    dst = np.sort(rng.randint(0, N, size=E)).astype(np.int32)
    h = jnp.asarray(rng.randn(N, C, 8), jnp.float32)
    hj = jnp.asarray(rng.randn(E, C, 8), jnp.float32)
    dst = jnp.asarray(dst)

    cemlp = CEMLP(alg, C, C, C, fused=False)
    params = cemlp.init(jax.random.PRNGKey(0),
                        jnp.zeros((4, C, 8), jnp.float32))

    def loss(p, interp):
        def run(mod):
            return fused_message_aggregate(mod, h, hj, None, dst,
                                           mean=True, interpret=interp)
        agg = cemlp.apply(p, method=run)
        return jnp.mean(agg ** 2)

    g_hw = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
    g_in = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
    fh = jax.tree_util.tree_flatten_with_path(g_hw)[0]
    fi = jax.tree_util.tree_flatten_with_path(g_in)[0]
    for (kp, a), (_, b) in zip(fh, fi):
        a = np.asarray(a); b = np.asarray(b)
        rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)
        flag = "  <<<" if rel > 3e-2 else ""
        print(f"{rel:10.3e} |hw|={np.abs(a).max():.3e} "
              f"|in|={np.abs(b).max():.3e}  {jax.tree_util.keystr(kp)}{flag}")


if __name__ == "__main__":
    main()
