"""Direct hardware test of _fused_block_bwd's table-grad accumulation:
kernel grads vs jax.vjp over the pure-jnp _forward_math, at small and
large row counts.  Usage: python tools/debug_block_bwd.py
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
    from csmpn_tpu.ops.cemlp_kernel import (
        _forward_math, _fused_block_bwd, _structural_tables, block_tables)

    alg = get_algebra((1.0, 1.0, 1.0))
    C = 32
    nb = alg.n_blades
    L = C * nb  # 256
    cemlp = CEMLP(alg, C, C, C, fused=False)
    rng = np.random.RandomState(0)
    params = cemlp.init(jax.random.PRNGKey(0),
                        jnp.zeros((4, C, nb), jnp.float32))
    bound = cemlp.bind(params)
    consts = _structural_tables(alg.dim, tuple(alg.metric.tolist()), C, L)
    tables = block_tables(bound, 0, L, L)
    meta = (nb, False)

    names = ["dW1", "db1", "dM", "dgb", "dWr", "dsa", "dKcat", "dWL",
             "dbL", "daln"]

    def ref_fn(x, *tabs):
        refs = tuple(tabs) + tuple(jnp.asarray(c) for c in consts)
        return _forward_math(x, refs, nb, False)["out"]

    for rows in (8192, 131072):
        x = jnp.asarray(rng.randn(rows, L), jnp.float32)
        dout = jnp.asarray(rng.randn(rows, L), jnp.float32)

        outs = jax.jit(lambda x, dout, *t: _fused_block_bwd(
            meta, consts, False, (x, tuple(t)), dout))(x, dout, *tables)
        dx_k, tg_k = outs[0], outs[1:]

        def ref_grads(x, dout, *tabs):
            _, vjp = jax.vjp(ref_fn, x, *tabs)
            return vjp(dout)

        ref = jax.jit(ref_grads)(x, dout, *tables)
        dx_r, tg_r = ref[0], ref[1:]

        print(f"rows={rows}")
        rel = float(jnp.abs(dx_k - dx_r).max()
                    / jnp.maximum(jnp.abs(dx_r).max(), 1e-6))
        print(f"  dx rel={rel:.3e}")
        for n, a, b in zip(names, tg_k, tg_r):
            a = np.asarray(a).reshape(-1)
            b = np.asarray(b).reshape(-1)
            rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)
            print(f"  {n:6s} rel={rel:10.3e} |k|={np.abs(a).max():.4e} "
                  f"|r|={np.abs(b).max():.4e}")


if __name__ == "__main__":
    main()
