"""Component timing of the hulls (Cl(5,0)) train step on the current device
— finds where the 131k-step reference-budget run spends its time.

Usage: DATAROOT=data python tools/profile_hulls_step.py [--batch 16]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, steps=8, repeats=4):
    import jax
    import jax.numpy as jnp

    def body(c, _):
        return fn(*c) if isinstance(c, tuple) else fn(c), 0

    def run_(x):
        out = jax.lax.scan(lambda c, _: (fn(c), 0), x, None, length=steps)[0]
        return out, jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0]

    run = jax.jit(run_)
    out, s = run(args)
    _ = float(s)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out, s = run(args)
        _ = float(s)
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from csmpn_tpu.algebra import get_algebra
    from csmpn_tpu.data.hulls import ConvexHullDataset
    from csmpn_tpu.models.hulls import HullsModel
    from csmpn_tpu.nn.modules import CEMLP, MVLinear, \
        SteerableGeometricProductLayer
    from csmpn_tpu.nn.egcl import EGCL

    ds = ConvexHullDataset(num_samples=16384, batch_size=args.batch,
                           num_val_samples=16384)
    model = HullsModel(spec=ds.spec)
    batch = next(iter(ds.train_loader(seed=0)))
    batch = jax.tree.map(jnp.asarray, batch)
    params = model.init(jax.random.PRNGKey(0), batch)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    B, N = batch.node_types.shape
    E = batch.edge_index.shape[1]
    print(f"# hulls step: B={B} N={N} E={E} (B*E={B*E}) "
          f"device={jax.devices()[0].platform}")

    # full train step
    def train_step(carry):
        params, opt_state = carry

        def loss_fn(p):
            loss, _ = model.apply(p, batch)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state)

    t = timed(train_step, (params, opt_state))
    print(f"train step (fwd+bwd+adam)      {t*1e3:8.2f} ms")

    # pure forward: thread a scalar through the batch so the loop body
    # can't be hoisted out of the scan
    def fwd(c):
        feats = {"input": batch.features["input"] + c * 1e-20}
        loss, _ = model.apply(params, batch.replace(features=feats))
        return loss

    t = timed(fwd, jnp.float32(0.0))
    print(f"model fwd                      {t*1e3:8.2f} ms")

    alg = get_algebra((1.0,) * 5)
    rows = B * E
    C = 28
    x = jnp.asarray(np.random.RandomState(0).randn(rows, C, 32), jnp.float32)

    lin = MVLinear(alg, C, C)
    pl_ = lin.init(jax.random.PRNGKey(0), x)
    t = timed(lambda m: lin.apply(pl_, m), x)
    print(f"MVLinear Cl(5) ({rows} rows)   {t*1e3:8.2f} ms")

    sgp = SteerableGeometricProductLayer(alg, C)
    pg = sgp.init(jax.random.PRNGKey(0), x)
    t = timed(lambda m: sgp.apply(pg, m), x)
    print(f"SGP Cl(5) ({rows} rows)        {t*1e3:8.2f} ms")

    mlp = CEMLP(alg, C, C, C)
    pm = mlp.init(jax.random.PRNGKey(0), x)
    t = timed(lambda m: mlp.apply(pm, m), x)
    print(f"edge CEMLP Cl(5) (2 blocks)    {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
