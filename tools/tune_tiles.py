"""Tile-size sweep for the Pallas hot-path kernels on the real TPU chip.

Round-3 roofline work (VERDICT r2 next-round #1): the segment-sum and
fused message-passing kernels were tuned at (wn=128, te=1024) and
(wn=128, te=128) respectively; per-grid-step fixed costs (DMA orchestration,
output revisit) dominate at small tiles.  This sweeps the tile space and
prints a table; winners get baked into the kernels' defaults.

Usage:  python tools/tune_tiles.py [--steps 32] [--edges 131072]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--edges", type=int, default=131072)
    ap.add_argument("--nodes", type=int, default=8192)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--exact", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from csmpn_tpu.algebra import get_algebra
    from csmpn_tpu.nn.modules import CEMLP
    from csmpn_tpu.ops.fused_egcl import fused_message_aggregate
    from csmpn_tpu.ops.pallas_segment import sorted_segment_sum_pallas
    from csmpn_tpu.ops.segment import set_aggregation_mode

    set_aggregation_mode("exact" if args.exact else "fast")
    exact = args.exact

    E, N, C = args.edges, args.nodes, args.hidden
    alg = get_algebra((1.0, 1.0, 1.0))
    nb = alg.n_blades
    D = C * nb
    rng = np.random.RandomState(0)
    dst = np.sort(rng.randint(0, N, size=E)).astype(np.int32)
    src = rng.randint(0, N, size=E).astype(np.int32)
    data = jnp.asarray(rng.randn(E, D), jnp.float32)
    h = jnp.asarray(rng.randn(N, C, nb), jnp.float32)
    hj = jnp.asarray(rng.randn(E, C, nb), jnp.float32)
    dstj = jnp.asarray(dst)

    def timeit(fn, *a):
        out = fn(*a)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        float(jax.tree.leaves(out)[0].ravel()[0])
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = fn(*a)
            float(jax.tree.leaves(out)[0].ravel()[0])
            best = min(best, (time.perf_counter() - t0) / args.steps)
        return best

    # ---------------- sorted segment sum ----------------
    print(f"\n== sorted_segment_sum_pallas  E={E} D={D} "
          f"{'exact' if exact else 'fast'} (ms/call, {args.steps} chained)")
    print(f"{'wn':>6} {'te':>6} {'ms':>9} {'GB/s':>8}")
    bytes_moved = E * D * (4 if exact else 2) + N * D * 4
    for wn in (128, 256, 512, 1024):
        for te in (512, 1024, 2048):
            def run(d, wn=wn, te=te):
                def body(c, _):
                    o = sorted_segment_sum_pallas(c, dstj, N, wn, te, exact)
                    return c + o[dstj] * 1e-9, None
                return jax.lax.scan(body, d, None, length=args.steps)[0]

            try:
                ms = timeit(jax.jit(run), data) * 1e3
                print(f"{wn:>6} {te:>6} {ms:>9.3f} "
                      f"{bytes_moved / (ms * 1e-3) / 1e9:>8.1f}")
            except Exception as e:  # noqa: BLE001
                print(f"{wn:>6} {te:>6}   FAIL {type(e).__name__}: "
                      f"{str(e)[:80]}")

    # ---------------- fused message passing (fwd) ----------------
    print(f"\n== fused_message_aggregate fwd  E={E} N={N} C={C}")
    print(f"{'wn':>6} {'te':>6} {'ms':>9} {'edges/us':>9}")
    import flax.linen as nn

    class Wrap(nn.Module):
        wn: int = 128
        te: int = 128

        @nn.compact
        def __call__(self, h, hj, dst):
            m = CEMLP(alg, C, C, C, name="edge")
            return fused_message_aggregate(m, h, hj, None, dst, mean=True,
                                           wn=self.wn, te=self.te)

    params = Wrap().init(jax.random.PRNGKey(0), h, hj, dstj)
    for wn in (128, 256, 512):
        for te in (128, 256, 512, 1024):
            w = Wrap(wn=wn, te=te)

            def run(h, hj, w=w):
                def body(c, _):
                    o = w.apply(params, c, hj, dstj)
                    return c + o * 1e-9, None

                return jax.lax.scan(body, h, None, length=args.steps)[0]

            try:
                ms = timeit(jax.jit(run), h, hj) * 1e3
                print(f"{wn:>6} {te:>6} {ms:>9.3f} "
                      f"{E / (ms * 1e3):>9.2f}")
            except Exception as e:  # noqa: BLE001
                print(f"{wn:>6} {te:>6}   FAIL {type(e).__name__}: "
                      f"{str(e)[:80]}")


if __name__ == "__main__":
    main()
