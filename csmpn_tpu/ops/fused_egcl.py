"""Fused message passing: gather -> edge CEMLP -> segment reduce in ONE
Pallas pass over HBM (NOTES.md backlog #2; SURVEY.md §7.3 "segment-reduce
performance"; reference hot path ``EGCL.message``/``propagate``,
csmpn/models/cegnn_utils.py:254-262,279).

The composed EGCL edge pipeline streams every (E, C*nb) intermediate
through HBM: gather h_i, gather h_j, message-CEMLP block inputs/outputs,
and the message tensor consumed by the segment reduce — ~6 full passes
over the edge dimension per layer forward.  This kernel performs the
whole edge-side forward in one pass:

  * grid over OUTPUT node blocks of ``wn`` segments (edges sorted by
    target, so each block owns one contiguous edge range — computed with
    a searchsorted outside and passed via scalar prefetch, exactly like
    ops/pallas_segment.py);
  * the target gather ``h[dst]`` never touches HBM per edge: the block's
    node window is VMEM-resident (a tiled input) and rows are selected
    with an exact one-hot MXU matmul;
  * the source features ``h[src]`` (pre-gathered once by XLA — the only
    per-edge input stream) and edge attributes are streamed chunk-wise
    with double-buffered DMA;
  * both CEMLP blocks (MVLinear -> MVSiLU -> SGP -> MVLayerNorm, shared
    math with ops/cemlp_kernel.py) run on the VMEM-resident chunk;
  * the segment sum accumulates into the VMEM output block via the
    one-hot matmul — per-edge messages are NEVER materialized in HBM.

Backward is recompute-based and reuses the existing whole-block kernels:
rebuild the block-1 input stream (one XLA gather + concat), re-run block 1
forward, then the two recompute-in-tile block backward kernels; the
target-side cotangent is reduced with the sorted-segment-sum kernel.  No
new backward kernel is required.
"""
from __future__ import annotations

import functools
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cemlp_kernel import (
    _dot,
    _forward_math,  # noqa: F401  (re-exported for tests)
    _fused_block_bwd,
    _pallas_fwd,
    _post_linear_math,
    _round_up,
    _structural_tables,
    _vmem_params,
    block_tables,
)


def _dot_t(a, b, exact: bool):
    prec = (jax.lax.Precision.HIGHEST if exact
            else jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)


# ===================================================================
# forward kernel
# ===================================================================

def _make_fwd_kernel(nb: int, exact: bool, wn: int, te: int,
                     has_attr: bool):
    n_t = 10  # per-block table count (W, b, M, gb, Wr, sa, Kcat, WL, bL, aln)

    def kernel(*args):
        i = 0
        bounds_ref = args[i]; i += 1
        ids_ref = args[i]; i += 1
        hj_ref = args[i]; i += 1
        attr_ref = None
        w1a_ref = None
        if has_attr:
            attr_ref = args[i]; i += 1
        h_ref = args[i]; i += 1
        t1 = args[i:i + n_t]; i += n_t
        if has_attr:
            w1a_ref = args[i]; i += 1
        t2 = args[i:i + n_t]; i += n_t
        consts = args[i:i + 6]; i += 6
        out_ref = args[i]; i += 1
        ids_s = args[i]; i += 1
        hj_s = args[i]; i += 1
        attr_s = None
        if has_attr:
            attr_s = args[i]; i += 1
        sems = args[i]

        b = pl.program_id(0)
        start = bounds_ref[b]
        end = bounds_ref[b + 1]
        base = b * wn

        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

        aligned_start = (start // te) * te
        n_chunks = pl.cdiv(end - aligned_start, te)

        window = h_ref[:]                               # (wn, Ln_p)
        cv = tuple(c[:] for c in consts)
        refs1 = tuple(t[:] for t in t1) + cv
        refs2 = tuple(t[:] for t in t2) + cv
        W1h, b1 = refs1[0], refs1[1]
        W2, b2 = refs2[0], refs2[1]
        W1a = w1a_ref[:] if has_attr else None

        def start_dma(c, slot):
            off = pl.multiple_of(aligned_start + c * te, te)
            pltpu.make_async_copy(
                ids_ref.at[:, pl.ds(off, te)], ids_s.at[slot],
                sems.at[slot, 0]).start()
            pltpu.make_async_copy(
                hj_ref.at[pl.ds(off, te), :], hj_s.at[slot],
                sems.at[slot, 1]).start()
            if has_attr:
                pltpu.make_async_copy(
                    attr_ref.at[pl.ds(off, te), :], attr_s.at[slot],
                    sems.at[slot, 2]).start()

        @pl.when(n_chunks > 0)
        def _():
            start_dma(0, 0)

        def body(c, _):
            slot = jax.lax.rem(c, 2)
            next_slot = jax.lax.rem(c + 1, 2)

            @pl.when(c + 1 < n_chunks)
            def _():
                start_dma(c + 1, next_slot)

            off = pl.multiple_of(aligned_start + c * te, te)
            pltpu.make_async_copy(ids_ref.at[:, pl.ds(off, te)],
                                  ids_s.at[slot], sems.at[slot, 0]).wait()
            pltpu.make_async_copy(hj_ref.at[pl.ds(off, te), :],
                                  hj_s.at[slot], sems.at[slot, 1]).wait()
            if has_attr:
                pltpu.make_async_copy(attr_ref.at[pl.ds(off, te), :],
                                      attr_s.at[slot],
                                      sems.at[slot, 2]).wait()

            ids = ids_s[slot]                           # (1, TE) int32
            rows = jax.lax.broadcasted_iota(jnp.int32, (wn, te), 0)
            # one-hot edge->window-row membership; rows outside this
            # block's id window (chunk-alignment overlap, masked edges,
            # stream padding) match nothing and are dropped exactly
            oh = jnp.where(ids - base == rows, 1.0, 0.0)  # (wn, te) f32
            # exact f32 target gather: one nonzero per edge column
            h_i = jax.lax.dot_general(
                oh, window, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)    # (te, Ln_p)
            msg = h_i - hj_s[slot].astype(jnp.float32)
            y1 = _dot(msg, W1h, exact) + b1
            if has_attr:
                y1 = y1 + _dot(attr_s[slot].astype(jnp.float32), W1a,
                               exact)
            f1 = _post_linear_math(y1, refs1, nb, exact)
            y2 = _dot(f1["out"], W2, exact) + b2
            f2 = _post_linear_math(y2, refs2, nb, exact)
            # segment reduce on the MXU (bf16 stream in fast mode, like
            # ops/pallas_segment.py)
            red_dt = jnp.float32 if exact else jnp.bfloat16
            prec = (jax.lax.Precision.HIGHEST if exact
                    else jax.lax.Precision.DEFAULT)
            out_ref[:] += jnp.dot(
                oh.astype(red_dt), f2["out"].astype(red_dt),
                preferred_element_type=jnp.float32, precision=prec)
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)

    return kernel


def _whole_spec(shape):
    return pl.BlockSpec(shape, (lambda b, *_: (0,) * len(shape)),
                        memory_space=pltpu.VMEM)


def _as2d(t):
    return t.reshape(1, -1) if t.ndim == 1 else t


def _mp_forward(meta, consts, interpret, h, hj, attr, ids_oh, dst, bounds,
                tables):
    (nb, exact, has_attr, wn, te, Ln, La) = meta
    N_p, Ln_p = h.shape
    E_p = hj.shape[0]
    n_blocks = N_p // wn
    t1, t2 = tables[:10], tables[10:]
    Lp = t1[4].shape[0]                                  # Wr (Lp, Lp)
    La_p = attr.shape[1] if has_attr else 0
    # fast mode streams the per-edge inputs as bf16 (halves the dominant
    # HBM traffic; same input-rounding class as the bf16 aggregation) —
    # the backward recompute applies the same rounding
    stream_dt = jnp.float32 if exact else jnp.bfloat16
    hj = hj.astype(stream_dt)
    if has_attr:
        attr = attr.astype(stream_dt)

    # split the block-1 input linear over (message, edge_attr) lanes
    W1 = t1[0]
    W1h = jnp.pad(W1[:Ln], ((0, Ln_p - Ln), (0, 0)))
    ops1 = [W1h] + [_as2d(t) for t in t1[1:]]
    opsa = []
    if has_attr:
        Lin = W1.shape[0]
        W1a = jnp.pad(W1[Ln:Ln + La], ((0, La_p - La), (0, 0)))
        del Lin
        opsa = [W1a]
    ops2 = [_as2d(t) for t in t2]
    opsc = [_as2d(jnp.asarray(c)) for c in consts]

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),               # ids (1, E_p)
        pl.BlockSpec(memory_space=pl.ANY),               # hj (E_p, Ln_p)
    ]
    operands = [ids_oh, hj]
    if has_attr:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(attr)
    in_specs.append(pl.BlockSpec((wn, Ln_p), lambda b, *_: (b, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(h)
    for op in ops1 + opsa + ops2 + opsc:
        in_specs.append(_whole_spec(op.shape))
        operands.append(op)

    scratch = [
        pltpu.VMEM((2, 1, te), jnp.int32),
        pltpu.VMEM((2, te, Ln_p), stream_dt),
    ]
    if has_attr:
        scratch.append(pltpu.VMEM((2, te, La_p), stream_dt))
    scratch.append(pltpu.SemaphoreType.DMA((2, 3)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((wn, Lp), lambda b, *_: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    kernel = _make_fwd_kernel(nb, exact, wn, te, has_attr)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N_p, Lp), jnp.float32),
        interpret=interpret,
        # the resident tables (3x (Lp, 8*Lp) geometric-product gathers)
        # plus per-chunk intermediates exceed the 16 MiB default scoped-
        # vmem budget; derive the limit from the actual footprint so a
        # larger hidden width scales it instead of failing compile
        # (advisor r2); v5e has 128 MiB of VMEM per core
        compiler_params=_vmem_params(
            # VMEM-tiled operands: the node window + all lane tables
            # (the streamed ids/hj/attr live in HBM, DMA'd into scratch)
            sum(int(np.prod(o.shape)) * 4
                for o in ops1 + opsa + ops2 + opsc)
            + (wn * Ln_p + wn * Lp) * 4,
            # explicit scratch + per-chunk intermediates
            2 * te * 4
            + 2 * te * (Ln_p + La_p) * jnp.dtype(stream_dt).itemsize
            + (2 * te * nb * Lp + 14 * te * Lp + wn * te) * 4),
    )(bounds, *operands)


# ===================================================================
# custom VJP
# ===================================================================

@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fused_mp(meta, consts, interpret, h, hj, attr, ids_oh, dst, bounds,
              *tables):
    return _mp_forward(meta, consts, interpret, h, hj, attr, ids_oh, dst,
                       bounds, tables)


def _fused_mp_fwd(meta, consts, interpret, h, hj, attr, ids_oh, dst,
                  bounds, *tables):
    out = _mp_forward(meta, consts, interpret, h, hj, attr, ids_oh, dst,
                      bounds, tables)
    return out, (h, hj, attr, ids_oh, dst, tables)


def _fused_mp_bwd(meta, consts, interpret, res, dagg):
    (nb, exact, has_attr, wn, te, Ln, La) = meta
    h, hj, attr, ids_oh, dst, tables = res
    t1, t2 = tables[:10], tables[10:]
    N_p = h.shape[0]
    Lin_p = t1[0].shape[0]
    Lp = t1[4].shape[0]
    bmeta = (nb, exact)

    # rebuild the block-1 input stream (the only E-row recompute input),
    # mirroring the forward's fast-mode bf16 stream rounding
    stream_dt = jnp.float32 if exact else jnp.bfloat16
    hi_e = jnp.take(h, dst, axis=0)                      # (E_p, Ln_p)
    msg = hi_e - hj.astype(stream_dt).astype(jnp.float32)
    parts = [msg[:, :Ln]]
    if has_attr:
        parts.append(attr.astype(stream_dt)[:, :La].astype(jnp.float32))
    x1 = jnp.concatenate(parts, axis=1)
    x1 = jnp.pad(x1, ((0, 0), (0, Lin_p - x1.shape[1])))

    o1 = _pallas_fwd(bmeta, consts, interpret, x1, t1)

    # target-gathered output cotangent; masked/padded edges (sentinel
    # ids) contribute nothing
    live = (ids_oh < N_p).reshape(-1, 1)
    dagg_e = jnp.where(live, jnp.take(dagg, dst, axis=0), 0.0)

    outs2 = _fused_block_bwd(bmeta, consts, interpret, (o1, t2), dagg_e)
    do1, g2 = outs2[0], outs2[1:]
    outs1 = _fused_block_bwd(bmeta, consts, interpret, (x1, t1), do1)
    dx1, g1 = outs1[0], outs1[1:]

    dmsg = dx1[:, :Ln]
    Ln_p = hj.shape[1]
    dmsg_p = jnp.pad(dmsg, ((0, 0), (0, Ln_p - Ln)))
    dhj = -dmsg_p
    if has_attr:
        La_p = attr.shape[1]
        dattr = jnp.pad(dx1[:, Ln:Ln + La], ((0, 0), (0, La_p - La)))
    else:
        dattr = jnp.zeros_like(attr)

    from .segment import sorted_segment_sum

    dh = sorted_segment_sum(dmsg_p, dst, N_p)
    return (dh, dhj, dattr, None, None, None) + tuple(g1) + tuple(g2)


_fused_mp.defvjp(_fused_mp_fwd, _fused_mp_bwd)


# ===================================================================
# public entry points
# ===================================================================

def fused_mp_supported(algebra, edge_model) -> bool:
    """The fused message-passing kernel serves the training fast path on
    TPU for small-blade algebras (Cl(2)/Cl(3)) and the standard 2-block
    edge CEMLP with hidden == out width; exact mode keeps the composed
    path (bit-closeness for parity tests)."""
    from .segment import aggregation_exact

    return (jax.default_backend() == "tpu"
            and not aggregation_exact()
            and algebra.n_blades <= 8
            and edge_model.n_layers == 2
            and edge_model.hidden_features == edge_model.out_features)


def fused_message_aggregate(edge_model, h, hj, edge_attr, dst,
                            edge_mask=None, *, mean: bool,
                            wn: int = 128, te: int = 128,
                            interpret: Optional[bool] = None):
    """EGCL edge side — ``reduce_dst(edge_cemlp(h[dst] - h[src] ++ attr))``
    — as one fused pass.  ``h``: (N, C, nb); ``hj``: (E, C, nb) pre-gathered
    source features (their cotangent flows back through the caller's
    gather); ``dst``: (E,) int32 sorted ascending.  Returns (N, C_out, nb).
    """
    from .segment import aggregation_exact, segment_counts

    alg = edge_model.algebra
    nb = alg.n_blades
    exact = aggregation_exact()
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    N, Cm = h.shape[0], h.shape[1]
    E = dst.shape[0]
    C = edge_model.hidden_features
    Ca = edge_model.in_features - Cm
    has_attr = edge_attr is not None
    assert (Ca > 0) == has_attr, (Ca, has_attr)

    Ln = Cm * nb
    Ln_p = _round_up(Ln, 128)
    La = Ca * nb
    La_p = _round_up(max(La, 1), 128)
    Lp = _round_up(C * nb, 128)
    Lin_p = _round_up((Cm + Ca) * nb, 128)

    consts = _structural_tables(alg.dim, tuple(alg.metric.tolist()), C, Lp)
    tables1 = block_tables(edge_model, 0, Lin_p, Lp)
    tables2 = block_tables(edge_model, 1, Lp, Lp)

    N_p = max(_round_up(N, wn), wn)
    E_p = max(_round_up(E, te), te)
    sent = np.int32(N_p + wn)

    h_flat = h.reshape(N, Ln).astype(jnp.float32)
    h_flat = jnp.pad(h_flat, ((0, N_p - N), (0, Ln_p - Ln)))
    hj_flat = hj.reshape(E, Ln).astype(jnp.float32)
    hj_flat = jnp.pad(hj_flat, ((0, E_p - E), (0, Ln_p - Ln)))
    if has_attr:
        attr_flat = edge_attr.reshape(E, La).astype(jnp.float32)
        attr_flat = jnp.pad(attr_flat, ((0, E_p - E), (0, La_p - La)))
    else:
        attr_flat = jnp.zeros((E_p, La_p), jnp.float32)

    dst = dst.astype(jnp.int32)
    ids = dst if edge_mask is None else jnp.where(edge_mask, dst, sent)
    ids_oh = jnp.pad(ids, (0, E_p - E), constant_values=sent)
    dst_p = jnp.pad(dst, (0, E_p - E), constant_values=N - 1)
    n_blocks = N_p // wn
    bounds = jnp.searchsorted(
        dst, jnp.arange(n_blocks + 1, dtype=jnp.int32) * wn,
        side="left").astype(jnp.int32)

    meta = (nb, bool(exact), has_attr, wn, te, Ln, La)
    agg = _fused_mp(meta, consts, bool(interpret), h_flat, hj_flat,
                    attr_flat, ids_oh.reshape(1, -1), dst_p, bounds,
                    *tables1, *tables2)
    agg = agg[:N, :C * nb].reshape(N, C, nb)

    if mean:
        counts = segment_counts(dst[:E] if edge_mask is None else dst, N,
                                mask=edge_mask, indices_are_sorted=True)
        agg = agg / jnp.maximum(counts, 1.0)[:, None, None]
    return agg
