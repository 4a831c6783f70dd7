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

Backward is a SECOND single-pass kernel (``_make_bwd_kernel``): per node
block it re-streams the same edge chunks, recomputes both CEMLP blocks
in-tile, backpropagates through them, reduces the target-side cotangent
into the resident node block with the one-hot matmul, accumulates every
table gradient across the grid, and streams the per-edge cotangents
(dhj, dattr) back to HBM with read-modify-write on chunk-alignment
overlaps.  This replaces the r2 recompute composition (gather + block-1
forward + two block-backward kernels + sorted segment sum), which cost
~5 E-row kernel dispatches and ~1.6 GB of HBM intermediates per layer at
the bench shape.

Algebra support: Cl(2)/Cl(3) via the dense packed tables; Cl(4)/Cl(5)
via the shared pair-form tables (see ops/cemlp_kernel.py) — the hulls
flagship (Cl(5,0), reference hulls_cssmpnn.py:28) runs fused too.
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
    _gp_inter_bytes,
    _n_consts,
    _dot_nt,
    _forward_math,  # noqa: F401  (re-exported for tests)
    _fused_block_bwd,  # noqa: F401  (re-exported for tests)
    _pallas_fwd,  # noqa: F401  (re-exported for tests)
    _post_linear_bwd,
    _post_linear_math,
    _round_up,
    _structural_tables,
    _vmem_params,
    block_tables,
)


def _dot_t(a, b, exact: bool):
    from .cemlp_kernel import _cast_pair

    prec = (jax.lax.Precision.HIGHEST if exact
            else jax.lax.Precision.DEFAULT)
    a, b = _cast_pair(a, b, exact)
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)


# ===================================================================
# forward kernel
# ===================================================================

import os


def _onehot_bands() -> int:
    """Static band count for the one-hot window matmuls (NOTES backlog #3
    'unique-segment compaction', banded form): the (wn, te) one-hot
    gather/reduce matmuls are split into wn/kb fixed ALIGNED row bands and
    bands with no ids in the chunk are skipped (ids are sorted, so a
    te-edge chunk typically spans ~te/degree consecutive targets = 1-2
    bands at wn=128/4 bands).  This cuts the one-hot MAC inflation by the
    untouched-band fraction with STATIC slices only (no dynamic-offset
    Mosaic risk) and degenerates to the original single full-width matmul
    at 1."""
    return int(os.environ.get("CSMPN_ONEHOT_BANDS", "1"))


def _make_fwd_kernel(nb: int, exact: bool, wn: int, te: int,
                     has_attr: bool, n_bands: int = 1, sent: int = 0):
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
        nc = _n_consts(nb)
        consts = args[i:i + nc]; i += nc
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
            # one-hot edge->window-row membership; rows outside this
            # block's id window (chunk-alignment overlap, masked edges,
            # stream padding) match nothing and are dropped exactly.
            # Banded form (n_bands > 1): the window rows are split into
            # fixed kb-row bands; ids are sorted, so a chunk touches few
            # bands and the rest skip their matmuls (_onehot_bands).
            # Exact mode keeps a bit-exact f32 selection; fast mode
            # rounds the node window to bf16 (one MXU pass) — the same
            # rounding class the hj stream already carries.
            gather_dt = jnp.float32 if exact else jnp.bfloat16
            gprec = (jax.lax.Precision.HIGHEST if exact
                     else jax.lax.Precision.DEFAULT)
            kb = wn // n_bands
            # min/max over VALID ids only: masked edges carry the
            # sentinel (N_p + wn) and may be interspersed, so the chunk
            # endpoints are not reliable band bounds
            id_lo = jnp.min(ids)
            id_hi = jnp.max(jnp.where(ids < jnp.int32(sent), ids, -1))

            def band_hit(j):
                lo = base + j * kb
                return (id_lo < lo + kb) & (id_hi >= lo)

            def band_oh(j):
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (kb, te), 0) + (base + j * kb)
                return jnp.where(ids == rows, 1.0, 0.0)   # (kb, te) f32

            if n_bands == 1:
                oh_bands = [band_oh(0)]
                h_i = jax.lax.dot_general(
                    oh_bands[0].astype(gather_dt), window.astype(gather_dt),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=gprec)                      # (te, Ln_p)
            else:
                oh_bands = [band_oh(j) for j in range(n_bands)]
                h_i = jnp.zeros((te, window.shape[1]), jnp.float32)
                for j in range(n_bands):
                    win_j = window[j * kb:(j + 1) * kb, :]
                    h_i = h_i + jax.lax.cond(
                        band_hit(j),
                        lambda oj=oh_bands[j], wj=win_j: jax.lax.dot_general(
                            oj.astype(gather_dt), wj.astype(gather_dt),
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=gprec),
                        lambda: jnp.zeros((te, window.shape[1]),
                                          jnp.float32))
            msg = h_i - hj_s[slot].astype(jnp.float32)
            y1 = _dot(msg, W1h, exact) + b1
            if has_attr:
                y1 = y1 + _dot(attr_s[slot].astype(jnp.float32), W1a,
                               exact)
            f1 = _post_linear_math(y1, refs1, nb, exact)
            y2 = _dot(f1["out"], W2, exact) + b2
            f2 = _post_linear_math(y2, refs2, nb, exact)
            # segment reduce on the MXU (bf16 stream in fast mode, like
            # ops/pallas_segment.py); banded: each hit band accumulates
            # its kb-row slice with a STATIC offset
            red_dt = jnp.float32 if exact else jnp.bfloat16
            prec = (jax.lax.Precision.HIGHEST if exact
                    else jax.lax.Precision.DEFAULT)
            f2s = f2["out"].astype(red_dt)
            if n_bands == 1:
                out_ref[:] += jnp.dot(
                    oh_bands[0].astype(red_dt), f2s,
                    preferred_element_type=jnp.float32, precision=prec)
            else:
                for j in range(n_bands):
                    @pl.when(band_hit(j))
                    def _(j=j):
                        out_ref[j * kb:(j + 1) * kb, :] += jnp.dot(
                            oh_bands[j].astype(red_dt), f2s,
                            preferred_element_type=jnp.float32,
                            precision=prec)
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
    # the backward recompute applies the same rounding.  The cast happens
    # upstream in fused_message_aggregate (bf16 activation STORAGE, so the
    # caller's gather already moves bf16 rows); re-asserted here for
    # direct callers.
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
    kernel = _make_fwd_kernel(nb, exact, wn, te, has_attr,
                              n_bands=_onehot_bands(),
                              sent=int(N_p + wn))
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
            + _gp_inter_bytes(te, nb, Lp, 2)
            + (14 * te * Lp + wn * te) * 4),
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
    return out, (h, hj, attr, ids_oh, bounds, tables)


# -------------------------------------------------------------------
# combined backward kernel: ONE pass over the edge streams that
# recomputes both CEMLP blocks in-tile, backpropagates through them,
# reduces the target-side cotangent into the resident node block, and
# streams the per-edge cotangents (dhj, dattr) back to HBM.  Replaces
# the r2 recompute path (gather + block-1 fwd + 2 block-bwd kernels +
# sorted segment sum = ~5 E-row kernel dispatches and ~1.6 GB of HBM
# intermediates at the bench shape).
#
# Chunk-alignment overlap (a te-chunk shared by adjacent node blocks)
# is handled with read-modify-write: each block PURE-writes all its
# chunks except the first, which it reads back and accumulates into
# whenever the block's edge range starts mid-chunk (rows outside the
# block's id window carry exactly-zero cotangents — the one-hot window
# match zeroes dagg_e and every downstream term is linear in it — so
# summing per-block contributions reconstructs every row exactly; grid
# steps execute sequentially on the core and each write DMA is waited
# before the next chunk, so the read-back always sees completed data).
# -------------------------------------------------------------------

def _make_bwd_kernel(nb: int, exact: bool, wn: int, te: int,
                     has_attr: bool, n_bands: int = 1, sent: int = 0):
    n_t = 10
    # per-edge cotangents stream back at the activation-storage dtype
    # (bf16 in fast mode — their consumers re-round to bf16 anyway)
    stream_dt = jnp.float32 if exact else jnp.bfloat16

    def kernel(*args):
        i = 0
        bounds_ref = args[i]; i += 1
        ids_ref = args[i]; i += 1
        hj_ref = args[i]; i += 1
        attr_ref = None
        if has_attr:
            attr_ref = args[i]; i += 1
        h_ref = args[i]; i += 1
        dagg_ref = args[i]; i += 1
        t1 = args[i:i + n_t]; i += n_t
        w1a_ref = None
        if has_attr:
            w1a_ref = args[i]; i += 1
        t2 = args[i:i + n_t]; i += n_t
        nc = _n_consts(nb)
        consts = args[i:i + nc]; i += nc
        # outputs
        dh_ref = args[i]; i += 1
        dhj_ref = args[i]; i += 1
        dattr_ref = None
        if has_attr:
            dattr_ref = args[i]; i += 1
        g1 = args[i:i + n_t]; i += n_t
        gw1a_ref = None
        if has_attr:
            gw1a_ref = args[i]; i += 1
        g2 = args[i:i + n_t]; i += n_t
        # scratch
        ids_s = args[i]; i += 1
        hj_s = args[i]; i += 1
        attr_s = None
        if has_attr:
            attr_s = args[i]; i += 1
        wmsg_s = args[i]; i += 1
        wattr_s = None
        if has_attr:
            wattr_s = args[i]; i += 1
        rmw_s = args[i]; i += 1
        rmw_attr_s = None
        if has_attr:
            rmw_attr_s = args[i]; i += 1
        sems = args[i]; i += 1
        wsems = args[i]

        b = pl.program_id(0)
        start = bounds_ref[b]
        end = bounds_ref[b + 1]
        base = b * wn

        @pl.when(b == 0)
        def _():
            for r in g1 + g2:
                r[:] = jnp.zeros(r.shape, r.dtype)
            if has_attr:
                gw1a_ref[:] = jnp.zeros(gw1a_ref.shape, gw1a_ref.dtype)

        dh_ref[:] = jnp.zeros(dh_ref.shape, dh_ref.dtype)

        aligned_start = (start // te) * te
        n_chunks = pl.cdiv(end - aligned_start, te)
        rmw_first = start > aligned_start

        window = h_ref[:]                               # (wn, Ln_p)
        dagg_w = dagg_ref[:]                            # (wn, Lp)
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
            gather_dt = jnp.float32 if exact else jnp.bfloat16
            gprec = (jax.lax.Precision.HIGHEST if exact
                     else jax.lax.Precision.DEFAULT)
            # banded one-hot (see _make_fwd_kernel / _onehot_bands)
            kb = wn // n_bands
            # min/max over VALID ids only: masked edges carry the
            # sentinel (N_p + wn) and may be interspersed, so the chunk
            # endpoints are not reliable band bounds
            id_lo = jnp.min(ids)
            id_hi = jnp.max(jnp.where(ids < jnp.int32(sent), ids, -1))

            def band_hit(j):
                lo = base + j * kb
                return (id_lo < lo + kb) & (id_hi >= lo)

            def band_oh(j):
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (kb, te), 0) + (base + j * kb)
                return jnp.where(ids == rows, 1.0, 0.0)   # (kb, te) f32

            def band_gather(src_w):
                if n_bands == 1:
                    return jax.lax.dot_general(
                        oh_bands[0].astype(gather_dt),
                        src_w.astype(gather_dt),
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=gprec)
                acc = jnp.zeros((te, src_w.shape[1]), jnp.float32)
                for j in range(n_bands):
                    sw = src_w[j * kb:(j + 1) * kb, :]
                    acc = acc + jax.lax.cond(
                        band_hit(j),
                        lambda oj=oh_bands[j], s=sw: jax.lax.dot_general(
                            oj.astype(gather_dt), s.astype(gather_dt),
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=gprec),
                        lambda s=sw: jnp.zeros((te, s.shape[1]),
                                               jnp.float32))
                return acc

            oh_bands = [band_oh(j) for j in range(n_bands)]
            h_i = band_gather(window)
            # ---- forward recompute (identical math to the fwd kernel)
            msg = h_i - hj_s[slot].astype(jnp.float32)
            attr_c = (attr_s[slot].astype(jnp.float32) if has_attr
                      else None)
            y1 = _dot(msg, W1h, exact) + b1
            if has_attr:
                y1 = y1 + _dot(attr_c, W1a, exact)
            f1 = _post_linear_math(y1, refs1, nb, exact)
            x2 = f1["out"]
            y2 = _dot(x2, W2, exact) + b2
            f2 = _post_linear_math(y2, refs2, nb, exact)
            # ---- output cotangent gathered from the resident block
            dagg_e = band_gather(dagg_w)
            # ---- block 2 backward
            dy2, tg2 = _post_linear_bwd(dagg_e, f2, refs2, nb, exact)
            dx2 = _dot_nt(dy2, W2, exact)
            gW2 = _dot_t2(x2, dy2, exact)
            gb2 = jnp.sum(dy2, axis=0, keepdims=True)
            # ---- block 1 backward
            dy1, tg1 = _post_linear_bwd(dx2, f1, refs1, nb, exact)
            dmsg = _dot_nt(dy1, W1h, exact)
            gW1 = _dot_t2(msg, dy1, exact)
            gb1 = jnp.sum(dy1, axis=0, keepdims=True)
            # ---- accumulate table grads
            for r, v in zip(g1, (gW1, gb1) + tg1):
                r[:] += v
            for r, v in zip(g2, (gW2, gb2) + tg2):
                r[:] += v
            if has_attr:
                dattr_c = _dot_nt(dy1, W1a, exact)
                gw1a_ref[:] += _dot_t2(attr_c, dy1, exact)
            # ---- target-side cotangent into the resident node block
            if n_bands == 1:
                dh_ref[:] += _dot(oh_bands[0], dmsg, exact)
            else:
                for j in range(n_bands):
                    @pl.when(band_hit(j))
                    def _(j=j):
                        dh_ref[j * kb:(j + 1) * kb, :] += _dot(
                            oh_bands[j], dmsg, exact)
            # ---- per-edge cotangent stream out (RMW on an overlapped
            # first chunk; serialized write keeps RMW reads ordered)
            wmsg_s[:] = (-dmsg).astype(stream_dt)
            if has_attr:
                wattr_s[:] = dattr_c.astype(stream_dt)

            @pl.when((c == 0) & rmw_first)
            def _():
                rd = pltpu.make_async_copy(
                    dhj_ref.at[pl.ds(off, te), :], rmw_s, wsems.at[0])
                rd.start()
                rd.wait()
                wmsg_s[:] += rmw_s[:]
                if has_attr:
                    rda = pltpu.make_async_copy(
                        dattr_ref.at[pl.ds(off, te), :], rmw_attr_s,
                        wsems.at[1])
                    rda.start()
                    rda.wait()
                    wattr_s[:] += rmw_attr_s[:]

            wr = pltpu.make_async_copy(
                wmsg_s, dhj_ref.at[pl.ds(off, te), :], wsems.at[0])
            wr.start()
            wr.wait()
            if has_attr:
                wra = pltpu.make_async_copy(
                    wattr_s, dattr_ref.at[pl.ds(off, te), :], wsems.at[1])
                wra.start()
                wra.wait()
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)

    return kernel


def _dot_t2(a, b, exact: bool):
    """Rows-contracted a^T @ b for table gradients (bf16-fed in fast
    mode like every other kernel dot)."""
    from .cemlp_kernel import _dot_t as _ct

    return _ct(a, b, exact)


def _mp_backward(meta, consts, interpret, h, hj, attr, ids_oh, bounds,
                 dagg, tables):
    (nb, exact, has_attr, wn, te, Ln, La) = meta
    N_p, Ln_p = h.shape
    E_p = hj.shape[0]
    n_blocks = N_p // wn
    t1, t2 = tables[:10], tables[10:]
    Lp = t1[4].shape[0]
    La_p = attr.shape[1] if has_attr else 0
    stream_dt = jnp.float32 if exact else jnp.bfloat16
    hj = hj.astype(stream_dt)
    if has_attr:
        attr = attr.astype(stream_dt)

    W1 = t1[0]
    W1h = jnp.pad(W1[:Ln], ((0, Ln_p - Ln), (0, 0)))
    ops1 = [W1h] + [_as2d(t) for t in t1[1:]]
    opsa = []
    if has_attr:
        W1a = jnp.pad(W1[Ln:Ln + La], ((0, La_p - La), (0, 0)))
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
    in_specs.append(pl.BlockSpec((wn, Lp), lambda b, *_: (b, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(dagg)
    for op in ops1 + opsa + ops2 + opsc:
        in_specs.append(_whole_spec(op.shape))
        operands.append(op)

    grad_shapes = ([o.shape for o in ops1]
                   + ([opsa[0].shape] if has_attr else [])
                   + [o.shape for o in ops2])
    out_shapes = [
        jax.ShapeDtypeStruct((N_p, Ln_p), jnp.float32),   # dh
        jax.ShapeDtypeStruct((E_p, Ln_p), stream_dt),     # dhj
    ]
    out_specs = [
        pl.BlockSpec((wn, Ln_p), lambda b, *_: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    if has_attr:
        out_shapes.append(jax.ShapeDtypeStruct((E_p, La_p), stream_dt))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    for s in grad_shapes:
        out_shapes.append(jax.ShapeDtypeStruct(s, jnp.float32))
        out_specs.append(_whole_spec(s))

    scratch = [
        pltpu.VMEM((2, 1, te), jnp.int32),
        pltpu.VMEM((2, te, Ln_p), stream_dt),
    ]
    if has_attr:
        scratch.append(pltpu.VMEM((2, te, La_p), stream_dt))
    scratch.append(pltpu.VMEM((te, Ln_p), stream_dt))     # wmsg
    if has_attr:
        scratch.append(pltpu.VMEM((te, La_p), stream_dt))
    scratch.append(pltpu.VMEM((te, Ln_p), stream_dt))     # rmw
    if has_attr:
        scratch.append(pltpu.VMEM((te, La_p), stream_dt))
    scratch.append(pltpu.SemaphoreType.DMA((2, 3)))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )
    kernel = _make_bwd_kernel(nb, exact, wn, te, has_attr,
                              n_bands=_onehot_bands(),
                              sent=int(N_p + wn))
    tables_bytes = sum(int(np.prod(o.shape)) * 4
                       for o in ops1 + opsa + ops2 + opsc)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shapes),
        interpret=interpret,
        compiler_params=_vmem_params(
            # resident: node/dagg/dh tiles + tables + their grad blocks
            tables_bytes * 2
            + (wn * Ln_p * 2 + wn * Lp) * 4,
            # scratch streams + fwd-recompute AND bwd intermediates
            2 * te * 4
            + 2 * te * (Ln_p + La_p)
            * jnp.dtype(stream_dt).itemsize
            + (2 * te * (Ln_p + La_p)) * 4
            + _gp_inter_bytes(te, nb, Lp, 8)
            + (2 * 14 * te * Lp + 25 * te * Lp + 2 * wn * te) * 4),
    )(bounds, *operands)
    i = 0
    dh = outs[i]; i += 1
    dhj = outs[i]; i += 1
    dattr = None
    if has_attr:
        dattr = outs[i]; i += 1
    g1 = outs[i:i + 10]; i += 10
    gW1a = None
    if has_attr:
        gW1a = outs[i]; i += 1
    g2 = outs[i:i + 10]
    return dh, dhj, dattr, g1, gW1a, g2


def _fused_mp_bwd(meta, consts, interpret, res, dagg):
    (nb, exact, has_attr, wn, te, Ln, La) = meta
    h, hj, attr, ids_oh, bounds, tables = res
    t1, t2 = tables[:10], tables[10:]

    dh, dhj, dattr, g1, gW1a, g2 = _mp_backward(
        meta, consts, interpret, h, hj, attr, ids_oh, bounds, dagg,
        tables)
    # cotangent dtypes must match the primals (bf16 activation storage in
    # fast mode; dh accumulates f32 in VMEM and is rounded once here —
    # N-row, negligible traffic)
    dh = dh.astype(h.dtype)
    dhj = dhj.astype(hj.dtype)
    if dattr is not None:
        dattr = dattr.astype(attr.dtype)

    # reassemble the full input-linear gradient from its (message, attr)
    # row splits, in the original table shapes
    dW1 = jnp.zeros_like(t1[0])
    dW1 = dW1.at[:Ln].set(g1[0][:Ln])
    if has_attr:
        dW1 = dW1.at[Ln:Ln + La].set(gW1a[:La])
    if dattr is None:
        dattr = jnp.zeros_like(attr)

    def like(g, t):
        return g.reshape(t.shape)

    grads1 = (dW1,) + tuple(like(g, t) for g, t in zip(g1[1:], t1[1:]))
    grads2 = tuple(like(g, t) for g, t in zip(g2, t2))
    return (dh, dhj, dattr, None, None, None) + grads1 + grads2


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
            and algebra.n_blades <= 32
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

    # bf16 activation STORAGE in fast mode: the node window, the
    # pre-gathered source stream, and the edge attrs all live in HBM (and
    # in the VJP residuals) at the stream dtype — halving the dominant
    # E-row traffic.  Values are identical to the r3 behaviour (the kernel
    # already rounded every use of these operands to bf16); only the HBM
    # copies shrink.
    stream_dt = jnp.float32 if exact else jnp.bfloat16
    h_flat = h.reshape(N, Ln).astype(stream_dt)
    h_flat = jnp.pad(h_flat, ((0, N_p - N), (0, Ln_p - Ln)))
    hj_flat = hj.reshape(E, Ln).astype(stream_dt)
    hj_flat = jnp.pad(hj_flat, ((0, E_p - E), (0, Ln_p - Ln)))
    if has_attr:
        attr_flat = edge_attr.reshape(E, La).astype(stream_dt)
        attr_flat = jnp.pad(attr_flat, ((0, E_p - E), (0, La_p - La)))
    else:
        attr_flat = jnp.zeros((E_p, La_p), stream_dt)

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
