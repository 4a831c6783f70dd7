"""Pallas TPU kernel: sorted segment sum (the SpMM core of simplicial
message passing — SURVEY.md C20, §7.3 "segment-reduce performance").

Design (segment-major, no scatter):
  * grid over OUTPUT row blocks of Wn segments; block b owns output rows
    [b*Wn, (b+1)*Wn);
  * because edges are sorted by target, the edges contributing to block b
    form one contiguous range [bounds[b], bounds[b+1]) — computed with a
    vectorized searchsorted outside the kernel and passed via scalar
    prefetch;
  * the kernel streams that range from HBM in TE-row chunks (manual async
    DMA), builds a transposed one-hot membership matrix (Wn, TE) on the VPU
    (segment ids are kept lane-major, shape (1, E), so the compare is a
    pure lane broadcast) and accumulates ``onehot @ chunk`` into the VMEM
    output block on the MXU;
  * every edge row is read exactly once; output written exactly once —
    speed-of-light = one pass over (E, D) + (N, D).

The backward pass of a segment sum is a pure row gather; installed as
custom_vjp so autodiff never sees a scatter.
"""
from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(bounds_ref, seg_ref, data_ref, out_ref, seg_scratch,
            data_scratch, sems, *, wn: int, te: int, exact: bool):
    b = pl.program_id(0)
    start = bounds_ref[b]
    end = bounds_ref[b + 1]
    base = b * wn

    out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

    # Chunk starts are aligned down to TE: DMA dynamic offsets must be
    # tile-aligned on this hardware (verified empirically; unaligned
    # prefetch-derived offsets fail Mosaic compilation).  Overlap rows
    # belonging to neighbouring blocks are naturally dropped by the
    # id-window match (their ids fall outside [base, base+wn)).
    aligned_start = (start // te) * te
    n_chunks = pl.cdiv(end - aligned_start, te)

    def start_dma(c, slot):
        off = pl.multiple_of(aligned_start + c * te, te)
        seg_dma = pltpu.make_async_copy(
            seg_ref.at[:, pl.ds(off, te)], seg_scratch.at[slot],
            sems.at[slot, 0])
        data_dma = pltpu.make_async_copy(
            data_ref.at[pl.ds(off, te), :], data_scratch.at[slot],
            sems.at[slot, 1])
        seg_dma.start()
        data_dma.start()
        return seg_dma, data_dma

    @pl.when(n_chunks > 0)
    def _():
        start_dma(0, 0)

    def body(c, _):
        slot = jax.lax.rem(c, 2)
        next_slot = jax.lax.rem(c + 1, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            start_dma(c + 1, next_slot)

        # wait current slot (re-created descriptors wait on the same sems)
        off = pl.multiple_of(aligned_start + c * te, te)
        pltpu.make_async_copy(seg_ref.at[:, pl.ds(off, te)],
                              seg_scratch.at[slot],
                              sems.at[slot, 0]).wait()
        pltpu.make_async_copy(data_ref.at[pl.ds(off, te), :],
                              data_scratch.at[slot],
                              sems.at[slot, 1]).wait()

        ids = seg_scratch[slot]                       # (1, TE) int32
        rows = jax.lax.broadcasted_iota(jnp.int32, (wn, te), 0)
        compute_dtype = jnp.float32 if exact else jnp.bfloat16
        onehot = jnp.where(ids - base == rows,
                           1.0, 0.0).astype(compute_dtype)
        # exact: 6-pass f32 MXU matmul (bit-accurate sums);
        # fast: one bf16 MXU pass with f32 accumulation (~1e-3 relative
        # input rounding — the training default, like bf16 activations)
        precision = (jax.lax.Precision.HIGHEST if exact
                     else jax.lax.Precision.DEFAULT)
        out_ref[:] += jnp.dot(onehot, data_scratch[slot],
                              preferred_element_type=jnp.float32,
                              precision=precision)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def sorted_segment_sum_pallas(data: jnp.ndarray, segment_ids: jnp.ndarray,
                              num_segments: int, wn: int = 128,
                              te: int = 1024,
                              exact: bool = True) -> jnp.ndarray:
    """data: (E, D) float; segment_ids: (E,) int32 sorted ascending.
    Returns (num_segments, D).  exact=False uses the bf16 fast path."""
    return _forward(data, segment_ids, num_segments, wn, te, exact)


def _forward(data, segment_ids, num_segments, wn, te, exact=True):
    e, d_orig = data.shape
    orig_dtype = data.dtype
    data = data.astype(jnp.float32 if exact else jnp.bfloat16)
    # lane dim must be a multiple of 128 for the HBM chunk DMAs
    d = pl.cdiv(d_orig, 128) * 128
    if d != d_orig:
        data = jnp.pad(data, ((0, 0), (0, d - d_orig)))
    n_blocks = pl.cdiv(num_segments, wn)
    n_pad = n_blocks * wn
    # block edge boundaries: edges are sorted by segment
    edges_of_block = jnp.searchsorted(
        segment_ids,
        jnp.arange(n_blocks + 1, dtype=segment_ids.dtype) * wn,
        side="left").astype(jnp.int32)
    # pad the streams so chunk DMAs never run out of bounds; padded ids
    # point past the last segment and never match a block row.  When the
    # row count is already TE-aligned every chunk DMA is in-bounds and the
    # (full-array-copy) pads are skipped.
    if e % te == 0:
        data_p = data
        seg_p = segment_ids.astype(jnp.int32).reshape(1, -1)
    else:
        data_p = jnp.pad(data, ((0, te), (0, 0)))
        seg_p = jnp.pad(segment_ids.astype(jnp.int32), (0, te),
                        constant_values=n_pad + wn).reshape(1, -1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # seg (1, E+TE) in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # data (E+TE, D) in HBM
        ],
        out_specs=pl.BlockSpec((wn, d), lambda b, *_: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 1, te), jnp.int32),     # double-buffered ids
            pltpu.VMEM((2, te, d),
                       jnp.float32 if exact else jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, wn=wn, te=te, exact=exact),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
    )(edges_of_block, seg_p, data_p)
    return out[:num_segments, :d_orig].astype(orig_dtype)


def _fwd(data, segment_ids, num_segments, wn, te, exact):
    return (_forward(data, segment_ids, num_segments, wn, te, exact),
            segment_ids)


def _bwd(num_segments, wn, te, exact, segment_ids, g):
    return (jnp.take(g, segment_ids, axis=0), None)


sorted_segment_sum_pallas.defvjp(_fwd, _bwd)
