"""Fused whole-block CEMLP kernel (Pallas TPU).

The per-edge CEMLP (MVLinear -> MVSiLU -> SGP -> MVLayerNorm, reference
cegnn_utils.py:160-213) is the hot path of simplicial message passing: it
runs once per EDGE of the big graph.  Composed as separate XLA ops on
``(E, C, nb)`` activations it materializes ~20 intermediates per block in
HBM (measured 15.6 ms fwd / 56 ms fwd+bwd per 131k x 32ch block on v5e —
~50x the one-read-one-write roofline).

Design here:
  * activations are FLAT ``(rows, C*nb)`` — the blade axis folded into
    lanes (lane dim a multiple of 128 by zero-padding), so every tensor is
    tiled natively;
  * per-grade / per-blade / Cayley structure is folded into small
    channel-block-diagonal matrices built ONCE per call in XLA from the
    unchanged flax parameter tree (differentiable, so parameter gradients
    flow through the expansion automatically);
  * one Pallas kernel computes the whole block per row-tile: the only HBM
    traffic is the input tile, the output tile, and the (tiny) tables —
    all intermediates live in VMEM;
  * backward is a second Pallas kernel (recompute-in-tile) emitting dx and
    dense table gradients accumulated across the grid.

The geometric product is decomposed over the left blade index i:
    out[(n,j)] = sum_i  z[(n,i)] * (yn @ K_i)[(n,j)]
with ``K_i[(n,k),(n,j)] = (cayley * w)[n,i,j,k]`` and the broadcast
``z[(n,i)] -> all j`` expressed as the structural one-hot ``z @ B_i`` —
both are lane-aligned MXU matmuls.

Supported: any algebra with few blades (Cl(2)/Cl(3): nb <= 8); larger
algebras (hulls' Cl(5), nb=32) keep the unfused XLA path — their table
footprint (nb * L^2) would not fit VMEM.
"""
from __future__ import annotations

import functools
import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-6
SQRT2_INV = 1.0 / math.sqrt(2.0)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def fused_supported(algebra) -> bool:
    """Fused path is used automatically on TPU for small-blade algebras in
    the "fast" (bf16-matmul) aggregation mode.  In "exact" mode the
    composed XLA path is kept: 6-pass HIGHEST dots make the fused kernel
    compute-bound and slower, and exact mode exists for bit-closeness."""
    from .segment import aggregation_exact

    return (jax.default_backend() == "tpu" and algebra.n_blades <= 8
            and not aggregation_exact())


# ===================================================================
# structural tables (numpy, cached per (algebra, channels, pad))
# ===================================================================

@functools.lru_cache(maxsize=None)
def _structural_tables(dim: int, metric: tuple, C: int, Lp: int):
    from ..algebra.clifford import get_algebra

    alg = get_algebra(metric)
    nb = alg.n_blades
    L = C * nb
    g = alg.blade_to_grade                      # (nb,)

    bc = np.zeros(Lp, np.float32)
    bc[:L] = np.tile(alg._b_coeff, C)
    ms = np.zeros(Lp, np.float32)
    ms[0:L:nb] = 1.0                            # scalar-blade lanes
    wm = np.zeros(Lp, np.float32)
    wm[:L] = 1.0 / (C * nb)                     # LN channel-mean weights

    Gs = (g[:, None] == g[None, :]).astype(np.float32)   # (nb, nb)
    G = np.zeros((Lp, Lp), np.float32)
    H = np.zeros((Lp, Lp), np.float32)
    for n in range(C):
        s = n * nb
        G[s:s + nb, s:s + nb] = Gs
        H[s:s + nb, s:s + nb] = 1.0
    # Bcat: (Lp, nb*Lp); column block i holds B_i with
    # B_i[(n,i),(n,j)] = 1  (broadcast lane i of each channel to all j)
    Bcat = np.zeros((Lp, nb * Lp), np.float32)
    for i in range(nb):
        for n in range(C):
            s = n * nb
            Bcat[s + i, i * Lp + s:i * Lp + s + nb] = 1.0
    return bc, ms, wm, G, H, Bcat


# ===================================================================
# parameter-dependent tables (jnp, differentiable)
# ===================================================================

def _expand_mvlinear(alg, weight, Lin_p: int, Lout_p: int,
                     subspaces: bool = True) -> jnp.ndarray:
    """(out, in, S) or (out, in) -> (Lin_p, Lout_p) lane matrix."""
    nb = alg.n_blades
    if subspaces:
        w_full = weight[..., alg.blade_to_grade]       # (out, in, nb)
    else:
        w_full = jnp.broadcast_to(weight[..., None],
                                  weight.shape + (nb,))
    out_f, in_f = w_full.shape[0], w_full.shape[1]
    eye = jnp.eye(nb, dtype=w_full.dtype)
    W = jnp.einsum("nmi,ij->minj", w_full, eye).reshape(
        in_f * nb, out_f * nb)
    return jnp.pad(W, ((0, Lin_p - in_f * nb), (0, Lout_p - out_f * nb)))


def _bias_vec(alg, bias, Lp: int) -> jnp.ndarray:
    """(out, 1) scalar-blade bias -> (Lp,) lane vector."""
    nb = alg.n_blades
    out_f = bias.shape[0]
    v = jnp.zeros((out_f, nb), bias.dtype).at[:, 0].set(bias[:, 0])
    return jnp.pad(v.reshape(-1), (0, Lp - out_f * nb))


def _gate_tables(alg, a, b, C: int, Lp: int):
    """MVSiLU a/b (C, d+1) -> M (Lp, Lp), gb (Lp,).

    gate[(n,i)] = a[n,g(i)] * inv[n,g(i)] + b[n,g(i)] with
    inv[n,gr] = sum_{i' in gr} v[(n,i')]   =>   gate = v @ M + gb."""
    nb = alg.n_blades
    g = alg.blade_to_grade
    Gs = jnp.asarray((g[:, None] == g[None, :]).astype(np.float32))
    a_lane = a[:, g]                                   # (C, nb)
    eye = jnp.eye(C, dtype=a.dtype)
    M = jnp.einsum("ij,nj,nm->nimj", Gs, a_lane, eye).reshape(
        C * nb, C * nb)
    M = jnp.pad(M, ((0, Lp - C * nb), (0, Lp - C * nb)))
    gb = jnp.pad(b[:, g].reshape(-1), (0, Lp - C * nb))
    return M, gb


def _norm_vec(alg, a_norm, C: int, Lp: int) -> jnp.ndarray:
    """NormalizationLayer a (C, S) -> sigmoid(a) expanded (Lp,)."""
    sa = jax.nn.sigmoid(a_norm)[:, alg.blade_to_grade].reshape(-1)
    return jnp.pad(sa, (0, Lp - sa.shape[0]))


def _gp_tables(alg, sgp, C: int, Lp: int) -> jnp.ndarray:
    """Weighted Cayley -> Kcat (Lp, nb*Lp):
    column block i holds K_i[(n,k),(n,j)] = CW[n,i,j,k]."""
    nb = alg.n_blades
    CW = sgp.weighted_cayley()                          # (C, nb, nb, nb)
    CWt = jnp.transpose(CW, (1, 0, 3, 2))               # (i, C, k, j)
    eye = jnp.eye(C, dtype=CW.dtype)
    Kall = jnp.einsum("ickj,cm->ickmj", CWt, eye).reshape(
        nb, C * nb, C * nb)
    Kall = jnp.pad(Kall, ((0, 0), (0, Lp - C * nb), (0, Lp - C * nb)))
    # (Lp, nb*Lp)
    return jnp.transpose(Kall, (1, 0, 2)).reshape(Lp, nb * Lp)


def _ln_vec(a_ln, nb: int, Lp: int) -> jnp.ndarray:
    v = jnp.repeat(a_ln, nb)
    return jnp.pad(v, (0, Lp - v.shape[0]))


def block_tables(cemlp, i: int, Lin_p: int, Lp: int):
    """All lane tables of CEMLP block i from the live flax submodules."""
    alg = cemlp.algebra
    lin = getattr(cemlp, f"linear_{i}")
    silu = getattr(cemlp, f"silu_{i}")
    sgp = getattr(cemlp, f"gp_{i}")
    ln = getattr(cemlp, f"norm_{i}")
    C = silu.channels
    W1 = _expand_mvlinear(alg, lin.weight, Lin_p, Lp, lin.subspaces)
    b1 = _bias_vec(alg, lin.bias, Lp)
    M, gb = _gate_tables(alg, silu.a, silu.b, C, Lp)
    Wr = _expand_mvlinear(alg, sgp.linear_right.weight, Lp, Lp)
    sa = _norm_vec(alg, sgp.normalization.a, C, Lp)
    Kcat = _gp_tables(alg, sgp, C, Lp)
    WL = _expand_mvlinear(alg, sgp.linear_left.weight, Lp, Lp)
    bL = _bias_vec(alg, sgp.linear_left.bias, Lp)
    aln = _ln_vec(ln.a, alg.n_blades, Lp)
    return (W1, b1, M, gb, Wr, sa, Kcat, WL, bL, aln)


# ===================================================================
# flat XLA reference (correctness anchor; also usable as a fallback)
# ===================================================================

def _block_flat_xla(x, tables, const, nb: int):
    W1, b1, M, gb, Wr, sa, Kcat, WL, bL, aln = tables
    bc, ms, wm, G, H, Bcat = (jnp.asarray(c) for c in const)
    rows, Lp = x.shape

    y = x @ W1 + b1
    sq = y * y * bc
    v = jnp.where(ms != 0, y, sq)
    gate = v @ M + gb
    s = jax.nn.sigmoid(gate)
    z = s * y
    yr = z @ Wr
    qg = (yr * yr * bc) @ G
    nr = (qg * qg + 1e-16) ** 0.25
    den = sa * (nr - 1.0) + 1.0 + EPS
    yn = yr / den
    Z8 = (z @ Bcat).reshape(rows, nb, Lp)
    T8 = (yn @ Kcat).reshape(rows, nb, Lp)
    gp = jnp.sum(Z8 * T8, axis=1)
    first = z @ WL + bL
    o = (first + gp) * SQRT2_INV
    qc = (o * o * bc) @ H
    nc = (qc * qc + 1e-16) ** 0.25
    m = jnp.sum(nc * wm, axis=1, keepdims=True) + EPS
    return aln * o / m


# ===================================================================
# Pallas kernels
# ===================================================================

def _dot(a, b, exact: bool):
    prec = (jax.lax.Precision.HIGHEST if exact
            else jax.lax.Precision.DEFAULT)
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=prec)


def _dot_t(a, b, exact: bool):
    """a^T @ b with rows contracted: (R, P), (R, Q) -> (P, Q)."""
    prec = (jax.lax.Precision.HIGHEST if exact
            else jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)


def _dot_nt(a, b, exact: bool):
    """a @ b^T without materializing the transpose:
    (R, Q), (P, Q) -> (R, P)."""
    prec = (jax.lax.Precision.HIGHEST if exact
            else jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)


def _forward_math(x, refs, nb, exact):
    """Shared forward math on VMEM values; returns all intermediates.

    The geometric product loops over the nb left-blade slices with STATIC
    lane slices of the packed Bcat/Kcat tables — no lane-splitting
    reshapes (Mosaic-unfriendly) are needed."""
    y = _dot(x, refs[0], exact) + refs[1]
    return _post_linear_math(y, refs, nb, exact)


def _post_linear_math(y, refs, nb, exact):
    """Block math AFTER the input MVLinear (``y`` already computed).

    Shared with the fused message-passing kernel (ops/fused_egcl.py),
    where the input linear is applied to split (message, edge_attr)
    operands; ``refs[0]``/``refs[1]`` (W1, b1) are unused here."""
    (_W1, _b1, M, gb, Wr, sa, Kcat, WL, bL, aln, bc, ms, wm, G, H,
     Bcat) = refs
    Lp = Wr.shape[0]
    sq = y * y * bc
    v = jnp.where(ms != 0, y, sq)
    gate = _dot(v, M, exact) + gb
    s = jax.nn.sigmoid(gate)
    z = s * y
    yr = _dot(z, Wr, exact)
    qg = _dot(yr * yr * bc, G, exact)
    # smooth-abs-sqrt (q^2+eps)^(1/4) as two hardware sqrts — Mosaic
    # lowers ** to exp/log transcendentals, measurably slower
    s1g = jnp.sqrt(qg * qg + 1e-16)
    nr = jnp.sqrt(s1g)
    den = sa * (nr - 1.0) + 1.0 + EPS
    yn = yr / den
    # single wide matmuls for the broadcast/contraction tables; the per-
    # left-blade pieces are STATIC lane slices of the results
    Z8 = _dot(z, Bcat, exact)                     # (rows, nb*Lp)
    T8 = _dot(yn, Kcat, exact)
    gp = jnp.zeros_like(yr)
    for i in range(nb):
        sl = slice(i * Lp, (i + 1) * Lp)
        gp = gp + Z8[:, sl] * T8[:, sl]
    first = _dot(z, WL, exact) + bL
    o = (first + gp) * SQRT2_INV
    qc = _dot(o * o * bc, H, exact)
    s1c = jnp.sqrt(qc * qc + 1e-16)
    nc = jnp.sqrt(s1c)
    m = jnp.sum(nc * wm, axis=1, keepdims=True) + EPS
    out = aln * o / m
    return dict(y=y, sq=sq, v=v, s=s, z=z, yr=yr, qg=qg, s1g=s1g, nr=nr,
                den=den, yn=yn, Z8=Z8, T8=T8, first=first, o=o, qc=qc,
                s1c=s1c, nc=nc, m=m, out=out)


def _fwd_kernel(x_ref, W1_ref, b1_ref, M_ref, gb_ref, Wr_ref, sa_ref,
                Kcat_ref, WL_ref, bL_ref, aln_ref, bc_ref, ms_ref, wm_ref,
                G_ref, H_ref, Bcat_ref, out_ref, *, nb: int, exact: bool):
    refs = (W1_ref[:], b1_ref[:], M_ref[:], gb_ref[:], Wr_ref[:],
            sa_ref[:], Kcat_ref[:], WL_ref[:], bL_ref[:], aln_ref[:],
            bc_ref[:], ms_ref[:], wm_ref[:], G_ref[:], H_ref[:],
            Bcat_ref[:])
    out_ref[:] = _forward_math(x_ref[:], refs, nb, exact)["out"]


def _post_linear_bwd(dout, f, refs, nb: int, exact: bool):
    """Backward of ``_post_linear_math``: cotangent w.r.t. ``y`` plus the
    per-tile (unaccumulated) table gradients
    ``(dM, dgb, dWr, dsa, dKcat, dWL, dbL, daln)``.

    Shared between the whole-block backward kernel below and the fused
    message-passing backward (ops/fused_egcl.py)."""
    (_W1, _b1, M, gb, Wr, sa, Kcat, WL, bL, aln, bc, ms, wm, G, H,
     Bcat) = refs
    Lp = Wr.shape[0]
    y, v, s, z = f["y"], f["v"], f["s"], f["z"]
    yr, qg, nr, den, yn = f["yr"], f["qg"], f["nr"], f["den"], f["yn"]
    Z8, T8, o, qc, m = f["Z8"], f["T8"], f["o"], f["qc"], f["m"]
    s1g, s1c, nc = f["s1g"], f["s1c"], f["nc"]

    # ---- MVLayerNorm backward: out = aln * o / m
    daln = jnp.sum(dout * o / m, axis=0, keepdims=True)
    dm = -jnp.sum(dout * aln * o, axis=1, keepdims=True) / (m * m)
    do = aln * dout / m
    dnc = dm * wm
    # d/dq (q^2+eps)^(1/4) = 0.5 q / ((q^2+eps)^(3/4)) = 0.5 q / (s1*nc)
    dqc = dnc * 0.5 * qc / (s1c * nc)
    do = do + _dot(dqc, H, exact) * 2.0 * bc * o          # H symmetric

    dfg = do * SQRT2_INV                       # d(first) = d(gp)
    # ---- first-order branch
    dz = _dot_nt(dfg, WL, exact)
    dWL = _dot_t(z, dfg, exact)
    dbL = jnp.sum(dfg, axis=0, keepdims=True)
    # ---- geometric product branch (wide matmuls over packed tables)
    dZ8 = jnp.concatenate(
        [dfg * T8[:, i * Lp:(i + 1) * Lp] for i in range(nb)], axis=1)
    dT8 = jnp.concatenate(
        [dfg * Z8[:, i * Lp:(i + 1) * Lp] for i in range(nb)], axis=1)
    dz = dz + _dot_nt(dZ8, Bcat, exact)
    dyn = _dot_nt(dT8, Kcat, exact)
    dKcat = _dot_t(yn, dT8, exact)
    # ---- normalization backward: yn = yr / den
    dyr = dyn / den
    dden = -dyn * yn / den
    dsa = jnp.sum(dden * (nr - 1.0), axis=0, keepdims=True)
    dnr = dden * sa
    dqg = dnr * 0.5 * qg / (s1g * nr)
    dyr = dyr + _dot(dqg, G, exact) * 2.0 * bc * yr       # G symmetric
    # ---- right linear
    dz = dz + _dot_nt(dyr, Wr, exact)
    dWr = _dot_t(z, dyr, exact)
    # ---- MVSiLU backward: z = sigmoid(v @ M + gb) * y
    dy = dz * s
    dgate = dz * y * s * (1.0 - s)
    dgb = jnp.sum(dgate, axis=0, keepdims=True)
    dv = _dot_nt(dgate, M, exact)
    dM = _dot_t(v, dgate, exact)
    dy = dy + jnp.where(ms != 0, dv, 2.0 * bc * y * dv)
    return dy, (dM, dgb, dWr, dsa, dKcat, dWL, dbL, daln)


def _bwd_kernel(x_ref, dout_ref, W1_ref, b1_ref, M_ref, gb_ref, Wr_ref,
                sa_ref, Kcat_ref, WL_ref, bL_ref, aln_ref, bc_ref, ms_ref,
                wm_ref, G_ref, H_ref, Bcat_ref,
                dx_ref, dW1_ref, db1_ref, dM_ref, dgb_ref, dWr_ref,
                dsa_ref, dKcat_ref, dWL_ref, dbL_ref, daln_ref,
                *, nb: int, exact: bool):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dW1_ref[:] = jnp.zeros_like(dW1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dM_ref[:] = jnp.zeros_like(dM_ref)
        dgb_ref[:] = jnp.zeros_like(dgb_ref)
        dWr_ref[:] = jnp.zeros_like(dWr_ref)
        dsa_ref[:] = jnp.zeros_like(dsa_ref)
        dKcat_ref[:] = jnp.zeros_like(dKcat_ref)
        dWL_ref[:] = jnp.zeros_like(dWL_ref)
        dbL_ref[:] = jnp.zeros_like(dbL_ref)
        daln_ref[:] = jnp.zeros_like(daln_ref)

    x = x_ref[:]
    dout = dout_ref[:]
    refs = (W1_ref[:], b1_ref[:], M_ref[:], gb_ref[:], Wr_ref[:],
            sa_ref[:], Kcat_ref[:], WL_ref[:], bL_ref[:], aln_ref[:],
            bc_ref[:], ms_ref[:], wm_ref[:], G_ref[:], H_ref[:],
            Bcat_ref[:])
    f = _forward_math(x, refs, nb, exact)
    dy, (dM, dgb, dWr, dsa, dKcat, dWL, dbL, daln) = _post_linear_bwd(
        dout, f, refs, nb, exact)
    dM_ref[:] += dM
    dgb_ref[:] += dgb
    dWr_ref[:] += dWr
    dsa_ref[:] += dsa
    dKcat_ref[:] += dKcat
    dWL_ref[:] += dWL
    dbL_ref[:] += dbL
    daln_ref[:] += daln
    # ---- input linear
    dx_ref[:] = _dot_nt(dy, W1_ref[:], exact)
    dW1_ref[:] += _dot_t(x, dy, exact)
    db1_ref[:] += jnp.sum(dy, axis=0, keepdims=True)


# ===================================================================
# custom-VJP wrapper
# ===================================================================

def _param_specs(Lin_p, Lp, nb):
    """BlockSpecs for the table operands (whole array, every grid step)."""
    shapes = [
        (Lin_p, Lp),        # W1
        (1, Lp),            # b1
        (Lp, Lp),           # M
        (1, Lp),            # gb
        (Lp, Lp),           # Wr
        (1, Lp),            # sa
        (Lp, nb * Lp),      # Kcat
        (Lp, Lp),           # WL
        (1, Lp),            # bL
        (1, Lp),            # aln
        (1, Lp),            # bc
        (1, Lp),            # ms
        (1, Lp),            # wm
        (Lp, Lp),           # G
        (Lp, Lp),           # H
        (Lp, nb * Lp),      # Bcat
    ]
    # NOTE: bind ndim via default arg — a bare closure over the loop
    # variable would late-bind to the last shape
    return [pl.BlockSpec(s, (lambda t, n=len(s): (0,) * n),
                         memory_space=pltpu.VMEM) for s in shapes]


def _tile_rows(Lp: int, bwd: bool = False) -> int:
    # VMEM budget: the (TE, nb*Lp) wide products dominate (2 live in fwd,
    # 4 in bwd) next to the nb*Lp^2 tables and ~12 (TE, Lp) buffers
    if bwd:
        return 128 if Lp <= 256 else 64
    return 256 if Lp <= 256 else 128


def _vmem_params(operands_bytes: int, intermediates_bytes: int):
    """CompilerParams with a vmem limit derived from the ACTUAL resident
    footprint instead of a hard-coded constant (advisor r2): pipeline
    operands are double-buffered by the pallas pipeline (x2), kernel
    intermediates are not.  Clamped to the v5e envelope (128 MiB/core)."""
    limit = 2 * operands_bytes + intermediates_bytes + (8 << 20)
    limit = max(32 << 20, min(120 << 20, int(limit)))
    return pltpu.CompilerParams(vmem_limit_bytes=limit)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fused_block(meta, const, interpret, x, *tables):
    return _fused_block_fwd(meta, const, interpret, x, *tables)[0]


def _pallas_fwd(meta, const, interpret, x, tables):
    nb, exact = meta
    rows, Lin_p = x.shape
    Lp = tables[4].shape[1]   # Wr (Lp, Lp)
    TE = _tile_rows(Lp)
    rows_p = _round_up(max(rows, TE), TE)
    if rows_p != rows:
        x = jnp.pad(x, ((0, rows_p - rows), (0, 0)))
    n_tiles = rows_p // TE

    consts = [jnp.asarray(c) for c in const]
    ops = [t.reshape(1, -1) if t.ndim == 1 else t for t in tables]
    ops += [c.reshape(1, -1) if c.ndim == 1 else c for c in consts]

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((TE, Lin_p), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)]
        + _param_specs(Lin_p, Lp, nb),
        out_specs=pl.BlockSpec((TE, Lp), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
    )
    ops_bytes = sum(o.size * 4 for o in ops) + (TE * Lin_p + TE * Lp) * 4
    inter_bytes = (2 * TE * nb * Lp + 14 * TE * Lp) * 4
    out = pl.pallas_call(
        partial(_fwd_kernel, nb=nb, exact=exact),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows_p, Lp), jnp.float32),
        interpret=interpret,
        compiler_params=_vmem_params(ops_bytes, inter_bytes),
    )(x, *ops)
    return out[:rows]


def _fused_block_fwd(meta, const, interpret, x, *tables):
    out = _pallas_fwd(meta, const, interpret, x, tables)
    return out, (x, tables)


def _fused_block_bwd(meta, const, interpret, res, dout):
    nb, exact = meta
    x, tables = res
    rows, Lin_p = x.shape
    Lp = tables[4].shape[1]
    TE = _tile_rows(Lp, bwd=True)
    rows_p = _round_up(max(rows, TE), TE)
    if rows_p != rows:
        x = jnp.pad(x, ((0, rows_p - rows), (0, 0)))
        dout = jnp.pad(dout, ((0, rows_p - rows), (0, 0)))
    n_tiles = rows_p // TE

    consts = [jnp.asarray(c) for c in const]
    ops = [t.reshape(1, -1) if t.ndim == 1 else t for t in tables]
    ops += [c.reshape(1, -1) if c.ndim == 1 else c for c in consts]

    out_shapes = [
        jax.ShapeDtypeStruct((rows_p, Lin_p), jnp.float32),   # dx
        jax.ShapeDtypeStruct((Lin_p, Lp), jnp.float32),       # dW1
        jax.ShapeDtypeStruct((1, Lp), jnp.float32),           # db1
        jax.ShapeDtypeStruct((Lp, Lp), jnp.float32),          # dM
        jax.ShapeDtypeStruct((1, Lp), jnp.float32),           # dgb
        jax.ShapeDtypeStruct((Lp, Lp), jnp.float32),          # dWr
        jax.ShapeDtypeStruct((1, Lp), jnp.float32),           # dsa
        jax.ShapeDtypeStruct((Lp, nb * Lp), jnp.float32),     # dKcat
        jax.ShapeDtypeStruct((Lp, Lp), jnp.float32),          # dWL
        jax.ShapeDtypeStruct((1, Lp), jnp.float32),           # dbL
        jax.ShapeDtypeStruct((1, Lp), jnp.float32),           # daln
    ]
    # dx is tiled; the table grads revisit the same (whole-array) block
    # every grid step and accumulate (zeroed at t == 0)
    out_specs = [pl.BlockSpec((TE, Lin_p), lambda t: (t, 0),
                              memory_space=pltpu.VMEM)]
    for s in out_shapes[1:]:
        out_specs.append(pl.BlockSpec(
            s.shape, (lambda t, n=len(s.shape): (0,) * n),
            memory_space=pltpu.VMEM))

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TE, Lin_p), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TE, Lp), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ] + _param_specs(Lin_p, Lp, nb),
        out_specs=tuple(out_specs),
    )
    ops_bytes = (sum(o.size * 4 for o in ops)
                 + sum(int(np.prod(s.shape)) * 4 for s in out_shapes)
                 + (2 * TE * Lin_p + TE * Lp) * 4)
    inter_bytes = (4 * TE * nb * Lp + 25 * TE * Lp) * 4
    outs = pl.pallas_call(
        partial(_bwd_kernel, nb=nb, exact=exact),
        grid_spec=grid_spec,
        out_shape=tuple(out_shapes),
        interpret=interpret,
        compiler_params=_vmem_params(ops_bytes, inter_bytes),
    )(x, dout, *ops)
    dx = outs[0][:rows]
    dW1, db1, dM, dgb, dWr, dsa, dKcat, dWL, dbL, daln = outs[1:]

    def like(g, t):
        return g.reshape(t.shape)

    tgrads = (dW1, like(db1, tables[1]), dM, like(dgb, tables[3]), dWr,
              like(dsa, tables[5]), dKcat, dWL, like(dbL, tables[8]),
              like(daln, tables[9]))
    return (dx,) + tgrads


_fused_block.defvjp(_fused_block_fwd, _fused_block_bwd)


# ===================================================================
# public entry points
# ===================================================================

def fused_block_apply(alg, tables, const, x_flat, *, exact=False,
                      interpret=False):
    """One CEMLP block on flat (rows, Lin_p) activations."""
    meta = (alg.n_blades, bool(exact))
    return _fused_block(meta, const, bool(interpret), x_flat, *tables)


def apply_fused_cemlp(cemlp, x: jnp.ndarray,
                      interpret: Optional[bool] = None) -> jnp.ndarray:
    """Drop-in replacement for the sequential CEMLP stack: reads the SAME
    flax parameter tree and runs the fused whole-block kernel per layer.

    x: (..., C_in, nb) -> (..., C_out, nb)."""
    from .segment import aggregation_exact

    alg = cemlp.algebra
    nb = alg.n_blades
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    exact = aggregation_exact()

    lead = x.shape[:-2]
    rows = int(np.prod(lead)) if lead else 1
    widths = ([cemlp.in_features]
              + [cemlp.hidden_features] * (cemlp.n_layers - 1)
              + [cemlp.out_features])
    Lin = widths[0] * nb
    Lin_p = _round_up(Lin, 128)
    h = x.reshape(rows, Lin)
    h = jnp.pad(h, ((0, 0), (0, Lin_p - Lin))).astype(jnp.float32)

    cur_p = Lin_p
    for i in range(cemlp.n_layers):
        C = widths[i + 1]
        Lp = _round_up(C * nb, 128)
        const = _structural_tables(alg.dim, tuple(alg.metric.tolist()), C,
                                   Lp)
        tables = block_tables(cemlp, i, cur_p, Lp)
        h = fused_block_apply(alg, tables, const, h, exact=exact,
                              interpret=interpret)
        cur_p = Lp

    Lout = widths[-1] * nb
    out = h[:, :Lout].reshape(*lead, widths[-1], nb)
    return out.astype(x.dtype)
