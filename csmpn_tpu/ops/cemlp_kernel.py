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

Geometric-product forms:
  * nb <= 8 (Cl(2)/Cl(3)): dense packed Kcat/Bcat lane tables — two wide
    MXU matmuls per block;
  * 8 < nb <= 32 (Cl(4)/Cl(5), the hulls flagship): PAIR FORM — a basis
    blade product has exactly one output blade (e_A e_B = s e_{A^B}), so
    the weighted Cayley collapses to a per-(channel, blade-pair) weight
    lane vector Wp plus three SHARED structural tables (Rz/Ry pair
    expanders and the signed block-diagonal S4), processed per 128-lane
    channel group.  Table footprint ~6 MB vs the ~100 MB a dense Kcat
    would need at Cl(5) hidden 28 (VERDICT r2 next-step #4).
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
    """Fused path is used automatically on TPU in the "fast" (bf16-matmul)
    aggregation mode.  In "exact" mode the composed XLA path is kept:
    6-pass HIGHEST dots make the fused kernel compute-bound and slower,
    and exact mode exists for bit-closeness.

    Small-blade algebras (Cl(2)/Cl(3), nb <= 8) use the dense packed
    Kcat/Bcat geometric product; larger ones up to nb = 32 (hulls'
    Cl(5,0) — reference hulls_cssmpnn.py:28) use the pair-form tables
    (one output blade per basis-blade pair), whose footprint is ~100 KB
    of weights + ~6 MB of shared structural tables instead of the
    ~100 MB a dense Kcat would need (VERDICT r2 #4)."""
    from .segment import aggregation_exact

    return (jax.default_backend() == "tpu" and algebra.n_blades <= 32
            and not aggregation_exact())


def _pair_form(nb: int) -> bool:
    """nb > 8: geometric product via shared signed pair tables."""
    return nb > 8


def _n_consts(nb: int) -> int:
    """Structural-table count: (bc, ms, wm, G, H, Bcat) for the dense
    form; (bc, ms, wm, G, H, S4, Rz, Ry) for the pair form."""
    return 8 if _pair_form(nb) else 6


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

    if _pair_form(nb):
        # Pair form (nb > 8; Cl(4)/Cl(5)): the product of two basis
        # blades has exactly ONE output blade (e_A e_B = s * e_{A^B}),
        # so the geometric product is
        #   gp[c, j] = sum_{(i,k)} S0[(i,k), j] * Wp[c, (i,k)]
        #              * z[c, i] * yn[c, k]
        # with SHARED structural tables (channel-independent):
        #   Rz (gs*nb, gs*nb^2): expands z to pair lanes (c,i,k) <- (c,i)
        #   Ry (gs*nb, gs*nb^2): expands yn to pair lanes (c,i,k) <- (c,k)
        #   S4 (gs*nb^2, gs*nb): block-diag signed pair table
        # where gs = 128 // nb channels per 128-lane group.  Total table
        # footprint ~ 3 * 128 * gs*nb^2 * 4 B, vs nb * Lp^2 for a dense
        # Kcat (~100 MB at Cl(5) hidden 28 — would not fit VMEM).
        gs = 128 // nb
        cay = np.asarray(alg.cayley, np.float32)         # (nb, nb, nb)
        j_of = np.abs(cay).argmax(axis=1)                # [i, k] -> j
        s_of = np.take_along_axis(
            cay, j_of[:, None, :], axis=1)[:, 0, :]      # [i, k] sign
        S0 = np.zeros((nb * nb, nb), np.float32)
        ii, kk = np.meshgrid(np.arange(nb), np.arange(nb), indexing="ij")
        S0[ii.ravel() * nb + kk.ravel(), j_of.ravel()] = s_of.ravel()
        P = gs * nb * nb
        S4 = np.zeros((P, gs * nb), np.float32)
        Rz = np.zeros((gs * nb, P), np.float32)
        Ry = np.zeros((gs * nb, P), np.float32)
        for c in range(gs):
            S4[c * nb * nb:(c + 1) * nb * nb, c * nb:(c + 1) * nb] = S0
            for i in range(nb):
                Rz[c * nb + i, c * nb * nb + i * nb:
                   c * nb * nb + (i + 1) * nb] = 1.0
            # Ry[(c,k), (c,i,k)] = 1 for all i
            for k in range(nb):
                Ry[c * nb + k,
                   c * nb * nb + k:(c + 1) * nb * nb:nb] = 1.0
        return bc, ms, wm, G, H, S4, Rz, Ry

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
    """Parameter-dependent geometric-product table.

    Dense form (nb <= 8): weighted Cayley -> Kcat (Lp, nb*Lp); column
    block i holds K_i[(n,k),(n,j)] = CW[n,i,j,k].

    Pair form (nb > 8): the grade-path weight per (channel, blade pair)
    -> Wp (1, (Lp/128) * gs * nb^2) laid out (group, channel-in-group,
    i, k); the Cayley sign lives in the shared S4 table."""
    nb = alg.n_blades
    if _pair_form(nb):
        g = np.asarray(alg.blade_to_grade)
        cay = np.asarray(alg.cayley)
        j_of = np.abs(cay).argmax(axis=1)               # (nb, nb) [i,k]->j
        paths = alg.geometric_product_paths             # (d+1,)*3 bool
        idx = np.argwhere(paths)
        cube = jnp.zeros((C, alg.dim + 1, alg.dim + 1, alg.dim + 1),
                         dtype=sgp.weight.dtype)
        cube = cube.at[:, idx[:, 0], idx[:, 1], idx[:, 2]].set(sgp.weight)
        ii, kk = np.meshgrid(np.arange(nb), np.arange(nb), indexing="ij")
        Wp = cube[:, g[ii], g[j_of], g[kk]]             # (C, nb, nb)
        n_groups = Lp // 128
        gs = 128 // nb
        Wp = Wp.reshape(C, nb * nb)
        Wp = jnp.pad(Wp, ((0, n_groups * gs - C), (0, 0)))
        return Wp.reshape(1, n_groups * gs * nb * nb)
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

def _cast_pair(a, b, exact: bool):
    """Fast mode feeds the MXU ONE bf16 pass (f32 accumulate).  f32
    operands at Precision.DEFAULT run at the f32 MXU rate inside Mosaic
    (~4x slower) — measured in RESULTS.md r2: the fused kernel sat at
    ~100% of the f32-equivalent rate.  The bf16 input rounding is the
    same error class as the fast-mode stream rounding."""
    if exact:
        return a, b
    return a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)


def _dot(a, b, exact: bool):
    prec = (jax.lax.Precision.HIGHEST if exact
            else jax.lax.Precision.DEFAULT)
    a, b = _cast_pair(a, b, exact)
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=prec)


def _dot_t(a, b, exact: bool):
    """a^T @ b with rows contracted: (R, P), (R, Q) -> (P, Q)."""
    prec = (jax.lax.Precision.HIGHEST if exact
            else jax.lax.Precision.DEFAULT)
    a, b = _cast_pair(a, b, exact)
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)


def _dot_nt(a, b, exact: bool):
    """a @ b^T without materializing the transpose:
    (R, Q), (P, Q) -> (R, P)."""
    prec = (jax.lax.Precision.HIGHEST if exact
            else jax.lax.Precision.DEFAULT)
    a, b = _cast_pair(a, b, exact)
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


def _gp_pair_fwd(z, yn, Wp, S4, Rz, Ry, exact):
    """Pair-form geometric product over 128-lane channel groups:
    gp_g = ((z_g @ Rz) * (yn_g @ Ry) * Wp_g) @ S4."""
    Lp = z.shape[1]
    P = S4.shape[0]
    parts = []
    for gi in range(Lp // 128):
        zg = z[:, gi * 128:(gi + 1) * 128]
        yg = yn[:, gi * 128:(gi + 1) * 128]
        Zp = _dot(zg, Rz, exact)
        Yp = _dot(yg, Ry, exact)
        Pw = Zp * Yp * Wp[:, gi * P:(gi + 1) * P]
        parts.append(_dot(Pw, S4, exact))
    return jnp.concatenate(parts, axis=1)


def _post_linear_math(y, refs, nb, exact):
    """Block math AFTER the input MVLinear (``y`` already computed).

    Shared with the fused message-passing kernels (ops/fused_egcl.py),
    where the input linear is applied to split (message, edge_attr)
    operands; ``refs[0]``/``refs[1]`` (W1, b1) are unused here.

    Geometric product: dense packed Kcat/Bcat matmuls for nb <= 8; the
    shared pair-form tables for larger algebras (refs carries
    (..., Wp, ..., S4, Rz, Ry) in the Kcat/Bcat/extra slots then)."""
    (_W1, _b1, M, gb, Wr, sa, Kcat, WL, bL, aln, bc, ms, wm, G,
     H) = refs[:15]
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
    Z8 = T8 = None
    if _pair_form(nb):
        S4, Rz, Ry = refs[15], refs[16], refs[17]
        gp = _gp_pair_fwd(z, yn, Kcat, S4, Rz, Ry, exact)
    else:
        Bcat = refs[15]
        # single wide matmuls for the broadcast/contraction tables; the
        # per-left-blade pieces are STATIC lane slices of the results
        Z8 = _dot(z, Bcat, exact)                 # (rows, nb*Lp)
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


def _fwd_kernel(*args, nb: int, exact: bool):
    n_refs = 10 + _n_consts(nb)
    x_ref = args[0]
    refs = tuple(r[:] for r in args[1:1 + n_refs])
    out_ref = args[1 + n_refs]
    out_ref[:] = _forward_math(x_ref[:], refs, nb, exact)["out"]


def _post_linear_bwd(dout, f, refs, nb: int, exact: bool):
    """Backward of ``_post_linear_math``: cotangent w.r.t. ``y`` plus the
    per-tile (unaccumulated) table gradients
    ``(dM, dgb, dWr, dsa, dKcat, dWL, dbL, daln)``.

    Shared between the whole-block backward kernel below and the fused
    message-passing backward (ops/fused_egcl.py)."""
    (_W1, _b1, M, gb, Wr, sa, Kcat, WL, bL, aln, bc, ms, wm, G,
     H) = refs[:15]
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
    if _pair_form(nb):
        # ---- pair-form GP backward (recomputes the pair expansions —
        # they are cheap shared-table matmuls, so nothing pair-specific
        # is carried in the residual dict)
        S4, Rz, Ry = refs[15], refs[16], refs[17]
        Wp = Kcat
        P = S4.shape[0]
        dz_parts, dyn_parts, dWp_parts = [], [], []
        for gi in range(Lp // 128):
            sl = slice(gi * 128, (gi + 1) * 128)
            zg, yg = z[:, sl], yn[:, sl]
            Zp = _dot(zg, Rz, exact)
            Yp = _dot(yg, Ry, exact)
            Wpg = Wp[:, gi * P:(gi + 1) * P]
            dPw = _dot_nt(dfg[:, sl], S4, exact)
            dWp_parts.append(jnp.sum(Zp * Yp * dPw, axis=0,
                                     keepdims=True))
            dz_parts.append(_dot_nt(dPw * Yp * Wpg, Rz, exact))
            dyn_parts.append(_dot_nt(dPw * Zp * Wpg, Ry, exact))
        dz = dz + jnp.concatenate(dz_parts, axis=1)
        dyn = jnp.concatenate(dyn_parts, axis=1)
        dKcat = jnp.concatenate(dWp_parts, axis=1)      # dWp, Wp-shaped
    else:
        # ---- geometric product branch (wide matmuls, packed tables)
        Bcat = refs[15]
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


def _bwd_kernel(*args, nb: int, exact: bool):
    n_refs = 10 + _n_consts(nb)
    x_ref, dout_ref = args[0], args[1]
    refs = tuple(r[:] for r in args[2:2 + n_refs])
    dx_ref = args[2 + n_refs]
    grefs = args[3 + n_refs:3 + n_refs + 10]
    # grefs order: dW1, db1, dM, dgb, dWr, dsa, dKcat, dWL, dbL, daln
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        for r in grefs:
            r[:] = jnp.zeros_like(r)

    x = x_ref[:]
    dout = dout_ref[:]
    f = _forward_math(x, refs, nb, exact)
    dy, tg = _post_linear_bwd(dout, f, refs, nb, exact)
    for r, v in zip(grefs[2:], tg):
        r[:] += v
    # ---- input linear
    dx_ref[:] = _dot_nt(dy, refs[0], exact)
    grefs[0][:] += _dot_t(x, dy, exact)
    grefs[1][:] += jnp.sum(dy, axis=0, keepdims=True)


# ===================================================================
# custom-VJP wrapper
# ===================================================================

def _param_specs(ops):
    """BlockSpecs for the table operands (whole array, every grid step).
    Derived from the actual operand shapes — the dense and pair GP forms
    carry different table sets."""
    # NOTE: bind ndim via default arg — a bare closure over the loop
    # variable would late-bind to the last shape
    return [pl.BlockSpec(o.shape, (lambda t, n=len(o.shape): (0,) * n),
                         memory_space=pltpu.VMEM) for o in ops]


def _gp_inter_bytes(TE: int, nb: int, Lp: int, mult: int) -> int:
    """VMEM estimate of the live GP intermediates: (TE, nb*Lp) wide
    products for the dense form; per-group (TE, 128*nb) pair expansions
    (a few live at once) for the pair form."""
    if _pair_form(nb):
        return mult * 2 * TE * 128 * nb * 4
    return mult * TE * nb * Lp * 4


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
        + _param_specs(ops),
        out_specs=pl.BlockSpec((TE, Lp), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
    )
    ops_bytes = sum(o.size * 4 for o in ops) + (TE * Lin_p + TE * Lp) * 4
    inter_bytes = _gp_inter_bytes(TE, nb, Lp, 2) + 14 * TE * Lp * 4
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

    # grads take the (2-D-ified) shapes of the 10 parameter tables —
    # shared between the dense (Kcat) and pair (Wp) GP forms
    out_shapes = [jax.ShapeDtypeStruct((rows_p, Lin_p), jnp.float32)]
    out_shapes += [jax.ShapeDtypeStruct(o.shape, jnp.float32)
                   for o in ops[:10]]
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
        ] + _param_specs(ops),
        out_specs=tuple(out_specs),
    )
    ops_bytes = (sum(o.size * 4 for o in ops)
                 + sum(int(np.prod(s.shape)) * 4 for s in out_shapes)
                 + (2 * TE * Lin_p + TE * Lp) * 4)
    inter_bytes = _gp_inter_bytes(TE, nb, Lp, 4) + 25 * TE * Lp * 4
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
