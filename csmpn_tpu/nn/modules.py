"""Clifford-equivariant neural layers (flax.linen), TPU-first.

Functional re-design of the reference layer zoo
(`csmpn/models/cegnn_utils.py`): MVLinear (:287), MVSiLU (:53),
NormalizationLayer (:34), MVLayerNorm (:86), SteerableGeometricProductLayer
(:98), CEMLP (:160).  Multivector activations are laid out as
``(..., channels, n_blades)`` with the blade axis last.

TPU notes:
  * per-grade parameters are expanded to blade resolution with a static
    gather (``algebra.expand_per_grade``) instead of repeat_interleave —
    XLA folds the gather into the consumer;
  * all per-grade invariants (norms / mag2) are computed with one masked
    matmul over the blade axis (``algebra.norms_cat``) rather than dim+1
    slice-reductions;
  * the layers are written setup-style so the fused whole-CEMLP Pallas
    kernel (ops/cemlp_kernel.py) can read the SAME parameter tree and
    replace the composed XLA ops on the per-edge hot path.
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..algebra.clifford import CliffordAlgebra

EPS = 1e-6  # reference cegnn_utils.py:5


def normal_init(std: float):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)
    return init


class MVLinear(nn.Module):
    """Channel-mixing linear map on multivectors (reference MVLinear :287-339).

    With ``subspaces=True`` a separate weight is learned per grade and shared
    across the blades of that grade; with ``subspaces=False`` it is a plain
    channel matmul applied identically to every blade.
    """

    algebra: CliffordAlgebra
    in_features: int
    out_features: int
    subspaces: bool = True
    use_bias: bool = True

    def setup(self):
        init = normal_init(1.0 / math.sqrt(self.in_features))
        if self.subspaces:
            self.weight = self.param(
                "weight", init,
                (self.out_features, self.in_features,
                 self.algebra.n_subspaces))
        else:
            self.weight = self.param(
                "weight", init, (self.out_features, self.in_features))
        if self.use_bias:
            self.bias = self.param("bias", nn.initializers.zeros,
                                   (self.out_features, 1))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alg = self.algebra
        if self.subspaces:
            w_full = self.weight[..., alg.blade_to_grade]  # (out, in, n_blades)
            out = jnp.einsum("...mi,nmi->...ni", x, w_full)
        else:
            out = jnp.einsum("...mi,nm->...ni", x, self.weight)
        if self.use_bias:
            # scalar-blade bias embedded at blade 0
            out = out.at[..., :1].add(self.bias)
        return out


class MVSiLU(nn.Module):
    """Gated SiLU on multivectors (reference MVSiLU :53-83): the gate is a
    sigmoid of an affine function of per-grade invariants (scalar blade
    passthrough + per-grade mag2 or norm)."""

    algebra: CliffordAlgebra
    channels: int
    invariant: str = "mag2"

    def setup(self):
        self.a = self.param("a", nn.initializers.ones,
                            (self.channels, self.algebra.dim + 1))
        self.b = self.param("b", nn.initializers.zeros,
                            (self.channels, self.algebra.dim + 1))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alg = self.algebra
        if self.invariant == "mag2":
            inv = alg.qs_cat(x)
        elif self.invariant == "norm":
            inv = alg.norms_cat(x)
        else:
            raise ValueError(f"Invariant {self.invariant} not recognized.")
        # grade-0 entry is the raw scalar blade value, not its invariant
        inv = jnp.concatenate([x[..., :1], inv[..., 1:]], axis=-1)
        gate = self.a * inv + self.b
        gate = gate[..., alg.blade_to_grade]
        return jax.nn.sigmoid(gate) * x


class NormalizationLayer(nn.Module):
    """Per-grade norm normalization with a learned interpolation gate
    (reference NormalizationLayer :34-51)."""

    algebra: CliffordAlgebra
    features: int
    init_scale: float = 0.0  # named `init` in the reference ctor (:35)

    def setup(self):
        self.a = self.param(
            "a", nn.initializers.constant(self.init_scale),
            (self.features, self.algebra.n_subspaces))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alg = self.algebra
        norms = alg.norms_cat(x)                      # (..., C, n_subspaces)
        s_a = jax.nn.sigmoid(self.a)
        norms = s_a * (norms - 1.0) + 1.0             # interpolate to 1
        norms = norms[..., alg.blade_to_grade]
        return x / (norms + EPS)


class MVLayerNorm(nn.Module):
    """Divide by the channel-mean full-multivector norm, learned per-channel
    scale (reference MVLayerNorm :86-96)."""

    algebra: CliffordAlgebra
    channels: int

    def setup(self):
        self.a = self.param("a", nn.initializers.ones, (self.channels,))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        norm = self.algebra.norm(x)                   # (..., C, 1)
        norm = jnp.mean(norm, axis=-2, keepdims=True) + EPS
        return self.a[:, None] * x / norm


class SteerableGeometricProductLayer(nn.Module):
    """Fully-parameterized geometric product
    ``x (x)_w normalize(W x)`` (reference SGP :98-155).

    A weight is learned per (channel, nonzero grade-triple path); the
    blade-resolution weighted Cayley tensor is formed by a static gather and
    contracted in a single einsum — the FLOPs hot spot of the network
    (reference einsum at cegnn_utils.py:151).
    """

    algebra: CliffordAlgebra
    features: int
    include_first_order: bool = True
    normalization_init: Optional[float] = 0.0
    # "dense": nb^3 einsum — XLA factors it into MXU matmuls.  "pair": nb^2
    # sparse form, kept for low-lane backends.  The per-edge hot path on
    # TPU uses the fused CEMLP kernel instead (ops/cemlp_kernel.py).
    impl: str = "dense"

    def setup(self):
        alg = self.algebra
        n_paths = int(alg.geometric_product_paths.sum())
        self.weight = self.param(
            "weight", normal_init(1.0 / math.sqrt(alg.dim + 1)),
            (self.features, n_paths))
        self.linear_right = MVLinear(alg, self.features, self.features,
                                     use_bias=False, name="linear_right")
        if self.normalization_init is not None:
            self.normalization = NormalizationLayer(
                alg, self.features, self.normalization_init,
                name="normalization")
        if self.include_first_order:
            self.linear_left = MVLinear(alg, self.features, self.features,
                                        use_bias=True, name="linear_left")

    def weighted_cayley(self) -> jnp.ndarray:
        """Blade-resolution weighted Cayley tensor (C, nb, nb, nb)."""
        alg = self.algebra
        paths = alg.geometric_product_paths          # (d+1, d+1, d+1) bool
        idx = np.argwhere(paths)                     # (n_paths, 3) static
        cube = jnp.zeros((self.features, alg.dim + 1, alg.dim + 1,
                          alg.dim + 1), dtype=self.weight.dtype)
        cube = cube.at[:, idx[:, 0], idx[:, 1], idx[:, 2]].set(self.weight)
        g = alg.blade_to_grade
        w_blades = cube[:, g][:, :, g][:, :, :, g]   # (C, nb, nb, nb)
        return jnp.asarray(alg.cayley, dtype=self.weight.dtype) * w_blades

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alg = self.algebra
        x_right = self.linear_right(x)
        if self.normalization_init is not None:
            x_right = self.normalization(x_right)

        if self.impl == "dense":
            weighted = self.weighted_cayley().astype(x.dtype)
            out = jnp.einsum("...ni,nijk,...nk->...nj", x, weighted,
                             x_right)
        else:
            # sparse pair form: out_j = sum_k coeff[j,k] w[n,path(j,k)]
            # x[..., i_of[j,k]] xr[..., k]  — nb^2 work, VPU-friendly
            paths = alg.geometric_product_paths
            idx = np.argwhere(paths)
            cube = jnp.zeros((self.features, alg.dim + 1, alg.dim + 1,
                              alg.dim + 1), dtype=self.weight.dtype)
            cube = cube.at[:, idx[:, 0], idx[:, 1], idx[:, 2]].set(
                self.weight)
            g = alg.blade_to_grade
            i_of, coeff = alg.gp_pair_tables          # (nb, nb) each
            wp = cube[:, g[i_of], g[:, None], g[None, :]]  # (C, nb, nb)
            cw = jnp.asarray(coeff, dtype=x.dtype) * wp
            xg = x[..., i_of]                          # (..., C, nb, nb)
            out = jnp.einsum("...njk,njk,...nk->...nj", xg, cw, x_right)

        if self.include_first_order:
            out = (self.linear_left(x) + out) / math.sqrt(2)
        return out


class CEMLP(nn.Module):
    """Stack of [MVLinear -> MVSiLU -> SGP -> MVLayerNorm] blocks
    (reference CEMLP :160-213); the shared message/update network.

    ``fused``: None = auto (use the fused whole-block Pallas kernel on TPU
    for algebras it supports); True/False forces.  The fused path reads the
    SAME parameter tree, so checkpoints and fixtures are interchangeable.
    """

    algebra: CliffordAlgebra
    in_features: int
    hidden_features: int
    out_features: int
    n_layers: int = 2
    normalization_init: Optional[float] = 0.0
    fused: Optional[bool] = None

    def setup(self):
        alg = self.algebra
        widths = (
            [self.in_features]
            + [self.hidden_features] * (self.n_layers - 1)
            + [self.out_features]
        )
        self.widths = widths
        for i in range(self.n_layers):
            f_in, f_out = widths[i], widths[i + 1]
            setattr(self, f"linear_{i}",
                    MVLinear(alg, f_in, f_out, name=f"linear_{i}"))
            setattr(self, f"silu_{i}", MVSiLU(alg, f_out, name=f"silu_{i}"))
            setattr(self, f"gp_{i}", SteerableGeometricProductLayer(
                alg, f_out, normalization_init=self.normalization_init,
                name=f"gp_{i}"))
            setattr(self, f"norm_{i}",
                    MVLayerNorm(alg, f_out, name=f"norm_{i}"))

    def _use_fused(self) -> bool:
        if self.fused is not None:
            return self.fused
        from ..ops.cemlp_kernel import fused_supported

        return fused_supported(self.algebra)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self._use_fused():
            from ..ops.cemlp_kernel import apply_fused_cemlp

            return apply_fused_cemlp(self, x)
        for i in range(self.n_layers):
            x = getattr(self, f"linear_{i}")(x)
            x = getattr(self, f"silu_{i}")(x)
            x = getattr(self, f"gp_{i}")(x)
            x = getattr(self, f"norm_{i}")(x)
        return x
