"""csmpn_tpu — TPU-native Clifford Group Equivariant Simplicial Message
Passing Networks.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference PyTorch/PyG implementation (congliuUvA/CSMPN), redesigned
TPU-first: static-shape simplicial batches, sorted segment reductions,
fused multivector kernels, and pjit/shard_map scale-out.
"""

__version__ = "0.1.0"

from .algebra.clifford import CliffordAlgebra, get_algebra  # noqa: F401
