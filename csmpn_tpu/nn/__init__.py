from .modules import (  # noqa: F401
    CEMLP,
    EPS,
    MVLayerNorm,
    MVLinear,
    MVSiLU,
    NormalizationLayer,
    SteerableGeometricProductLayer,
)
from .egcl import EGCL  # noqa: F401
