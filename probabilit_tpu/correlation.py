"""Reference-parity module: ``probabilit_tpu.correlation``.

Mirrors the surface of the reference ``correlation.py``: correlators,
nearest correlation matrix, decorrelation, and the permutation machinery.
"""

from probabilit_tpu.ops.correlation import (  # noqa: F401
    Cholesky,
    Correlator,
    CorrelatorError,
    ImanConover,
    StudentTCopula,
    decorrelate,
)
from probabilit_tpu.ops.ncm import nearest_correlation_matrix  # noqa: F401
from probabilit_tpu.ops.permutation import (  # noqa: F401
    CorrelationMatrix,
    PermutationCorrelator,
    SwapIndexGenerator,
)

__all__ = [
    "Correlator",
    "CorrelatorError",
    "Cholesky",
    "ImanConover",
    "StudentTCopula",
    "PermutationCorrelator",
    "CorrelationMatrix",
    "SwapIndexGenerator",
    "decorrelate",
    "nearest_correlation_matrix",
]
