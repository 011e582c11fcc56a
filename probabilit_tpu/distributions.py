"""Reference-parity module: ``probabilit_tpu.distributions``.

Named factories with friendly parametrizations (reference
``distributions.py``).
"""

from probabilit_tpu.models.factories import (  # noqa: F401
    PERT,
    ClaytonCopula,
    EmpiricalCopula,
    FrankCopula,
    GaussianCopula,
    GumbelCopula,
    TCopula,
    Lognormal,
    Normal,
    TruncatedNormal,
    Triangular,
    Uniform,
    _fit_triangular_distribution,
    _pert_to_beta,
)

# The reference's distributions.py imports these from modeling
# (distributions.py:4-5), so they are importable from that path too.
from probabilit_tpu.models.distributions import Distribution  # noqa: F401
from probabilit_tpu.models.graph import Exp, Log, Sign  # noqa: F401

__all__ = [
    "Uniform",
    "Normal",
    "TruncatedNormal",
    "Lognormal",
    "PERT",
    "Triangular",
    "ClaytonCopula",
    "GumbelCopula",
    "FrankCopula",
    "GaussianCopula",
    "TCopula",
    "EmpiricalCopula",
]
