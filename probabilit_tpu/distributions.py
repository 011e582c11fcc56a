"""Reference-parity module: ``probabilit_tpu.distributions``.

Named factories with friendly parametrizations (reference
``distributions.py``).
"""

from probabilit_tpu.models.factories import (  # noqa: F401
    PERT,
    Lognormal,
    Normal,
    TruncatedNormal,
    Triangular,
    Uniform,
    _fit_triangular_distribution,
    _pert_to_beta,
)

__all__ = ["Uniform", "Normal", "TruncatedNormal", "Lognormal", "PERT", "Triangular"]
