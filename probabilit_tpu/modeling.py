"""Reference-parity module: ``probabilit_tpu.modeling``.

Users of the reference import everything from ``probabilit.modeling``
(nodes, transforms, distributions — ``modeling.py:1-1264``); this module
re-exports the same surface from the TPU-native implementation so models
port with an import rename only.
"""

from probabilit_tpu.models.graph import *  # noqa: F401,F403
from probabilit_tpu.models.graph import __all__ as _graph_all
from probabilit_tpu.models.distributions import (  # noqa: F401
    AbstractDistribution,
    CumulativeDistribution,
    Distribution,
    DiscreteDistribution,
    EmpiricalDistribution,
    MarginalDistribution,
    MultivariateDistribution,
)

__all__ = list(_graph_all) + [
    "AbstractDistribution",
    "Distribution",
    "EmpiricalDistribution",
    "CumulativeDistribution",
    "DiscreteDistribution",
    "MarginalDistribution",
    "MultivariateDistribution",
]
