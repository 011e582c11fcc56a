"""Small host-side helpers (corrmat assembly, argument zipping).

Mirrors the reference ``utils.py`` API surface.
"""

from probabilit_tpu.utils.helpers import (
    adjust_minmax_quantiles,
    build_corrmat,
    zip_args,
)

__all__ = ["build_corrmat", "zip_args", "adjust_minmax_quantiles"]
