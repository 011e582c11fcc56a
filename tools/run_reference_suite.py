"""Run the REFERENCE's own test suite against probabilit_tpu.

The strongest drop-in-compatibility proof available: alias the
``probabilit`` module tree onto ``probabilit_tpu`` and execute the
reference's pytest suite (``/root/reference/tests``, 1,048 LoC) unmodified.

Usage::

    python tools/run_reference_suite.py [pytest args...]

Expected outcome (recorded 2026-08-16, see BASELINE.md):

* test_distributions.py  137/137 pass (incl. Triangular round-trip fits
  at atol 1e-8 over the full 4x3x3x4 parameter grid)
* test_correlation.py + test_garbage_collector.py  13/13 pass
* test_modeling.py       12/15 pass — the 3 failures are exact-seeded
  golden-value assertions (rtol 1e-7 on specific PRNG draws); different
  RNG engines cannot reproduce them by design.  The same models pass the
  statistical-parity tier (tests/test_reference_parity.py).
* test_iman_conover.py / test_permutation_correlator.py  475/475 pass
  (slow: hundreds of jit compiles for per-seed parametrizations).
  Two corner cases this sweep surfaced were fixed in-repo: swap
  proposals colliding to nothing at small N, and float32 decorrelate
  residuals tripping f64-tolerance asserts.

The aliasing below mirrors the reference's module layout
(``probabilit.modeling`` etc. — see SURVEY.md §0).
"""

from __future__ import annotations

import sys


def install_alias():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import probabilit_tpu
    import probabilit_tpu.correlation
    import probabilit_tpu.distributions
    import probabilit_tpu.garbage_collector
    import probabilit_tpu.inspection
    import probabilit_tpu.modeling
    import probabilit_tpu.utils.helpers

    sys.modules["probabilit"] = probabilit_tpu
    sys.modules["probabilit.modeling"] = probabilit_tpu.modeling
    sys.modules["probabilit.correlation"] = probabilit_tpu.correlation
    sys.modules["probabilit.distributions"] = probabilit_tpu.distributions
    sys.modules["probabilit.inspection"] = probabilit_tpu.inspection
    sys.modules["probabilit.garbage_collector"] = probabilit_tpu.garbage_collector
    sys.modules["probabilit.utils"] = probabilit_tpu.utils.helpers


def main():
    import pytest

    install_alias()
    args = sys.argv[1:] or ["/root/reference/tests", "-q"]
    raise SystemExit(pytest.main(args))


if __name__ == "__main__":
    main()
