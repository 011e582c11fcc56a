"""Tracing / profiling utilities.

The reference's only observability is correlator ``verbose`` prints
(SURVEY §5).  Here sampling is one XLA program, so the natural tools are
device traces plus phase timers:

* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable device trace;
* :class:`PhaseTimer` — lightweight named wall-clock phases with a report.
  With ``PROBABILIT_TPU_PROFILE=1``, ``sample()`` times its build+compile /
  execute / host phases and prints the report to stderr
  (``engine/sampler.py:_execute``);
* :func:`compiled_stats` — FLOP/memory analysis of a compiled sampling
  program via XLA's cost analysis.
"""

from __future__ import annotations

import contextlib
import os
import time

__all__ = ["trace", "PhaseTimer", "compiled_stats", "profiling_enabled"]


def profiling_enabled():
    return os.environ.get("PROBABILIT_TPU_PROFILE", "0") == "1"


@contextlib.contextmanager
def trace(logdir="/tmp/probabilit_tpu_trace"):
    """Capture a device trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Named wall-clock phases: ``with timer.phase("compile"): ...``."""

    def __init__(self):
        self.phases = {}

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + time.perf_counter() - t0

    def report(self):
        width = max((len(k) for k in self.phases), default=0)
        return "\n".join(
            f"{name:<{width}}  {seconds * 1e3:10.2f} ms"
            for name, seconds in self.phases.items()
        )


def compiled_stats(jitted_fn, *example_args):
    """Cost analysis (flops, bytes accessed, peak memory) of a jitted fn."""
    lowered = jitted_fn.lower(*example_args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # Older jax returns a per-device list
        cost = cost[0] if cost else {}
    mem = compiled.memory_analysis()
    out = {
        "flops": cost.get("flops") if cost else None,
        "bytes_accessed": cost.get("bytes accessed") if cost else None,
    }
    if mem is not None:
        out["peak_bytes"] = getattr(mem, "temp_size_in_bytes", None)
        out["output_bytes"] = getattr(mem, "output_size_in_bytes", None)
    return out
