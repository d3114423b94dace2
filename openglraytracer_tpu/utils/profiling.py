"""Profiling: jax.profiler trace capture + HLO cost analysis.

The reference has no profiling at all — its only clock drives animation and
vsync hides true frame cost (SURVEY.md §5). Here: Perfetto/XProf traces
around any function, and XLA cost analysis for per-compilation FLOP/byte
estimates.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace viewable in XProf/Perfetto/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn, *args, **kwargs):
    """XLA cost analysis (flops, bytes accessed) for fn(*args) post-compile.
    Returns a dict, or {} if the backend doesn't expose it."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    try:
        costs = compiled.cost_analysis()
    except Exception:
        return {}
    if isinstance(costs, (list, tuple)):
        costs = costs[0] if costs else {}
    return dict(costs) if costs else {}


def flops_estimate(fn, *args, **kwargs) -> float:
    return float(cost_analysis(fn, *args, **kwargs).get("flops", 0.0))
