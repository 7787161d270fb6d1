"""Tracing / profiling helpers (SURVEY.md §5.1).

The reference's only observability is wall-clock meters and an external
FLOP counter (examples/utils.py:6-27, README.md:130-152). TPU-native
equivalents:

- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace;
- :func:`compiled_stats` — per-computation FLOPs / bytes-accessed from
  XLA's own cost analysis of the compiled executable, plus peak memory
  analysis where the backend provides it.
"""
from __future__ import annotations

import contextlib
from typing import Any, Callable, Dict

import jax

__all__ = ["trace", "compiled_stats"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a block: ``with trace('/tmp/tb'): step(...)``; view in
    TensorBoard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compiled_stats(fn: Callable, *args, **kwargs) -> Dict[str, Any]:
    """Compile ``fn`` for the current backend and return XLA's cost analysis.

    Returns a dict with (backend-dependent) keys like ``flops``,
    ``bytes accessed``, plus ``peak_memory_bytes`` when available. Useful to
    compare against roofline expectations without running anything.
    """
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    out: Dict[str, Any] = {}
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        out.update(dict(cost))
    except Exception:
        pass
    try:
        mem = compiled.memory_analysis()
        for key in ("temp_size_in_bytes", "argument_size_in_bytes",
                    "output_size_in_bytes", "generated_code_size_in_bytes"):
            val = getattr(mem, key, None)
            if val is not None:
                out[key] = val
    except Exception:
        pass
    return out
