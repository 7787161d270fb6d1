"""Device-time measurement that is robust to dispatch/tunnel latency.

Host-side wall clocks mis-measure asynchronous TPU dispatch badly (and
remote-tunneled devices catastrophically). ``loop_time`` times executions of
a function *inside one compiled computation*: a ``lax.fori_loop`` whose
carry mixes an epsilon of each iteration's output back into the input,
forcing strict serialization so XLA can neither elide nor overlap
iterations. The loop bound is a traced scalar, so ONE compilation serves two
run lengths; their time difference cancels dispatch/readback overhead
exactly.
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["loop_time"]


def loop_time(fn: Callable, x: jax.Array, *args, iters: int = 100,
              warmup: bool = True, rounds: int = 1) -> float:
    """Seconds per execution of ``fn(x, *args)`` measured on-device.

    ``fn`` must accept ``x`` (any float array) first; its output may have any
    shape/dtype. Each iteration's output is reduced and fed back into ``x``
    scaled by a runtime epsilon (0 only at run time, so XLA cannot
    constant-fold the dependency away).
    """

    @jax.jit
    def run(x, eps, n):
        def body(_, carry):
            y = fn(carry, *args)
            fb = jnp.sum(y).astype(carry.dtype) * eps
            return carry + fb
        return lax.fori_loop(0, n, body, x, unroll=False)

    eps = jnp.asarray(0.0, x.dtype)
    n1 = max(iters // 5, 1)
    n2 = n1 + iters
    if warmup:
        float(jnp.sum(run(x, eps, n1)))  # compile + warm

    best = float("inf")
    for _ in range(max(rounds, 1)):
        t0 = time.time()
        float(jnp.sum(run(x, eps, n1)))
        t_short = time.time() - t0
        t0 = time.time()
        float(jnp.sum(run(x, eps, n2)))
        t_long = time.time() - t0
        best = min(best, max(t_long - t_short, 1e-12) / (n2 - n1))
    return best
