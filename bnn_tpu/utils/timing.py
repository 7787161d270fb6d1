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
    # `run` is freshly jitted per loop_time call, so the first execution
    # compiles — always absorb that here, NEVER inside a timed run (the
    # `warmup` flag is kept for API compatibility but no longer optional).
    del warmup
    float(jnp.sum(run(x, eps, n1)))

    # Tunnel/dispatch latency is large AND noisy (tens of ms either way), so
    # min-of-(t_long - t_short) is biased toward 0. Instead take the min of
    # each run length separately — each min converges to (best-case rtt +
    # true device time), so their difference cancels the rtt robustly — and
    # interleave the two lengths so drift hits both equally.
    t_short = t_long = float("inf")
    for _ in range(max(rounds, 1) + 1):
        t0 = time.time()
        float(jnp.sum(run(x, eps, n1)))
        t_short = min(t_short, time.time() - t0)
        t0 = time.time()
        float(jnp.sum(run(x, eps, n2)))
        t_long = min(t_long, time.time() - t0)
    return max(t_long - t_short, 1e-12) / (n2 - n1)
