"""Shared microbenchmark harness for TPU op variants.

The axon tunnel adds a large (~30 ms, noisy) fixed cost per dispatch, so
per-op time MUST be measured as a slope between two inner-loop lengths:
t_op = (t(n2) - t(n1)) / (n2 - n1).  Completion is forced by host readback
(block_until_ready does not reliably block through the tunnel).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def make_scan(body, length):
    @jax.jit
    def run(x0):
        def step(x, _):
            return body(x), None

        x, _ = jax.lax.scan(step, x0, None, length=length)
        return jnp.sum(x[:8, :8].astype(jnp.float32)) if x.ndim >= 2 else jnp.sum(x)

    return run


def time_fn(fn, *args, iters: int = 5) -> float:
    """Total ms per call, averaged, after a warm call."""
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        np.asarray(jax.tree.leaves(o)[0])
    return (time.perf_counter() - t0) / iters * 1e3


def op_ms(body, x, n1: int = 8, n2: int = 40, iters: int = 5) -> float:
    """Slope-based per-op milliseconds for `body` applied x -> x."""
    t1 = time_fn(make_scan(body, n1), x, iters=iters)
    t2 = time_fn(make_scan(body, n2), x, iters=iters)
    return (t2 - t1) / (n2 - n1)
