"""Shared device-timing harness (the in-graph fori_loop methodology).

Per-call dispatch on this platform goes through a tunnel with a measured
~22-26 ms round-trip floor per executed program (constant — it does NOT
decay with warmup; warmup only shrinks the first-call spike), plus 3-60 ms
of jitter early in a process. ``block_until_ready`` alone under-counts
device time instead. Two defenses:

1. Each measurement compiles ONE program that runs the step ``iters`` times
   in a ``lax.fori_loop`` whose carry is data-dependent on the step's output
   (so nothing is DCE'd or hoisted), and fetches one scalar at the end.
2. The constant per-call transport cost is ELIMINATED by a two-point
   measurement: the loop's trip count is a runtime argument, the same
   compiled program is timed at ``iters`` and ``2*iters``, and the per-iter
   time is ``(T(2n) - T(n)) / n``. A single-point ``T(n)/n`` would embed
   the ~25 ms constant as +25/n ms per iteration (at the old default n=20
   that overstated every stage by ~1.25 ms — 40% on a 3 ms kernel).

Repeats take the min of each point before differencing (transport jitter is
one-sided). Constants must be passed via ``args`` — closing over large
arrays embeds them as HLO constants and overflows the remote-compile
request body (HTTP 413).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _perturb(carry, dep):
    """Add dep*0 to every float leaf (bools/ints pass through unchanged)."""
    return jax.tree_util.tree_map(
        lambda a: a + dep.astype(a.dtype) * 0.0
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        carry,
    )


def loop_time(
    step: Callable[..., Any],
    carry0: Any,
    args: Tuple = (),
    iters: int = 20,
    repeats: int = 3,
) -> float:
    """Seconds per iteration of ``step(carry, *args)`` on device.

    ``carry0`` is an array or pytree threaded through the loop; ``step``'s
    full output tree is reduced to a scalar and folded back into the carry.
    One program is compiled with a runtime trip count; the result is the
    min-over-``repeats`` difference between ``2*iters`` and ``iters`` trips
    (see module docstring). Never negative (clamped at 0 when the step is
    cheaper than timing noise).
    """

    if not any(
        jnp.issubdtype(jnp.result_type(t), jnp.floating)
        for t in jax.tree_util.tree_leaves(carry0)
    ):
        # a carry with no floating leaves cannot absorb the output
        # perturbation — XLA would DCE the whole fori_loop and the
        # measurement would report ~0 s/iter
        raise ValueError("loop_time carry must have >=1 floating-point leaf")

    @jax.jit
    def run(n, c0, a):
        def body(_, carry):
            out = step(carry, *a)
            # start from a concrete f32 zero so a step whose output tree has
            # no leaves still yields an array (sum of [] is a Python int,
            # which has no .astype)
            dep = sum(
                (jnp.sum(t).astype(jnp.float32)
                 for t in jax.tree_util.tree_leaves(out)),
                jnp.float32(0),
            )
            return _perturb(carry, dep)

        final = lax.fori_loop(0, n, body, c0)
        leaves = [
            t for t in jax.tree_util.tree_leaves(final)
            if jnp.issubdtype(t.dtype, jnp.floating)
        ]
        return sum(jnp.sum(t).astype(jnp.float32) for t in leaves)

    n1 = jnp.int32(iters)
    n2 = jnp.int32(2 * iters)
    float(run(n2, carry0, args))  # compile + first execution (discarded)
    t1, t2 = [], []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(n1, carry0, args))
        t1.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(run(n2, carry0, args))
        t2.append(time.perf_counter() - t0)
    return max((min(t2) - min(t1)) / iters, 0.0)
