"""Shared device-timing harness (the in-graph fori_loop methodology).

Per-call dispatch on this platform goes through a tunnel with 3-60 ms RTT
(decaying with process warmup), so Python-loop-per-call timing wildly
overstates device time, while ``block_until_ready`` alone under-counts.
Instead each measurement compiles ONE program that runs the step ``iters``
times in a ``lax.fori_loop`` whose carry is data-dependent on the step's
output (so nothing is DCE'd or hoisted), and fetches one scalar at the end.

Constants must be passed via ``args`` — closing over large arrays embeds
them as HLO constants and overflows the remote-compile request body
(HTTP 413).
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
) -> float:
    """Seconds per iteration of ``step(carry, *args)`` on device.

    ``carry0`` is an array or pytree threaded through the loop; ``step``'s
    full output tree is reduced to a scalar and folded back into the carry.
    The first call compiles + runs (discarded); the second is timed.
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
    def run(c0, a):
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

        final = lax.fori_loop(0, iters, body, c0)
        leaves = [
            t for t in jax.tree_util.tree_leaves(final)
            if jnp.issubdtype(t.dtype, jnp.floating)
        ]
        return sum(jnp.sum(t).astype(jnp.float32) for t in leaves)

    float(run(carry0, args))  # compile + first execution
    t0 = time.perf_counter()
    float(run(carry0, args))
    return (time.perf_counter() - t0) / iters
