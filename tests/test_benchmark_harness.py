"""The shared in-graph timing harness must handle the carry shapes its
call sites use (single array, pytree with non-float leaves, extra const
args, multi-output steps) without perturbing non-float dtypes."""

import jax
import jax.numpy as jnp

from sln_amodal_tpu.utils.benchmark import loop_time


def test_array_carry():
    dt = loop_time(lambda x: x * 2.0, jnp.ones((8, 8)), iters=2)
    assert dt >= 0


def test_const_args_and_tuple_output():
    dt = loop_time(
        lambda x, w: (x @ w, jnp.sum(x)),
        jnp.ones((8, 8)), (jnp.eye(8),), iters=2,
    )
    assert dt >= 0


def test_mixed_dtype_pytree_carry():
    carry = (
        jnp.ones((4,)),
        jnp.zeros((4,), jnp.int32),
        jnp.ones((4,), bool),
    )
    dt = loop_time(lambda c: c[0] + 1.0, carry, iters=2)
    assert dt >= 0


def test_float_free_carry_rejected():
    # a carry with no floating leaves would let XLA DCE the loop entirely
    # and report ~0 s/iter; the harness must refuse it up front
    import pytest

    with pytest.raises(ValueError, match="floating"):
        loop_time(lambda c: c + 1, jnp.zeros((4,), jnp.int32), iters=2)


def test_leafless_output_step():
    # a step whose output tree has no leaves must not crash the dep sum
    dt = loop_time(lambda x: (), jnp.ones((4,)), iters=2)
    assert dt >= 0


def test_jit_composable():
    # used from inside bench functions that may themselves be traced
    f = jax.jit(lambda x: jnp.sum(x))
    dt = loop_time(lambda x: f(x), jnp.ones((16,)), iters=2)
    assert dt >= 0


def _bench_module():
    import importlib
    import os
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if root not in sys.path:
        sys.path.insert(0, root)
    return importlib.import_module("bench")


def test_run_metric_retries_then_succeeds(capsys):
    bench = _bench_module()
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transport flake")
        return 42.0

    import time as _time
    orig_sleep = _time.sleep
    _time.sleep = lambda *_: None  # no backoff delay in tests
    try:
        assert bench.run_metric("m", flaky) == 42.0
    finally:
        _time.sleep = orig_sleep
    assert calls["n"] == 3
    assert capsys.readouterr().out == ""  # no error record on success


def test_run_metric_emits_error_record(capsys):
    bench = _bench_module()

    def always_fails():
        raise RuntimeError("down for good")

    import json
    import time as _time
    orig_sleep = _time.sleep
    _time.sleep = lambda *_: None
    try:
        assert bench.run_metric("m", always_fails, retries=2) is None
    finally:
        _time.sleep = orig_sleep
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["metric"] == "m"
    assert "down for good" in rec["error"]


def test_program_flops_matches_matmul():
    bench = _bench_module()
    x = jnp.ones((64, 64))
    flops = bench.program_flops(lambda a: a @ a, x)
    assert flops == 2 * 64**3


def test_constant_overhead_eliminated():
    # the two-point method must report per-iter cost, not per-call cost:
    # a heavy step's time should not shrink when iters doubles (within
    # noise), while a single-point T(n)/n would
    x = jnp.ones((256, 256))
    step = lambda c, w: ((w + c * 0) @ w).sum()
    dt_small = loop_time(step, jnp.float32(0), (x,), iters=4)
    dt_large = loop_time(step, jnp.float32(0), (x,), iters=32)
    assert dt_large <= dt_small * 5 + 1e-3
    assert dt_small <= dt_large * 5 + 1e-3
