"""Aux-subsystem coverage (SURVEY §5): profiling + logging/observability.

These are the superset of the reference's ad-hoc prints; they back the
"tracing/profiling" and "metrics/logging" rows of COMPONENTS.md, so they
get behavior tests rather than existing only as imported-but-untested code.
"""

import jax.numpy as jnp
import numpy as np

from sln_amodal_tpu.utils import logging as obs
from sln_amodal_tpu.utils import profiling


def test_step_profiler_sync_and_summary():
    p = profiling.StepProfiler(sync_every=2)
    x = jnp.ones((4,))
    assert p.step(x) is None          # step 1: off-cycle, no measurement
    dt = p.step(x)                    # step 2: sync + measure
    assert dt is not None and dt >= 0
    p.step(x)
    p.step(x)
    s = p.summary()
    assert set(s) == {"mean_step_s", "p50_step_s", "p95_step_s", "steps_per_s"}
    assert s["steps_per_s"] > 0


def test_step_profiler_empty_summary():
    assert profiling.StepProfiler().summary() == {}


def test_annotate_usable_as_context():
    with profiling.annotate("test-region"):
        jnp.ones((2,)).sum()


def test_log_with_array_stats(capsys):
    obs.log("weights", np.arange(6.0).reshape(2, 3))
    out = capsys.readouterr().out
    assert "shape" in out and "min" in out and "5.0" in out
    obs.log("empty", np.zeros((0,)))
    assert "(empty)" in capsys.readouterr().out


def test_progress_bar_completes(capsys):
    for i in range(1, 4):
        obs.progress_bar(i, 3, prefix="eval")
    out = capsys.readouterr().out
    assert "100.0%" in out and out.endswith("\n")


def test_count_params_and_print_network(capsys):
    params = {"a": {"kernel": np.zeros((3, 4)), "bias": np.zeros((4,))},
              "b": np.zeros((2,))}
    assert obs.count_params(params) == 12 + 4 + 2
    n = obs.print_network(params, "tiny")
    assert n == 18 and "18" in capsys.readouterr().out


def test_step_timer_history():
    t = obs.StepTimer()
    assert t.summary() == {}
    t.tick()
    t.tick()
    s = t.summary()
    assert s["steps"] == 2 and s["mean_s"] >= 0


def test_trace_writes_artifacts(tmp_path):
    import glob

    with profiling.trace(str(tmp_path)):
        jnp.ones((8, 8)).sum().block_until_ready()
    assert glob.glob(str(tmp_path / "**" / "*"), recursive=True)


def test_cli_trace_dir_wraps_run(tmp_path, capsys):
    """--trace_dir wires profiling.trace around the CLI run (superset of
    the reference's nonexistent tracing, SURVEY §5) — the wrapper must
    produce trace artifacts even when the command itself is a no-op."""
    import glob

    from sln_amodal_tpu.cli.train import main

    main(["nosuchcommand", "--dataset", "/nonexistent",
          "--trace_dir", str(tmp_path / "tb")])
    out = capsys.readouterr().out
    assert "Profiler trace" in out and "not recognized" in out
    assert glob.glob(str(tmp_path / "tb" / "**" / "*"), recursive=True)
