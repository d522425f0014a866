"""The executable real-weights parity recipe (scripts/run_parity.py).

The BASELINE.md north-star gate (converted COCOA.pth/D2SA.pth within 0.5 AP
of the reference) needs weights and data that don't exist in this
environment; these tests pin the recipe itself: the comparison/gate logic
(fast) and the full no-weights dry run — synthetic data, biased init,
reference-.pth round trip, two evaluate+sweep passes that must agree to
delta 0 (slow).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import run_parity  # noqa: E402


def test_compare_within_gate_passes(capsys):
    ours = {"both/all": [0.310, 0.521], "things/all": [0.40]}
    ref = {"both/all": [0.312, 0.525], "things/all": [0.398]}
    assert run_parity.compare(ours, ref, gate=0.5)
    out = capsys.readouterr().out
    assert "FAIL" not in out and "ok" in out


def test_compare_beyond_gate_fails(capsys):
    ours = {"both/all": [0.310]}
    ref = {"both/all": [0.320]}  # 1.0 AP point off
    assert not run_parity.compare(ours, ref, gate=0.5)
    assert "FAIL" in capsys.readouterr().out


def test_compare_missing_slice_fails(capsys):
    assert not run_parity.compare({}, {"both/all": [0.3]}, gate=0.5)
    assert "MISSING" in capsys.readouterr().out


def test_compare_partial_ref_only_checks_given(capsys):
    # a partial reference map compares only its own slices/stats
    ours = {"both/all": [0.30, 0.50, 0.20], "stuff/all": [0.99]}
    ref = {"both/all": [0.30]}
    assert run_parity.compare(ours, ref, gate=0.0)


@pytest.mark.slow
def test_dry_run_roundtrip_identical(tmp_path):
    """Full rehearsal: biased init → native ckpt AND reference-.pth export →
    convert-on-load → evaluate → 12-way sweep, twice; sweeps must be
    identical (gate 0). Exercises every line the real-weights run will."""
    run_parity.dry_run(str(tmp_path / "parity"))
