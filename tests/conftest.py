"""Test harness config.

Tests run on the JAX CPU backend with 8 virtual devices so that multi-chip
sharding paths can be exercised without TPU hardware.

NOTE: this environment ships an 'axon' TPU PJRT plugin that *prepends* itself
to ``jax_platforms`` at import time, overriding ``JAX_PLATFORMS=cpu`` from the
environment — so the override must go through ``jax.config`` after import.
Without it, every test would run over the single tunneled TPU chip
(serializing across processes and paying an RPC per eager op).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Must be set BEFORE jaxlib's native logging initializes: loading a cached
# CPU AOT result logs a spurious machine-feature mismatch for the
# 'prefer-no-scatter/gather' tuning pseudo-features (identical real ISA) —
# 4 multi-KB E-lines per load.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the slow suite is dominated by repeated
# full-graph CPU compiles (~26 min cold); cached re-runs skip them. Kept in
# the user cache dir so it survives across pytest invocations; override with
# SLN_TEST_CACHE=" " (blank) to disable.
_cache = os.environ.get("SLN_TEST_CACHE", "~/.cache/sln_amodal_xla_tests").strip()
if _cache:
    _cache = os.path.expanduser(_cache)
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
