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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
