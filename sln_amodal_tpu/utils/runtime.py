"""Runtime setup helpers shared by CLIs and benchmarks."""

from __future__ import annotations

import os


def setup_runtime(platform: str | None = None,
                  compilation_cache: str | None = "~/.cache/sln_amodal_xla") -> None:
    """Configure JAX for this process.

    - ``platform``: force a backend ('cpu'/'tpu'/'axon'). Needed because the
      axon TPU plugin prepends itself to jax_platforms at import, overriding
      the JAX_PLATFORMS env var.
    - ``compilation_cache``: persistent XLA compile cache directory (first
      full-model compile is ~10 min through the remote-compile tunnel;
      subsequent process launches hit this cache).
    """
    import jax

    platform = platform or os.environ.get("SLN_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    if compilation_cache:
        path = os.path.expanduser(compilation_cache)
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
