"""Shared benchmark plumbing.

One definition of the persistent-compile-cache setup (the cache removes
compile-autotuning variance between recorded runs — BASELINE.md
methodology); harnesses keep their own workload generators where the
ensembles intentionally differ (seeds / shape grids are part of each
recorded row's identity).
"""

from __future__ import annotations

import os


def setup_cache():
    """Point JAX at the repo's persistent compilation cache."""
    import jax

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
