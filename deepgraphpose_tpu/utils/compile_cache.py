"""Persistent XLA compilation-cache setup.

Backbone train/infer programs take 30-300 s to compile (relay-attached dev
chips sit at the slow end); the persistent cache turns every rerun of the
same program into a few-second load. tests/conftest.py and bench.py set
the same directory; this helper lets the library entry points (fit_*,
analyze_videos, estimate_pose) opt the user in by default.

Env overrides: ``DGP_COMPILE_CACHE=<dir>`` picks the directory,
``DGP_COMPILE_CACHE=0`` disables, and an explicit user setting
(jax_compilation_cache_dir or JAX_COMPILATION_CACHE_DIR) always wins.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = "/tmp/dgp_tpu_jax_cache"
_done = False


def ensure_compile_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    override = os.environ.get("DGP_COMPILE_CACHE")
    if override == "0":
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user already configured it through JAX's own env var
    import jax

    if jax.config.jax_compilation_cache_dir is not None:
        return  # configured programmatically (e.g. tests/conftest.py)
    jax.config.update("jax_compilation_cache_dir",
                      override or DEFAULT_CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
