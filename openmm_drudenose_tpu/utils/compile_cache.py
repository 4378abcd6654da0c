"""Persistent XLA compilation cache helper.

Remote-TPU compiles in this environment are erratically slow (seconds to
~10 minutes — the round-2 benchmark artifact recorded rc=124/null purely
from compile latency).  The persistent cache turns every repeat compile
into a sub-second executable load — but it MUST be enabled with
``jax.config.update``: the axon TPU plugin pre-registers via
sitecustomize, so jax's config is created before user code runs and the
``JAX_COMPILATION_CACHE_DIR`` environment variable (read at import time)
is silently ignored.  Every entry point that wants caching calls
``enable()`` instead.
"""

from __future__ import annotations

import os


def default_cache_dir() -> str:
    """<repo root>/.jaxcache — committable, so a fresh environment starts
    with a warm cache (the driver's benchmark window cannot absorb a cold
    100k-atom step compile)."""
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, ".jaxcache")


def enable(path: str | None = None) -> str:
    """Point jax's persistent compilation cache at `path` (default: the
    JAX_COMPILATION_CACHE_DIR env var if set, else <repo>/.jaxcache).
    Safe to call more than once; returns the directory used."""
    import jax
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") \
        or default_cache_dir()
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    return path
