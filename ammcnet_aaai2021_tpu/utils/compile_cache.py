"""Persistent XLA compilation cache.

This environment compiles TPU programs through a remote service whose
latency varies from seconds to many minutes; the on-disk executable cache
makes every entry point (bench, CLIs, graft entry, tests) pay each program's
compile exactly once per machine.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str = "") -> str:
    import jax

    cache_dir = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.expanduser("~/.cache/ammcnet_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return cache_dir
