"""Persistent XLA compilation cache.

This environment compiles TPU programs through a remote service whose
latency varies from seconds to many minutes; the on-disk executable cache
makes every entry point (bench, CLIs, graft entry, tests) pay each program's
compile exactly once per machine.

Key-stability (hard-won, 2026-08-17): Pallas kernels embed the USER CALL
STACK's source locations in their serialized Mosaic payload, and JAX's
cache-key canonicalization strips debug info only from the top-level module
— it cannot reach inside the custom-call payload.  Consequence: editing ANY
file above a ``pallas_call`` in the call chain (even adding a comment line)
re-keyed every program containing the memory kernel, turning repeat runs
into fresh multi-minute remote compiles (the round-2 driver bench died to
exactly this).  Verified empirically: a 5-line shift of the calling file
changed the key; with the two location-limit options below the shifted file
hits the same key.  Cost: tracebacks in XLA error messages/profiles lose
user-frame locations (set AMMCNET_FULL_LOCATIONS=1 to restore them when
debugging at the price of unstable cache keys).
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
    if os.environ.get("AMMCNET_FULL_LOCATIONS", "") not in ("1", "true"):
        # edit-proof cache keys: keep user-stack source locations out of
        # lowered modules (incl. Pallas custom-call payloads, which the
        # cache key cannot canonicalize away)
        jax.config.update("jax_traceback_in_locations_limit", 0)
        jax.config.update("jax_include_full_tracebacks_in_locations", False)
    return cache_dir
