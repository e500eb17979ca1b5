"""AOT-land the driver entry points' TPU programs in the persistent cache.

A host reset can wipe ``~/.cache/ammcnet_jax`` (observed 2026-08-19); the
driver then pays a remote-service compile inside its compile-check /bench
timeout — the BENCH_r02 failure mode.  This tool re-lands the two programs
``__graft_entry__.entry()`` needs (``jit(gen.init)`` at the entry shapes and
the fused forward+score ``fn``) WITHOUT touching the device data path: both
are ``.lower().compile()`` only, and the variable pytree comes from
``jax.eval_shape`` — so it works even while the tunnel's execute/transfer
path is wedged (compile RPCs ride a separate service that stays healthy).

The model/shape/fn construction is IMPORTED from
``__graft_entry__._build_entry_program()`` — one definition, so the landed
cache entries can never drift from what the driver's compile check runs
(the round-2 advisor flagged the previous hand-copied duplicate).

bench.py's own programs are landed by running bench.py itself (see
CLAUDE.md); this covers the remaining driver surface:

    python -m ammcnet_aaai2021_tpu.tools.land_programs
"""

from __future__ import annotations

import os
import sys
import time


def _import_graft_entry():
    """Import the repo-root ``__graft_entry__`` module regardless of cwd:
    it lives next to the package dir, not inside it."""
    try:
        import __graft_entry__
    except ImportError:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        sys.path.insert(0, repo_root)
        import __graft_entry__
    return __graft_entry__


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ammcnet_aaai2021_tpu.utils.compile_cache import (
        enable_compilation_cache)

    cache_dir = enable_compilation_cache()
    print(f"[land] cache dir: {cache_dir}", flush=True)

    graft = _import_graft_entry()
    gen, fn, shapes = graft._build_entry_program()

    rgb_sds = jax.ShapeDtypeStruct(shapes["rgb"], jnp.float32)
    op_sds = jax.ShapeDtypeStruct(shapes["op"], jnp.float32)
    init_in = (jax.ShapeDtypeStruct(shapes["rgb"][:-1] + (12,), jnp.float32),
               jax.ShapeDtypeStruct(shapes["op"][:-1] + (6,), jnp.float32))
    rng_sds = {"params": jax.ShapeDtypeStruct((2,), jnp.uint32)}

    t0 = time.perf_counter()
    jax.jit(gen.init).lower(rng_sds, *init_in).compile()
    print(f"[land] jit(gen.init) @ {shapes['rgb'][:-1]} compiled "
          f"({time.perf_counter() - t0:.1f}s)", flush=True)

    vars_sds = jax.eval_shape(gen.init, rng_sds, *init_in)

    t1 = time.perf_counter()
    jax.jit(fn).lower(vars_sds, rgb_sds, op_sds).compile()
    print(f"[land] entry fn (fused forward+score) compiled "
          f"({time.perf_counter() - t1:.1f}s)", flush=True)
    print("[land] done", flush=True)


if __name__ == "__main__":
    main()
