"""AOT-land the driver entry points' TPU programs in the persistent cache.

A host reset can wipe ``~/.cache/ammcnet_jax`` (observed 2026-08-19); the
driver then pays a remote-service compile inside its compile-check /bench
timeout — the BENCH_r02 failure mode.  This tool re-lands the two programs
``__graft_entry__.entry()`` needs (``jit(gen.init)`` at the entry shapes and
the fused forward+score ``fn``) WITHOUT touching the device data path: both
are ``.lower().compile()`` only, and the variable pytree comes from
``jax.eval_shape`` — so it works even while the tunnel's execute/transfer
path is wedged (compile RPCs ride a separate service that stays healthy).

bench.py's own programs are landed by running bench.py itself (see
CLAUDE.md); this covers the remaining driver surface:

    python -m ammcnet_aaai2021_tpu.tools.land_programs
"""

from __future__ import annotations

import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ammcnet_aaai2021_tpu.utils.compile_cache import (
        enable_compilation_cache)

    cache_dir = enable_compilation_cache()
    print(f"[land] cache dir: {cache_dir}", flush=True)

    import __graft_entry__

    t0 = time.perf_counter()
    # entry() executes jit(gen.init) on the default (TPU) device to build
    # real variables — that is exactly the program the driver's compile
    # check runs first, so landing it means running it.  To stay safe under
    # a wedged *execute* path we compile-only here: rebuild the same model
    # and shapes entry() uses and AOT-compile init + fn.
    from ammcnet_aaai2021_tpu.configs import NetConfig
    from ammcnet_aaai2021_tpu.models import build_generator
    from ammcnet_aaai2021_tpu.ops.metrics import psnr_per_frame

    cfg = NetConfig()
    gen = build_generator(cfg, per_sample_diff=True)
    size = 256
    rgb_sds = jax.ShapeDtypeStruct((2, size, size, 15), jnp.float32)
    op_sds = jax.ShapeDtypeStruct((2, size, size, 8), jnp.float32)
    init_in = (jax.ShapeDtypeStruct((2, size, size, 12), jnp.float32),
               jax.ShapeDtypeStruct((2, size, size, 6), jnp.float32))
    rng_sds = {"params": jax.ShapeDtypeStruct((2,), jnp.uint32)}

    jax.jit(gen.init).lower(rng_sds, *init_in).compile()
    print(f"[land] jit(gen.init) @ batch-2 256x256 compiled "
          f"({time.perf_counter() - t0:.1f}s)", flush=True)

    vars_sds = jax.eval_shape(gen.init, rng_sds, *init_in)

    def fn(vars_, rgb_clip, op_clip):
        # keep in lockstep with __graft_entry__.entry()'s fn
        rgb_input, rgb_target = rgb_clip[..., :-3], rgb_clip[..., -3:]
        op_input, op_target = op_clip[..., :-2], op_clip[..., -2:]
        rgb_pred, op_pred, diffs, _ = gen.apply(
            vars_, rgb_input, op_input, False)
        return (psnr_per_frame(rgb_pred, rgb_target), diffs[0],
                psnr_per_frame(op_pred, op_target), diffs[1])

    t1 = time.perf_counter()
    jax.jit(fn).lower(vars_sds, rgb_sds, op_sds).compile()
    print(f"[land] entry fn (fused forward+score) compiled "
          f"({time.perf_counter() - t1:.1f}s)", flush=True)
    print("[land] done", flush=True)


if __name__ == "__main__":
    main()
