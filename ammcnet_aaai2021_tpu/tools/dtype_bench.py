"""int8-vs-bf16 conv throughput at the model's real layer shapes.

PERF.md's remaining inference lever ("int8 for the discriminator-free
inference path", recorded round 1) rests on the assumption that the v5e's
2x int8 MXU rate survives this model's shapes.  The MFU analysis says the
ceiling is set by MXU *underfill* — the UNet's early levels run 64-128
input channels against 128x128 MXU tiles (reference topology,
``Code/models/unet.py:8-100``) — and underfilled tiles waste lanes at any
element width.  This tool settles it by measurement: for each UNet level's
canonical 3x3 double-conv shape at the released 256x256 resolution it
times the SAME conv in bf16 (the production dtype) and int8
(int32-accumulated), device-resident.

Methodology (tunnel-proof, per PERF.md):

* All timed work happens inside ONE jitted program per (shape, dtype): a
  ``lax.fori_loop`` running ``n`` convs SERIALLY CHAINED — every level
  shape has Cin == Cout, so each conv's output (cheap elementwise
  re-ranged) is the next conv's input.  A first draft consumed only
  ``y[0,0,0,0]`` and XLA's slice-pushdown eliminated the conv entirely
  (measured "259,000 TFLOP/s" vs the 197 peak); true dependence chains
  are the only DCE-proof structure.  Weights still rotate through ``K``
  buffers.
* ``n`` is a *traced* argument, so one compiled program serves every
  repetition count — two-point timing ``(t(n_hi) - t(n_lo)) / (n_hi -
  n_lo)`` cancels the tunnel's dispatch+fetch RTT (currently 0.2-56 s)
  exactly, leaving pure device time per conv.
* The barrier is a real scalar FETCH (``block_until_ready`` acks without
  completing on this tunnel — PERF.md "Barrier caveat").

Prints a per-shape table and one JSON line with the int8 speedup per
level, so PERF.md can record the lever as open (speedup >> 1 at the
FLOP-heavy shapes) or closed (underfill dominates, dtype immaterial).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial

# Per-stream double-conv shapes of the released generator at 256x256
# (every UNet level contributes ~equal MACs: spatial quarters while
# channels double; reference topology unet.py:61-100, ours blocks.py).
# (name, H, W, Cin, Cout)
LEVEL_SHAPES = [
    ("L1 256x256 64->64", 256, 256, 64, 64),
    ("L2 128x128 128->128", 128, 128, 128, 128),
    ("L3 64x64 256->256", 64, 64, 256, 256),
    ("L4 32x32 512->512", 32, 32, 512, 512),
]


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=32,
                   help="conv batch (windows); 32 keeps L1 activations "
                        "(32,256,256,64) at 128 MB bf16")
    p.add_argument("--k_weights", type=int, default=8,
                   help="distinct weight buffers rotated through the loop")
    p.add_argument("--n_lo", type=int, default=64)
    p.add_argument("--n_hi", type=int, default=512)
    p.add_argument("--trials", type=int, default=2,
                   help="timing trials per point; min is reported (two-"
                        "point subtraction already cancels constant RTT)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    t0 = time.perf_counter()

    def hb(msg):
        print(f"[dtype_bench +{time.perf_counter() - t0:6.1f}s] {msg}",
              file=sys.stderr, flush=True)

    dn = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))

    def make_loop(dtype_name):
        if dtype_name == "int8":
            in_dtype, acc_dtype = jnp.int8, jnp.int32
        else:
            in_dtype, acc_dtype = jnp.bfloat16, jnp.float32

        @partial(jax.jit, static_argnames=())
        def loop(x, ws, n):
            k = ws.shape[0]

            def body(i, x):
                y = lax.conv_general_dilated(
                    x, ws[i % k], window_strides=(1, 1), padding="SAME",
                    dimension_numbers=dn,
                    preferred_element_type=acc_dtype)
                # elementwise re-range back to the input dtype (values are
                # irrelevant for MXU timing; the dependence is what counts)
                if in_dtype == jnp.int8:
                    return (y & 127).astype(jnp.int8)
                return (y * 0.01).astype(jnp.bfloat16)

            out = lax.fori_loop(0, n, body, x)
            return out.astype(jnp.float32).mean()

        return loop, in_dtype

    dev = jax.devices()[0]
    hb(f"device: {dev.device_kind}")

    results = {}
    for name, h, w, cin, cout in LEVEL_SHAPES:
        macs = args.batch * h * w * cin * cout * 9  # 3x3 SAME conv
        gflop = macs * 2 / 1e9
        row = {}
        for dtype_name in ("bf16", "int8"):
            loop, in_dtype = make_loop(dtype_name)
            key = jax.random.PRNGKey(0)
            if in_dtype == jnp.int8:
                x = jax.random.randint(key, (args.batch, h, w, cin),
                                       -127, 127, jnp.int8)
                ws = jax.random.randint(jax.random.PRNGKey(1),
                                        (args.k_weights, 3, 3, cin, cout),
                                        -127, 127, jnp.int8)
            else:
                x = jax.random.normal(key, (args.batch, h, w, cin),
                                      jnp.bfloat16)
                ws = jax.random.normal(jax.random.PRNGKey(1),
                                       (args.k_weights, 3, 3, cin, cout),
                                       jnp.bfloat16)
            x, ws = jax.device_put((x, ws), dev)
            # compile + warm (n traced: one program serves both points)
            float(loop(x, ws, jnp.int32(1)))
            hb(f"{name} {dtype_name}: program warm")

            def timed(n):
                best = float("inf")
                for _ in range(args.trials):
                    t = time.perf_counter()
                    float(loop(x, ws, jnp.int32(n)))  # fetch = true barrier
                    best = min(best, time.perf_counter() - t)
                return best

            t_lo, t_hi = timed(args.n_lo), timed(args.n_hi)
            per_conv = max(t_hi - t_lo, 1e-9) / (args.n_hi - args.n_lo)
            tflops = gflop / per_conv / 1e3
            row[dtype_name] = {"per_conv_ms": per_conv * 1e3,
                               "tflops": tflops}
            hb(f"{name} {dtype_name}: {per_conv*1e3:.3f} ms/conv "
               f"({tflops:.1f} T{'OP' if dtype_name=='int8' else 'FLOP'}/s; "
               f"t_lo={t_lo:.2f}s t_hi={t_hi:.2f}s)")
        row["int8_speedup"] = (row["bf16"]["per_conv_ms"]
                               / row["int8"]["per_conv_ms"])
        results[name] = row

    print(f"\n{'shape':<24} {'bf16 ms':>9} {'int8 ms':>9} {'speedup':>8}")
    for name, row in results.items():
        print(f"{name:<24} {row['bf16']['per_conv_ms']:>9.3f} "
              f"{row['int8']['per_conv_ms']:>9.3f} "
              f"{row['int8_speedup']:>8.2f}x")

    print(json.dumps({
        "metric": "int8_conv_speedup_by_level",
        "batch": args.batch,
        "value": {n: round(r["int8_speedup"], 3)
                  for n, r in results.items()},
    }))


if __name__ == "__main__":
    main()
