"""Probe the TPU tunnel's health: RPC latency, H2D/D2H bandwidth, compute.

This environment reaches its one TPU chip through an experimental tunnel
whose characteristics swing wildly by the hour (measured here: H2D 0.07 s to
17 s for 35 MB; D2H 0.1 s to 177 s for 35 MB; remote compiles 2 s to 10+ min
for the same program).  Every end-to-end throughput number is meaningless
without knowing the tunnel state it was measured under — run this first and
record its output next to any benchmark figure (PERF.md does).

Usage: python -m ammcnet_aaai2021_tpu.tools.tunnel_probe [--model] [--quick]

``--quick`` skips the D2H leg (it has measured 732 s for 35 MB at degraded
hours; the bench only fetches ~KB so H2D + tiny-op RTT is usually the
question being asked).  A watchdog prints WEDGED and exits 3 if the
backend/first op doesn't respond within --wedge-timeout (default 120 s) —
when the tunnel is fully wedged even backend init blocks forever (the axon
hook's jax_platforms override makes the first jax.devices() call dial it).
"""

from __future__ import annotations

import os
import sys
import threading
import time

import numpy as np

_T0 = time.perf_counter()


def hb(msg: str) -> None:
    print(f"[probe +{time.perf_counter() - _T0:6.1f}s] {msg}", flush=True)


def _arm_wedge_watchdog(timeout_s: float) -> threading.Event:
    """Exit 3 with a WEDGED verdict if the probe makes no progress: a hung
    PJRT init cannot be interrupted from Python, so a daemon timer +
    os._exit is the only reliable bound."""
    alive = threading.Event()

    def watch():
        time.sleep(timeout_s)
        if not alive.is_set():
            hb(f"WEDGED: no backend/op response in {timeout_s:.0f}s — the "
               "tunnel is not answering; every jax process on this host "
               "will hang at first device touch")
            os._exit(3)

    threading.Thread(target=watch, daemon=True, name="wedge-watch").start()
    return alive


def main(argv=None) -> dict:
    argv = list(argv or [])
    wedge_timeout = 120.0
    for a in argv:
        if a.startswith("--wedge-timeout="):
            wedge_timeout = float(a.split("=", 1)[1])
    alive = _arm_wedge_watchdog(wedge_timeout)

    import jax
    import jax.numpy as jnp

    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    out = {}
    dev = jax.devices()[0]
    hb(f"device: {dev} ({dev.client.platform_version.splitlines()[0]})")

    t = time.perf_counter()
    _ = np.asarray(jnp.ones((8, 8)) + 1)  # fetch = the only true barrier
    alive.set()  # backend answered: not wedged
    out["tiny_op_roundtrip_s"] = time.perf_counter() - t
    hb(f"tiny-op roundtrip: {out['tiny_op_roundtrip_s']:.3f}s")

    buf = np.random.default_rng(0).integers(
        0, 255, (180, 256, 256, 3), np.uint8)  # 35 MB
    t = time.perf_counter()
    d = jax.device_put(buf)
    jax.block_until_ready(d)
    out["h2d_35mb_s"] = time.perf_counter() - t
    hb(f"H2D 35MB burst: {out['h2d_35mb_s']:.2f}s "
       f"({35 / out['h2d_35mb_s']:.0f} MB/s) — local ack; sustained rate "
       "is typically 10-20x lower (PERF.md)")

    if "--quick" not in argv:
        t = time.perf_counter()
        _ = np.asarray(d)
        out["d2h_35mb_s"] = time.perf_counter() - t
        hb(f"D2H 35MB: {out['d2h_35mb_s']:.2f}s "
           f"({35 / out['d2h_35mb_s']:.0f} MB/s)")

    if argv and "--model" in argv:
        from ..configs import NetConfig
        from ..eval.infer import (make_video_scorer, pad_video_to_bucket,
                                  upload_video)
        from ..models import build_generator

        cfg = NetConfig()
        gen = build_generator(cfg, per_sample_diff=True)
        t = time.perf_counter()
        variables = jax.jit(gen.init)(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 256, 256, 12)), jnp.zeros((1, 256, 256, 6)))
        jax.block_until_ready(variables)
        out["jit_init_s"] = time.perf_counter() - t
        hb(f"jit init (cached program): {out['jit_init_s']:.2f}s")
        scorer = make_video_scorer(gen, variables, window_batch=64)
        flows = np.random.default_rng(1).normal(
            0, 0.02, (179, 256, 256, 2)).astype(np.float32)
        rgb, op, _ = pad_video_to_bucket(buf, flows)
        t = time.perf_counter()
        v_rgb, v_op = upload_video(rgb, op)
        jax.block_until_ready((v_rgb, v_op))
        out["video_upload_s"] = time.perf_counter() - t
        hb(f"video upload (u8 + bf16 flows): {out['video_upload_s']:.2f}s")
        r = scorer(v_rgb, v_op, jnp.arange(64))
        np.asarray(r[0])  # program-load + first execution; must be a FETCH —
        # this tunnel's block_until_ready acks dispatch without waiting for
        # execution (PERF.md barrier caveat), which would let the timed loop
        # absorb the program load AND finish "instantly"
        t = time.perf_counter()
        for s in range(0, 176, 64):
            i = np.arange(s, min(s + 64, 176))
            i = np.pad(i, (0, 64 - len(i)), mode="edge")
            r = scorer(v_rgb, v_op, jnp.asarray(i))
        np.asarray(r[0])  # tiny (64-float) fetch: the only true barrier
        dt = time.perf_counter() - t
        out["windows_per_s"] = 176 / dt
        hb(f"176 windows in {dt:.2f}s = {out['windows_per_s']:.0f} windows/s")
    hb("probe done")
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
