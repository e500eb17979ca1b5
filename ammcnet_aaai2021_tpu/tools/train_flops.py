"""Stage-2 training-step FLOP census + train MFU (VERDICT r3 item 2).

PERF.md's MFU accounting covered the inference scorer only (35.4% bf16).
The full stage-2 GAN step — G fwd+bwd, D fwd+bwd (real+fake), TWO
FlowNet-SD teacher forwards, both Adam updates, BatchNorm + EMA codebook
updates — had a measured wall time (11 ms at 256x256/b4, round 1) but no
FLOP count, so nobody knew whether training sits at 20% or 80% of peak.
The reference trains 80k iterations as its default recipe
(``/root/reference/Code/main/constant_train.py:47``) — training speed is a
first-class capability axis.

Census mode (default, CPU-only, no device touch): lowers the EXACT
production step (``train.steps.make_twostream_train_step``, bf16, XLA
memory path so the analyzer sees every op) plus its components and reads
XLA's own cost analysis.  Component programs are lowered standalone —
their sum slightly exceeds the full step (the step shares one G forward
between the G loss and the D loss's detached input).

Measure mode (``--measure``, touches the real chip): two-point
fetch-barriered timing of K chained steps — a result fetch is the only
true barrier on this tunnel (PERF.md "barrier caveat": block_until_ready
acks executions without waiting), so the round-1 11 ms/step figure (timed
per-dispatch) needs re-verification.  Prints steps/s, TFLOP/s, and MFU
against the v5e bf16 peak (197 TFLOP/s).
"""

from __future__ import annotations

import argparse
import time

V5E_BF16_PEAK = 197e12


def _build(size: int, batch: int, use_pallas: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..configs import LossConfig, NetConfig, OptimConfig
    from ..models import PixelDiscriminator, build_generator
    from ..models.flownet_sd import FlowNet2SD
    from ..train.optim import make_optimizers
    from ..train.state import create_train_state
    from ..train.steps import make_twostream_train_step

    cfg = NetConfig(use_pallas_memory=use_pallas)
    gen = build_generator(cfg)
    disc = PixelDiscriminator()
    flownet = FlowNet2SD()
    g_tx, d_tx = make_optimizers(OptimConfig())
    state = create_train_state(
        gen, disc, g_tx, d_tx, jax.random.PRNGKey(0),
        rgb_shape=(batch, size, size, 12), op_shape=(batch, size, size, 6))
    flow_vars = flownet.init({"params": jax.random.PRNGKey(1)},
                             jnp.zeros((1, size, size, 3, 2)))
    rng = np.random.default_rng(0)
    batch_data = {
        "rgb": jnp.asarray(rng.integers(0, 255, (batch, size, size, 15))
                           .astype(np.uint8)),
        "op": jnp.asarray(rng.uniform(-1, 1, (batch, size, size, 8))
                          .astype(np.float32)),
    }
    step_fn = make_twostream_train_step(
        gen, disc, flownet, LossConfig(loss_tag="twostream_vq"), g_tx, d_tx)
    return (gen, disc, flownet, state, flow_vars, batch_data, step_fn)


def _flops_of(fn, *args) -> float:
    """XLA cost analysis of the lowered (pre-optimization) module — no
    backend compile, so the census runs in seconds on the 1-core host."""
    import jax

    lowered = jax.jit(fn).lower(*args)
    cost = lowered.cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0]
    if cost is None:
        # Remote PJRT clients (the axon tunnel) don't expose HLO cost
        # analysis; the caller must pin lowering to the CPU client (FLOPs
        # are platform-independent).
        raise RuntimeError(
            "cost_analysis unavailable on this backend — run the census "
            "under jax.default_device(jax.devices('cpu')[0])")
    return float(cost["flops"])


def census(size: int = 256, batch: int = 4) -> dict:
    import jax
    import jax.numpy as jnp

    (gen, disc, flownet, state, flow_vars, batch_data, step_fn
     ) = _build(size, batch, use_pallas=False)

    rgb = (batch_data["rgb"].astype(jnp.float32) / 255.0 - 0.5) / 0.5
    rgb_input, rgb_target = rgb[..., :-3], rgb[..., -3:]
    op_input = batch_data["op"][..., :-2]

    out = {}
    out["full_step"] = _flops_of(step_fn, state, batch_data, flow_vars)

    def gen_fwd(vars_, ri, oi):
        return gen.apply(vars_, ri, oi, False)

    g_vars = {"params": state.g_params, **state.g_state}
    out["g_forward"] = _flops_of(gen_fwd, g_vars, rgb_input, op_input)

    def disc_fwd(params, x):
        return disc.apply({"params": params}, x)

    out["d_forward"] = _flops_of(disc_fwd, state.d_params, rgb_target)

    def flow_fwd(vars_, pair):
        return flownet.apply(vars_, pair)

    pair = jnp.stack([rgb_target, rgb_target], axis=-1)
    out["flownet_forward"] = _flops_of(flow_fwd, flow_vars, pair)
    return out


def measure(size: int = 256, batch: int = 4, chain: int = 30,
            use_pallas: bool = True) -> dict:
    """Fetch-barriered step timing on the default (real) device."""
    import jax

    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    (gen, disc, flownet, state, flow_vars, batch_data, step_fn
     ) = _build(size, batch, use_pallas)
    jit_step = jax.jit(step_fn)
    print(f"[measure] device={jax.devices()[0]}", flush=True)
    t0 = time.time()
    state, metrics = jit_step(state, batch_data, flow_vars)
    g0 = float(metrics["g_loss"])  # true barrier: result fetch
    print(f"[measure] warm step (compile+load) {time.time()-t0:.1f}s "
          f"g_loss={g0:.4f}", flush=True)
    # two-point timing: barrier, dispatch `chain` dependent steps, barrier.
    # The state chain forces sequential execution; the same device-resident
    # batch feeds every step (no host transfer inside the window).
    float(metrics["d_loss"])
    t0 = time.time()
    for _ in range(chain):
        state, metrics = jit_step(state, batch_data, flow_vars)
    gN = float(metrics["g_loss"])  # fetch of the LAST step's metric
    dt = time.time() - t0
    per_step = dt / chain
    print(f"[measure] {chain} chained steps in {dt:.3f}s -> "
          f"{per_step*1e3:.2f} ms/step ({1/per_step:.1f} steps/s), "
          f"g_loss={gN:.4f}", flush=True)
    return {"per_step_s": per_step, "steps_per_s": 1 / per_step}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--measure", action="store_true",
                   help="time the step on the real device (census is "
                        "CPU-only otherwise)")
    p.add_argument("--chain", type=int, default=30)
    p.add_argument("--step_ms", type=float, default=None,
                   help="skip --measure and compute MFU from this "
                        "already-measured step time")
    args = p.parse_args(argv)

    import jax

    if not args.measure:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        c = census(args.size, args.batch)
    else:
        # Census on the CPU client even when the chip is the target: the
        # axon remote PJRT client returns None from cost_analysis(), and
        # lowering/inits must not ride the tunnel just to count FLOPs.
        with jax.default_device(jax.devices("cpu")[0]):
            c = census(args.size, args.batch)
    print(f"== FLOP census (XLA cost analysis, {args.size}x{args.size} "
          f"batch {args.batch}) ==")
    for k, v in c.items():
        print(f"  {k:<18} {v/1e9:10.1f} GFLOP")
    full = c["full_step"]
    print(f"  G fwd x3 (fwd+bwd analytic) ~ {3*c['g_forward']/1e9:.1f} GFLOP;"
          f" 2x FlowNet = {2*c['flownet_forward']/1e9:.1f} GFLOP;"
          f" D fwd x5 ~ {5*c['d_forward']/1e9:.1f} GFLOP")

    step_s = None
    if args.measure:
        step_s = measure(args.size, args.batch, args.chain)["per_step_s"]
    elif args.step_ms:
        step_s = args.step_ms / 1e3
    if step_s:
        tflops = full / step_s / 1e12
        print(f"== train MFU: {full/1e9:.1f} GFLOP / {step_s*1e3:.2f} ms = "
              f"{tflops:.1f} TFLOP/s = {100*tflops*1e12/V5E_BF16_PEAK:.1f}% "
              f"of v5e bf16 peak ==")
    return c


if __name__ == "__main__":
    main()
