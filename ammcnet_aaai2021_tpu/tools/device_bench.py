"""Device-resident pipeline ceiling: windows/s with zero host transfers.

``bench.py`` measures the full serving path (JPEG decode + upload +
score), which in this environment is bounded by the axon tunnel's
oscillating transfer bandwidth (PERF.md).  This tool measures the number
that projects to co-located hardware: the fused score pipeline's rate when
the videos already live in HBM — window assembly + normalize + two-stream
forward + memory addressing + PSNR/commit scoring via the same
``jit_score_chunk`` program the bench runs, on data GENERATED ON DEVICE
(one tiny jitted PRNG program; no uploads), with one 18 KB result fetch
per pass as the execution barrier.

Replaces the reference's per-frame-synced GPU loop measurement
(``Code/run_helper/test_helper.py:387-488``, 17.597 fps wall-clock) at the
other extreme: what the chip itself sustains.

Prints one JSON line {"metric": "device_resident_frames_per_sec", ...}.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--chunk", type=int, default=6,
                   help="videos per jit dispatch (bench.py default: 6)")
    p.add_argument("--frames", type=int, default=192,
                   help="bucket-padded frames per video")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--window_batch", type=int, default=192,
                   help="windows per batch; 192 = whole padded video in "
                        "one batch (745 windows/s vs 584 at 64)")
    p.add_argument("--passes", type=int, default=5)
    p.add_argument("--otf", action="store_true",
                   help="also time the bench's on-device FlowNet-SD flow "
                        "extraction (grayscale u8 -> padded (rgb, flows)) "
                        "chained into the chunk scorer — the device-resident "
                        "ceiling of the FULL OTF pipeline, and (by "
                        "difference vs the score-only passes) the extract "
                        "program's own cost")
    p.add_argument("--true_frames", type=int, default=180,
                   help="true (pre-padding) frames per video in --otf mode")
    p.add_argument("--int8", action="store_true",
                   help="run the int8 quantized forward (models/quantized: "
                        "BN-folded, per-channel int8 weights, dynamic "
                        "per-tensor activation scales) — the dtype_bench "
                        "lever, measured end-to-end")
    p.add_argument("--calibrated", action="store_true",
                   help="with --int8: calibrate static activation scales "
                        "on 8 windows first (calibrate_act_scales) — "
                        "removes the dynamic max|x| reduction pass that "
                        "costs the whole int8 win (PERF.md)")
    p.add_argument("--no_resident", action="store_true",
                   help="with --int8 --calibrated: disable int8 residency "
                        "(conv0->conv1 activations stored bf16 instead of "
                        "int8) — the A/B control for the residency lever; "
                        "bit-identical scores either way")
    p.add_argument("--folded", action="store_true",
                   help="run the folded two-stream forward (models/folded: "
                        "both streams' convs as ONE vmapped/grouped stack) "
                        "instead of the unfolded generator — the PERF.md "
                        "'fold the encoders' lever, measured")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from ..configs import NetConfig
    from ..eval.infer import make_multi_video_scorer
    from ..models import build_generator

    t0 = time.perf_counter()

    def hb(msg):
        print(f"[device_bench +{time.perf_counter() - t0:6.1f}s] {msg}",
              file=sys.stderr, flush=True)

    cfg = NetConfig()  # released config: bf16 compute + Pallas memory
    gen = build_generator(cfg, per_sample_diff=True)
    variables = jax.jit(gen.init)(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, args.size, args.size, 12)),
        jnp.zeros((1, args.size, args.size, 6)))
    jax.block_until_ready(variables)
    hb("model ready")

    @jax.jit
    def synth(key):
        # random (not zeros): constant-foldable inputs could let XLA skip
        # real work; PRNG generation runs once on device, outside timing
        k1, k2 = jax.random.split(key)
        rgb = jax.random.randint(
            k1, (args.frames, args.size, args.size, 3), 0, 255, jnp.uint8)
        op = (jax.random.normal(
            k2, (args.frames - 1, args.size, args.size, 2)) * 0.02
        ).astype(jnp.bfloat16)
        return rgb, op

    videos = [synth(jax.random.PRNGKey(i)) for i in range(args.chunk)]
    jax.block_until_ready(videos)
    hb(f"{args.chunk} videos generated on device")

    import numpy as np

    if args.int8:
        from ..models.quantized import (make_quantized_forward,
                                        quantize_twostream_variables)

        qfwd = make_quantized_forward(embed_dim=cfg.embed_dim,
                                      n_embed=cfg.n_embed, k=cfg.k,
                                      per_sample_diff=True,
                                      use_pallas=cfg.use_pallas_memory,
                                      resident=not args.no_resident)
        qvars = quantize_twostream_variables(variables)
        jax.block_until_ready(qvars)
        hb("variables quantized (BN-folded, int8 per-channel)")
        if args.calibrated:
            from ..models.quantized import calibrate_act_scales

            # 8 windows off video 0, assembled + normalized exactly as the
            # scorer's stack_windows does (infer.py)
            rgb_u8, op_v = videos[0]

            def windows(video, t):
                w = jnp.stack([video[i:i + t] for i in range(8)])
                b, _, h, wd, c = w.shape
                return jnp.transpose(w, (0, 2, 3, 1, 4)
                                     ).reshape(b, h, wd, t * c)

            rgb_w = (windows(rgb_u8, 5).astype(jnp.float32) / 255. - .5) / .5
            op_w = windows(op_v, 4)
            qvars = calibrate_act_scales(
                qfwd, qvars, [(rgb_w[..., :12], op_w[..., :6])])
            hb("activation scales calibrated (8 windows, static)")
        scorer = make_multi_video_scorer(gen, qvars,
                                         window_batch=args.window_batch,
                                         apply_fn=qfwd)
    elif args.folded:
        from ..models.folded import (fold_twostream_variables,
                                     make_folded_forward)

        fwd = make_folded_forward(embed_dim=cfg.embed_dim,
                                  n_embed=cfg.n_embed, k=cfg.k,
                                  dtype=jnp.bfloat16, per_sample_diff=True)

        def folded_apply(vars_, rgb_input, op_input):
            rgb_pred, op_pred, diffs = fwd(vars_[0], vars_[1],
                                           rgb_input, op_input)
            return rgb_pred, op_pred, diffs, None

        folded_vars = fold_twostream_variables(variables)
        jax.block_until_ready(folded_vars)
        hb("variables folded (stream-stacked)")
        scorer = make_multi_video_scorer(gen, folded_vars,
                                         window_batch=args.window_batch,
                                         apply_fn=folded_apply)
    else:
        scorer = make_multi_video_scorer(gen, variables,
                                         window_batch=args.window_batch)
    rgbs = tuple(r for r, _ in videos)
    ops = tuple(o for _, o in videos)
    # warm execute: absorbs compile (persistent cache) + program load.
    # The barrier MUST be a result fetch: this environment's
    # block_until_ready acks without waiting for execution (verified —
    # it timed a 93-GMAC-per-window program at 0.0005 s)
    np.asarray(scorer(rgbs, ops))
    hb("warm execute done (fetch barrier)")

    n_windows = args.frames - 5 + 1
    frames_per_pass = args.chunk * args.frames
    rates = []
    for i in range(args.passes):
        t = time.perf_counter()
        np.asarray(scorer(rgbs, ops))  # 18 KB fetch = execution barrier
        dt = time.perf_counter() - t
        rates.append(frames_per_pass / dt)
        hb(f"pass {i + 1}/{args.passes}: {dt:.3f}s "
           f"({args.chunk * n_windows / dt:.0f} windows/s)")
    fps = statistics.median(rates)
    out = {
        "metric": "device_resident_frames_per_sec",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "windows_per_sec": round(fps / frames_per_pass
                                 * args.chunk * n_windows, 1),
        "config": {"chunk": args.chunk, "frames": args.frames,
                   "size": args.size, "window_batch": args.window_batch},
    }

    if args.otf:
        # The bench's OTF path, device-resident: u8 gray frames already in
        # HBM -> extract program (broadcast to 3ch, edge-pad to the bucket,
        # FlowNet-SD over all consecutive pairs, flow normalize) -> the same
        # chunk scorer.  The extract program is the exact one bench.py runs
        # (cache hit); only the tiny u8 PRNG synth is a new program shape.
        import ml_dtypes  # noqa: F401  (parity with bench.py's import)

        from ..eval.infer import make_otf_flow_extractor
        from ..models.flownet_sd import FlowNet2SD

        hb("init FlowNet-SD on CPU; uploading bf16 weights")
        flownet = FlowNet2SD()
        with jax.default_device(jax.devices("cpu")[0]):
            flow_vars = jax.jit(flownet.init)(
                {"params": jax.random.PRNGKey(1)},
                jnp.zeros((1, 64, 64, 3, 2)))
        import numpy as _np
        flow_vars = jax.device_put(jax.tree.map(
            lambda a: (_np.asarray(a).astype("bfloat16")
                       if _np.asarray(a).dtype == _np.float32
                       else _np.asarray(a)), flow_vars))
        extractor = make_otf_flow_extractor(flownet, flow_vars,
                                            pad_to=args.frames, gray=True)

        @jax.jit
        def synth_u8(key):
            return jax.random.randint(
                key, (args.true_frames, args.size, args.size, 1), 0, 255,
                jnp.uint8)

        raw = [synth_u8(jax.random.PRNGKey(100 + i))
               for i in range(args.chunk)]
        jax.block_until_ready(raw)
        hb(f"{args.chunk} u8 gray videos generated on device")

        def otf_pass():
            pairs = [extractor(r) for r in raw]
            return np.asarray(scorer(tuple(r for r, _ in pairs),
                                     tuple(o for _, o in pairs)))

        otf_pass()  # warm (extract program load; scorer already warm)
        hb("otf warm execute done (fetch barrier)")
        otf_rates = []
        for i in range(args.passes):
            t = time.perf_counter()
            otf_pass()
            dt = time.perf_counter() - t
            otf_rates.append(frames_per_pass / dt)
            hb(f"otf pass {i + 1}/{args.passes}: {dt:.3f}s "
               f"({frames_per_pass / dt:.0f} fps)")
        otf_fps = statistics.median(otf_rates)
        # extract cost per pass, by difference (score-only vs extract+score)
        extract_s = frames_per_pass / otf_fps - frames_per_pass / fps
        out["otf_frames_per_sec"] = round(otf_fps, 1)
        out["extract_seconds_per_pass"] = round(extract_s, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
