"""Export a generator checkpoint as a self-contained serving artifact.

The reference's deploy story rebuilds the Python model zoo and loads a
torch ``.pth`` per serving process (``Code/run_helper/test_helper.py:
503-518``).  This CLI replaces it with an ahead-of-time artifact: the
fused multi-video chunk scorer — the exact program ``bench.py`` and
``run_test`` execute — serialized once as versioned StableHLO with the
weights baked in (:mod:`ammcnet_aaai2021_tpu.eval.export`).  A serving
process calls ``load_scorer(path)`` and needs no model code, no
checkpoint format, and no tracing.

``--int8`` exports the quantized forward (``models/quantized``: BN-folded
per-channel int8 weights) with activation scales CALIBRATED on training
clips of the target dataset — measured 1.27x the bf16 scorer on a v5e
(PERF.md); dynamic scales are not offered here because the per-call
max|x| pass costs the entire int8 win.

Prints one JSON line: the artifact header plus path/bytes.
"""

from __future__ import annotations

import argparse
import json
import os


def parser_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset_name", required=True,
                   choices=["ped2", "avenue", "shanghaitech", "toydata"])
    p.add_argument("--data_dir", default="",
                   help="dataset root; required with --int8 (calibration "
                        "clips come from <data_dir>/<dataset>/training)")
    p.add_argument("--ckptfile", default="",
                   help="orbax step dir / flax .msgpack / torch .pth of "
                        "the generator; random init if omitted (smoke)")
    p.add_argument("--out", required=True, help="artifact output path")
    p.add_argument("--image_size", type=int, default=0)
    p.add_argument("--n_videos", type=int, default=6,
                   help="videos per serving chunk (bench.py default: 6)")
    p.add_argument("--frames", type=int, default=192,
                   help="bucket-padded frames per video")
    p.add_argument("--window_batch", type=int, default=192)
    p.add_argument("--int8", action="store_true",
                   help="quantized forward with calibrated activation "
                        "scales (needs --data_dir)")
    p.add_argument("--calib_batches", type=int, default=4,
                   help="calibration batches (of --calib_batch_size "
                        "training clips each) for --int8")
    p.add_argument("--calib_batch_size", type=int, default=8)
    p.add_argument("--platforms", default="",
                   help="comma-separated lowering platforms (e.g. "
                        "'tpu' or 'cpu,tpu'); default: current backend")
    p.add_argument("--check", action="store_true",
                   help="reload the artifact and verify it reproduces the "
                        "live scorer on one synthetic chunk")
    return p.parse_args(argv)


def main(argv=None) -> dict:
    args = parser_args(argv)
    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from ..configs import preset
    from ..eval.export import save_scorer
    from ..models import build_model
    from ..utils.logging_utils import get_logger

    logger = get_logger("export_model")
    cfg = preset(args.dataset_name, mode="testing", data_dir=args.data_dir)
    if args.image_size:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, net=dataclasses.replace(cfg.net, image_size=args.image_size),
            data=dataclasses.replace(cfg.data, image_size=args.image_size))

    model = build_model(cfg.net, mode="testing", per_sample_diff=True)
    gen = model.generator
    size = cfg.data.image_size
    variables = gen.init({"params": jax.random.PRNGKey(cfg.seed)},
                         jnp.zeros((1, size, size, cfg.net.in_channel[0])),
                         jnp.zeros((1, size, size, cfg.net.in_channel[1])))
    if args.ckptfile:
        from ..train.checkpoint import load_generator_variables

        variables = load_generator_variables(args.ckptfile, variables,
                                             cfg.net.net_tag)
        logger.info("loaded checkpoint %s", args.ckptfile)
    else:
        logger.warning("no checkpoint: exporting RANDOM weights (smoke)")

    apply_fn = None
    export_vars = variables
    meta = {"forward": "bf16", "dataset": args.dataset_name,
            "ckptfile": os.path.abspath(args.ckptfile) if args.ckptfile
            else ""}
    if args.int8:
        if not args.data_dir:
            raise SystemExit("--int8 needs --data_dir (calibration clips)")
        from ..models.quantized import calibrated_int8_from_dataset

        apply_fn, export_vars = calibrated_int8_from_dataset(
            cfg.net, variables, args.data_dir, args.dataset_name, size,
            args.calib_batches, args.calib_batch_size)
        meta.update(forward="int8-calibrated",
                    calib_clips=args.calib_batches * args.calib_batch_size)
        logger.info("calibrated %d activation sites on %d clips", 40,
                    meta["calib_clips"])

    platforms = tuple(args.platforms.split(",")) if args.platforms else None
    header = save_scorer(args.out, gen, export_vars,
                         n_videos=args.n_videos, frames=args.frames,
                         size=size, window_batch=args.window_batch,
                         platforms=platforms, apply_fn=apply_fn,
                         extra_meta=meta)
    result = dict(header, path=os.path.abspath(args.out),
                  bytes=os.path.getsize(args.out))

    if args.check:
        import numpy as np

        from ..eval.infer import make_multi_video_scorer
        from ..eval.export import load_scorer

        score_chunk, _ = load_scorer(args.out)
        rng = np.random.default_rng(0)
        rgbs = tuple(jnp.asarray(rng.integers(
            0, 255, (args.frames, size, size, 3)), jnp.uint8)
            for _ in range(args.n_videos))
        ops = tuple(jnp.asarray(rng.normal(
            0, 0.02, (args.frames - 1, size, size, 2)), jnp.bfloat16)
            for _ in range(args.n_videos))
        got = np.asarray(score_chunk(rgbs, ops), np.float32)
        live = make_multi_video_scorer(gen, export_vars,
                                       window_batch=args.window_batch,
                                       apply_fn=apply_fn)
        want = np.asarray(live(rgbs, ops), np.float32)
        max_diff = float(np.max(np.abs(got - want)))
        result["check_max_diff"] = max_diff
        # bf16 compute: export-lowered vs live programs fuse differently,
        # so scores (PSNR-scale, ~10-40) can differ by bf16 ulps
        if not np.allclose(got, want, rtol=1e-3, atol=1e-2):
            raise SystemExit(f"artifact check FAILED: max diff {max_diff}")
        logger.info("artifact check ok (max diff %.3g)", max_diff)

    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
