"""Test/evaluation entry point.

Mirrors ``python -m Code.main.run_test`` (``Code/main/run_test.py`` +
``constant_test.py`` + ``test_helper.evaluate_img_pred_fea_comm_twostream``):
load the generator checkpoint, run batched two-stream scoring per sub-video,
pickle the per-frame records in the golden schema, fuse + AUC, and print the
reference's output format ("the optimal auc = ...").

Flags mirror the reference CLI surface (--dataset_name, --exp_tag,
--ckptfile, ...) with data paths made explicit (--data_dir) instead of
hard-coded /p300 mounts.

Usage:
  python -m ammcnet_aaai2021_tpu.runners.run_test \
      --dataset_name ped2 --data_dir /data --ckptfile runs/.../000080
"""

from __future__ import annotations

import argparse
import os
import pickle

import jax


def parser_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset_name", required=True,
                   choices=["ped2", "avenue", "shanghaitech", "toydata"])
    p.add_argument("--data_dir", required=True,
                   help="dataset root: <data_dir>/<dataset>/testing/{frames,flows}")
    p.add_argument("--ckptfile", default="",
                   help="orbax checkpoint step dir or flax .msgpack of the "
                        "generator variables; random init if omitted (smoke)")
    p.add_argument("--exp_tag", default="",
                   help="resolve run dir + train-time config from the registry")
    p.add_argument("--registry", default="runs/registry.json")
    p.add_argument("--save_dir", default="eval_out")
    p.add_argument("--batch_size", type=int, default=16,
                   help="record granularity (reference DataLoader batch; "
                        "used by --batch_commit and the per-batch scorer)")
    p.add_argument("--window_batch", type=int, default=0,
                   help="windows per device dispatch (0 = auto: whole "
                        "bucket for the video scorer, batch_size for the "
                        "per-batch scorer); scores are batching-invariant")
    p.add_argument("--eval_type", default="img_pred_fea_comm_rgb_auc",
                   choices=["img_pred_fea_comm_rgb_auc",
                            "precision_recall_auc", "compute_eer"],
                   help="evaluation dispatch (reference "
                        "eval_metric.py:442-454)")
    p.add_argument("--metric", default="psnr",
                   choices=["psnr", "mse", "ssim"],
                   help="per-frame prediction-quality metric "
                        "(reference loss_func_mapp)")
    p.add_argument("--op_metric", default="",
                   choices=["", "psnr", "mse", "ssim", "epe"],
                   help="motion-stream metric override; 'epe' is the "
                        "flow-native endpoint error (reference "
                        "utils.py:151-152) — op records only, the headline "
                        "fused score uses rgb records")
    p.add_argument("--lam_fea_comm", type=float, default=None)
    p.add_argument("--lam_smooth", type=float, default=None)
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--batch_commit", action="store_true",
                   help="reference-exact commit scores: one batch-mean "
                        "fea_comm value replicated over each window batch "
                        "(test_helper.py:446) instead of per-frame")
    p.add_argument("--reproduce_op_psnr_bug", action="store_true",
                   help="reference-exact op-stream psnr records (the torch "
                        "loop broadcasts the prediction against the 3-field "
                        "input stack, test_helper.py:434-436)")
    p.add_argument("--scorer_mode", default="auto",
                   choices=["auto", "batch", "video"],
                   help="'video' scores a whole sub-video per jit dispatch "
                        "(right on co-located chips); 'batch' uses small "
                        "window-batch programs (right behind remote-compile "
                        "tunnels); 'auto' picks by backend")
    p.add_argument("--native_loader", action="store_true",
                   help="decode frames/flows with the C++ loader (builds on "
                        "first use; decode differs from cv2 by <=1 LSB)")
    p.add_argument("--fix_flow_bug", action="store_true",
                   help="use the corrected flow-channel loader (default "
                        "reproduces the reference bug for ckpt parity)")
    p.add_argument("--on_the_fly_flow", action="store_true",
                   help="extract optical flow on-device with FlowNet2-SD "
                        "instead of reading precomputed .flo files")
    p.add_argument("--flownet_ckpt", default="",
                   help="FlowNet2-SD torch .pth for --on_the_fly_flow")
    p.add_argument("--gray_upload", action="store_true",
                   help="with --on_the_fly_flow on a GRAYSCALE dataset "
                        "(ped2): upload one u8 channel per frame and "
                        "broadcast to 3 on device — 1/3 the host->device "
                        "bytes, bit-identical scores (guarded: fails loudly "
                        "on color data)")
    p.add_argument("--int8", action="store_true",
                   help="serve the quantized forward (models/quantized: "
                        "BN-folded per-channel int8 weights, activation "
                        "scales calibrated on <data_dir>/<dataset>/training "
                        "clips) — 1.26x the bf16 scorer on a v5e (PERF.md)")
    p.add_argument("--calib_clips", type=int, default=32,
                   help="training clips for --int8 calibration")
    return p.parse_args(argv)


def main(argv=None) -> dict:
    args = parser_args(argv)
    if jax.process_count() > 1:
        # belt-and-braces: establish the cross-process collective context
        # BEFORE any heavy per-rank work (model build, compiles) can skew
        # the ranks past gloo's ~30 s context-init deadline.  Callers should
        # still prefer multihost.initialize() — see warm_collectives().
        from ..parallel.multihost import warm_collectives

        warm_collectives()
    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from ..configs import FUSION_LAMBDAS, preset
    from ..eval.gt import GroundTruthLoader
    from ..eval.infer import score_dataset
    from ..eval.scoring import evaluate
    from ..models import build_model
    from ..train.checkpoint import load_generator_variables
    from ..utils.logging_utils import get_logger
    from ..utils.registry import load_run_config, resolve_run

    logger = get_logger("run_test", os.path.join(args.save_dir, "log_dir"))

    if args.exp_tag:
        run_dir = resolve_run(args.registry, args.exp_tag)
        cfg = load_run_config(run_dir)
        logger.info("resolved exp_tag %s -> %s", args.exp_tag, run_dir)
    else:
        cfg = preset(args.dataset_name, mode="testing", data_dir=args.data_dir)
    if args.image_size:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, net=dataclasses.replace(cfg.net, image_size=args.image_size),
            data=dataclasses.replace(cfg.data, image_size=args.image_size))

    if jax.process_count() > 1:
        # multi-host evaluation is per-host parallel (each host scores its
        # video shard); pin this process's computations to ITS devices —
        # without this, init/jit default to global placement and the scorer
        # would close over non-addressable arrays
        jax.config.update("jax_default_device", jax.local_devices()[0])

    model = build_model(cfg.net, mode="testing", per_sample_diff=True)
    gen = model.generator

    size = cfg.data.image_size
    rgb_shape = (1, size, size, cfg.net.in_channel[0])
    op_shape = (1, size, size, cfg.net.in_channel[1])
    import jax.numpy as jnp

    variables = gen.init({"params": jax.random.PRNGKey(cfg.seed)},
                         jnp.zeros(rgb_shape), jnp.zeros(op_shape))

    ckptfile = args.ckptfile
    if not ckptfile and args.exp_tag:
        # resolve the run's latest training checkpoint automatically
        from ..train.checkpoint import latest_step

        ckpt_dir = os.path.join(run_dir, "training", "checkpoints")
        step = latest_step(ckpt_dir)
        if step is not None:
            ckptfile = os.path.join(ckpt_dir, f"{step:06d}")
    if ckptfile:
        # format dispatch + device commit shared with runners/export_model
        variables = load_generator_variables(ckptfile, variables,
                                             cfg.net.net_tag)
        logger.info("loaded checkpoint %s", ckptfile)
    else:
        logger.warning("no checkpoint: scoring with RANDOM weights (smoke run)")

    flow_extractor = None
    if args.on_the_fly_flow:
        from ..eval.infer import make_otf_flow_extractor
        from ..models.flownet_sd import FlowNet2SD

        flownet = FlowNet2SD()
        flow_vars = flownet.init(
            {"params": jax.random.PRNGKey(1)},
            jnp.zeros((1, size, size, 3, 2)))
        if args.flownet_ckpt:
            from ..tools.torch_convert import convert_flownet_sd

            flow_vars = convert_flownet_sd(args.flownet_ckpt)
            logger.info("loaded FlowNet2-SD from %s", args.flownet_ckpt)
        else:
            logger.warning("--on_the_fly_flow without --flownet_ckpt: "
                           "random FlowNet weights (smoke only)")
        flow_extractor = make_otf_flow_extractor(
            flownet, flow_vars, reproduce_flow_bug=not args.fix_flow_bug,
            gray=args.gray_upload)
    elif args.gray_upload:
        raise SystemExit("--gray_upload requires --on_the_fly_flow (the "
                         "device-side broadcast lives in the extract program)")

    apply_fn = None
    if args.int8:
        from ..models.quantized import calibrated_int8_from_dataset

        apply_fn, variables = calibrated_int8_from_dataset(
            cfg.net, variables, args.data_dir, args.dataset_name, size,
            calib_batches=max(1, args.calib_clips // 8),
            calib_batch_size=min(8, args.calib_clips))
        logger.info("serving int8 (calibrated on %d training clips)",
                    args.calib_clips)

    rgb_root = os.path.join(args.data_dir, args.dataset_name, "testing", "frames")
    op_root = os.path.join(args.data_dir, args.dataset_name, "testing", "flows")
    multihost = jax.process_count() > 1
    result, fps = score_dataset(
        gen, variables, rgb_root, op_root, args.dataset_name,
        clip_len_rgb=cfg.data.clip_length_rgb,
        clip_len_op=cfg.data.clip_length_op,
        batch_size=args.batch_size,
        window_batch=args.window_batch or None, image_size=size,
        reproduce_flow_bug=not args.fix_flow_bug, logger=logger,
        flow_extractor=flow_extractor, metric=args.metric,
        op_metric=args.op_metric or None,
        batch_commit=args.batch_commit,
        reproduce_op_psnr_bug=args.reproduce_op_psnr_bug,
        use_native_loader=args.native_loader,
        shard_dir=(os.path.join(args.save_dir, "record_shards")
                   if multihost else None),
        scorer_mode=args.scorer_mode, apply_fn=apply_fn)
    if multihost and jax.process_index() != 0:
        # records were merged by rank 0; this rank only contributed scores
        logger.info("rank %d done (%.3f local fps)", jax.process_index(), fps)
        return {"fps": fps, "rank": jax.process_index()}

    pickle_dir = os.path.join(args.save_dir, args.eval_type, "save_pickle")
    os.makedirs(pickle_dir, exist_ok=True)
    pickle_path = os.path.join(pickle_dir, args.dataset_name)
    with open(pickle_path, "wb") as fh:
        pickle.dump(result, fh, pickle.HIGHEST_PROTOCOL)
    logger.info("records pickled to %s", pickle_path)

    # direct lookup (every CLI-accepted dataset has an explicit entry,
    # toydata included) — an unknown name fails loudly instead of silently
    # inheriting ped2's lambdas
    lam = FUSION_LAMBDAS[args.dataset_name]
    if args.lam_fea_comm is not None:
        lam = (args.lam_fea_comm, lam[1])
    if args.lam_smooth is not None:
        lam = (lam[0], args.lam_smooth)
    logger.info("fusion lambdas: lam_fea_comm=%g lam_smooth=%g (%s%s)",
                lam[0], lam[1], args.dataset_name,
                " preset" if args.lam_fea_comm is None
                and args.lam_smooth is None else ", CLI override")
    lengths = [len(a) for a in result["rgb_img_pred_records"]]
    gt = GroundTruthLoader(args.data_dir)(args.dataset_name,
                                          video_lengths=lengths)
    summary = evaluate(pickle_path, lam=lam, gt=gt,
                       eval_type=args.eval_type)
    metric_name = "eer" if "eer" in summary else "auc"
    value = summary[metric_name]
    print("=" * 80)
    print("the optimal loss_file is: ", pickle_path)
    print(f"the optimal {metric_name} = ", value)
    print(f"fusion lambdas: lam_fea_comm={lam[0]:g} lam_smooth={lam[1]:g}")
    print(f"inference fps = {fps:.3f}")
    print("=" * 80)
    return {metric_name: value, "fps": fps, "pickle": pickle_path}


if __name__ == "__main__":
    main()
