"""Training entry point.

Mirrors ``python -m Code.main.run_train`` (``Code/main/run_train.py`` +
``constant_train.py``): flag surface (--dataset_name, --net_tag, --loss_tag,
--data_type, --exp_tag, --pretrain, ...), dispatching stage 2
(``train_from_multi_pretain``: rgb_op joint training, optionally grafting
stage-1 branch checkpoints) vs stage 1 (``train_base``: single-stream
pretrain).  Fixes the reference's broken wiring (get_helper had no training
branch, SURVEY.md 2.3.2) — training works out of the box here.

Stage 1 (rgb):  --net_tag unet_vq_topk_res --loss_tag rgb_int_gdl_flow_adv_vq --data_type rgb
Stage 1 (op):   --net_tag unet_vq_topk_res --loss_tag op_int_adv_vq --data_type op
Stage 2:        --net_tag unet_vq_twostream --loss_tag twostream_vq --data_type rgb_op \
                [--pretrain --rgb_model_path ... --op_model_path ...]
"""

from __future__ import annotations

import argparse
import dataclasses
import os


def parser_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset_name", required=True)
    p.add_argument("--data_dir", required=True,
                   help="root: <data_dir>/<dataset>/training/{frames,flows}")
    p.add_argument("--net_tag", default="unet_vq_twostream")
    p.add_argument("--loss_tag", default="twostream_vq")
    p.add_argument("--data_type", default="rgb_op",
                   choices=["rgb", "op", "rgb_op"])
    p.add_argument("--exp_tag", default="")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--iterations", type=int, default=80000)
    p.add_argument("--lr_g", type=float, default=2e-4)
    p.add_argument("--lr_d", type=float, default=2e-5)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--embed_dim", type=int, default=64)
    p.add_argument("--n_embed", type=int, default=256)
    p.add_argument("--k", type=int, default=2)
    p.add_argument("--pretrain", action="store_true",
                   help="graft stage-1 branch checkpoints (stage 2)")
    p.add_argument("--rgb_model_path", default="",
                   help="stage-1 rgb ckpt (orbax step dir or torch .pth)")
    p.add_argument("--op_model_path", default="")
    p.add_argument("--flownet_ckpt", default="",
                   help="FlowNet2-SD torch .pth (random init + warning if "
                        "absent; the flow loss is observational either way)")
    p.add_argument("--freeze_codebook", action="store_true",
                   help="pin the memory codebook to its (grafted) state: "
                        "skip the EMA update while encoder/decoder train. "
                        "Preserves the memory channel's anomaly signal, "
                        "which joint EMA training erodes (PERF.md round 4)")
    p.add_argument("--fix_branches", action="store_true",
                   help="freeze rgb/op branches, train bridge only")
    p.add_argument("--save_dir", default="runs")
    p.add_argument("--registry", default="runs/registry.json")
    p.add_argument("--seed", type=int, default=20200525)
    p.add_argument("--step_log", type=int, default=10)
    p.add_argument("--step_summary", type=int, default=100)
    p.add_argument("--step_save", type=int, default=1000)
    p.add_argument("--fetch_every_periods", type=int, default=1,
                   help="batch K log-periods of scalars into one D2H fetch "
                        "(values still recorded per step_log, written K "
                        "periods late) — lifts the loop off the remote "
                        "tunnel's tiny-op RTT on long runs")
    p.add_argument("--async_checkpoints", action="store_true",
                   help="overlap checkpoint device_get+write with stepping "
                        "on a writer thread")
    p.add_argument("--keep_ckpts", type=int, default=0,
                   help="retention: keep only the newest N full-state "
                        "checkpoints (0 = keep all, reference behavior; at "
                        "released scale a full state is ~296 MB, so the "
                        "default 80k cadence writes ~24 GB unpruned)")
    p.add_argument("--keep_every", type=int, default=0,
                   help="retention: additionally keep every checkpoint "
                        "whose step is divisible by K (milestones survive "
                        "--keep_ckpts pruning)")
    p.add_argument("--num_workers", type=int, default=8,
                   help="decode threads for the file-tree (normal) backend")
    p.add_argument("--cache_gb", type=float, default=2.0,
                   help="decoded-frame LRU cache for the file-tree backend "
                        "(GiB; 0 disables) -- training revisits each frame "
                        "clip_len x epochs times")
    p.add_argument("--backend", default="normal",
                   choices=["normal", "framepack", "device"],
                   help="training data backend; framepack roots point "
                        "at packed files instead of frame trees; device "
                        "uploads the whole split to HBM once and gathers "
                        "batches on-device (zero per-step pixel H2D)")
    p.add_argument("--resume", default="",
                   help="run dir (or exp_tag via registry) to resume from: "
                        "restores the FULL training state incl. optimizer "
                        "moments and EMA codebook (the reference's resume "
                        "reloaded weights only)")
    # loss weights: default None -> the per-dataset preset
    # (configs.train_loss_preset, mirroring the reference's tune-ini wiring)
    for lam in ("lam_adv", "lam_lp", "lam_gdl", "lam_flow", "lam_latent",
                "lam_lp_op"):
        p.add_argument(f"--{lam}", type=float, default=None)
    p.add_argument("--l_num", type=int, default=None)
    p.add_argument("--alpha_num", type=int, default=None)
    p.add_argument("--fix_gdl_key_bug", action="store_true",
                   help="decouple lam_gdl from lam_adv for vq loss tags "
                        "(the reference ini reader takes lam_gdl from the "
                        "lam_adv key, constant_train.py:316,336)")
    p.add_argument("--aligned_sampling", action="store_true", default=True)
    p.add_argument("--unaligned_sampling", dest="aligned_sampling",
                   action="store_false",
                   help="reproduce the reference's independent rgb/op clip "
                        "sampling (two_stream_dataset.py:466-470)")
    return p.parse_args(argv)


def _load_branch(path: str, net_tag: str, target_vars=None):
    """Load a stage-1 generator's variables from a torch .pth (converted),
    a flax .msgpack, or an orbax step dir written by train_loop (which holds
    the FULL train state; the generator slice is extracted)."""
    from ..tools.torch_convert import convert_pth
    from ..train.checkpoint import load_msgpack, restore_checkpoint

    if path.endswith(".pth"):
        return convert_pth(path, net_tag)
    if path.endswith(".msgpack"):
        return load_msgpack(path, target_vars)
    restored = restore_checkpoint(os.path.dirname(path),
                                  step=int(os.path.basename(path)))
    return {"params": restored["g_params"], **restored["g_state"]}


def main(argv=None):
    args = parser_args(argv)
    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..configs import (
        DataConfig, ExperimentConfig, NetConfig, OptimConfig)
    from ..data.datasets import (
        ClipLoader, SingleStreamTrainSampler, TwoStreamTrainSampler,
        VideoIndex, parallel_batches)
    from ..models import PixelDiscriminator, build_generator
    from ..models.flownet_sd import FlowNet2SD
    from ..ops.metrics import psnr_error
    from ..train.loop import train_loop
    from ..train.optim import make_optimizers
    from ..train.state import create_train_state, graft_branches
    from ..train.steps import (
        make_single_stream_train_step, make_twostream_train_step)
    from ..utils.logging_utils import get_logger
    from ..utils.registry import register_run

    size = args.image_size
    net = NetConfig(net_tag=args.net_tag, data_type=args.data_type,
                    embed_dim=args.embed_dim, n_embed=args.n_embed, k=args.k,
                    image_size=size)
    if args.backend == "framepack":
        rgb_root = os.path.join(args.data_dir, args.dataset_name,
                                "training", "frames.fpk")
        op_root = os.path.join(args.data_dir, args.dataset_name,
                               "training", "flows.fpk")
    else:
        rgb_root = os.path.join(args.data_dir, args.dataset_name,
                                "training", "frames")
        op_root = os.path.join(args.data_dir, args.dataset_name,
                               "training", "flows")
    data = DataConfig(
        dataset_name=args.dataset_name, data_type=args.data_type,
        rgb_root=rgb_root, op_root=op_root,
        image_size=size, aligned_two_stream_sampling=args.aligned_sampling)
    from ..configs import train_loss_preset

    loss_cfg = train_loss_preset(
        args.dataset_name, args.loss_tag,
        reproduce_gdl_key_bug=not args.fix_gdl_key_bug)
    lam_overrides = {
        name: getattr(args, name)
        for name in ("lam_adv", "lam_lp", "lam_gdl", "lam_flow",
                     "lam_latent", "lam_lp_op", "l_num", "alpha_num")
        if getattr(args, name) is not None
    }
    if lam_overrides:
        loss_cfg = dataclasses.replace(loss_cfg, **lam_overrides)
    optim = OptimConfig(lr_g=args.lr_g, lr_d=args.lr_d,
                        iterations=args.iterations,
                        batch_size=args.batch_size,
                        fix_branches=args.fix_branches,
                        freeze_codebook=args.freeze_codebook)
    cfg = ExperimentConfig(net=net, data=data, loss=loss_cfg, optim=optim,
                           exp_tag=args.exp_tag or
                           f"{args.net_tag}-{args.dataset_name}-{args.data_type}",
                           save_dir=args.save_dir, seed=args.seed,
                           mode="training")
    run_dir = register_run(args.registry, cfg)
    logger = get_logger("run_train", os.path.join(run_dir, "log_dir"))
    logger.info("run dir: %s", run_dir)

    two_stream = args.data_type == "rgb_op"
    ch = {"rgb": 3, "op": 2}
    gen = build_generator(net)
    disc = PixelDiscriminator()
    flownet = FlowNet2SD()
    rng = jax.random.PRNGKey(args.seed)

    uses_flow = "flow" in args.loss_tag or two_stream
    flow_vars = None
    if uses_flow:
        flow_vars = flownet.init({"params": jax.random.fold_in(rng, 7)},
                                 jnp.zeros((1, size, size, 3, 2)))
        if args.flownet_ckpt:
            from ..tools.torch_convert import convert_flownet_sd

            flow_vars = convert_flownet_sd(args.flownet_ckpt)
            logger.info("loaded FlowNet2-SD from %s", args.flownet_ckpt)
        else:
            logger.warning("no --flownet_ckpt: FlowNet teacher is randomly "
                           "initialized (flow loss is observational)")

    g_tx, d_tx = make_optimizers(optim)

    if two_stream:
        t_rgb, t_op = 4, 3
        state = create_train_state(
            gen, disc, g_tx, d_tx, rng,
            rgb_shape=(args.batch_size, size, size, t_rgb * 3),
            op_shape=(args.batch_size, size, size, t_op * 2),
            d_input_channels=3)
        if args.fix_branches:
            mask = {k: k == "bridge" for k in state.g_params}
            g_tx, d_tx = make_optimizers(optim, g_mask=mask)
            state = dataclasses.replace(state,
                                        g_opt_state=g_tx.init(state.g_params))
        if args.pretrain:
            assert args.rgb_model_path and args.op_model_path, \
                "--pretrain needs --rgb_model_path and --op_model_path"
            rgb_vars = _load_branch(args.rgb_model_path, "unet_vq_topk_res",
                                    None)
            op_vars = _load_branch(args.op_model_path, "unet_vq_topk_res",
                                   None)
            g_params = graft_branches(state.g_params, rgb_vars["params"],
                                      op_vars["params"])
            g_state = {
                col: graft_branches(state.g_state[col],
                                    rgb_vars.get(col, {}),
                                    op_vars.get(col, {}))
                for col in state.g_state
            }
            state = dataclasses.replace(state, g_params=g_params,
                                        g_state=g_state)
            logger.info("grafted stage-1 branches from %s / %s",
                        args.rgb_model_path, args.op_model_path)
        step_fn = jax.jit(make_twostream_train_step(
            gen, disc, flownet, loss_cfg, g_tx, d_tx,
            freeze_codebook=args.freeze_codebook))

        if args.backend == "device":
            # whole split resident in HBM; batches gather on-device
            # (data/resident.py) — the per-step H2D is a (b,) int32 pair
            from ..data.resident import DeviceResidentTwoStream

            sampler = DeviceResidentTwoStream(
                VideoIndex(data.rgb_root), VideoIndex(data.op_root),
                clip_len_rgb=5, clip_len_op=4, image_size=size,
                aligned=args.aligned_sampling,
                reproduce_flow_bug=data.reproduce_flow_channel_bug,
                seed=args.seed)
            logger.info("device-resident split: %.0f MB in HBM",
                        sampler.resident_bytes / 1e6)
        elif args.backend == "normal":
            # uint8 + frame-packed clips: host assembly is contiguous
            # memcpys only; the jitted step normalizes and interleaves
            # (an XLA transpose, free on TPU)
            sampler = TwoStreamTrainSampler(
                VideoIndex(data.rgb_root), VideoIndex(data.op_root),
                clip_len_rgb=5, clip_len_op=4,
                aligned=args.aligned_sampling, image_size=size,
                reproduce_flow_bug=data.reproduce_flow_channel_bug,
                cache_bytes=int(args.cache_gb * (1 << 30)),
                normalize_rgb=False, packed=True)
        else:
            from ..data import get_dataset

            sampler = get_dataset(
                "rgb_op", "training", args.backend,
                rgb_root=data.rgb_root, op_root=data.op_root,
                clip_len_rgb=5, clip_len_op=4, image_size=size,
                aligned=args.aligned_sampling,
                reproduce_flow_bug=data.reproduce_flow_channel_bug,
                seed=args.seed)

        if args.backend == "device":

            def batches():
                while True:
                    yield sampler.batch(args.batch_size)
        elif args.backend == "framepack":
            # u8 rgb + bf16 flows over PCIe (3x fewer bytes) in frame-packed
            # (b, t, h, w, c) layout (one mmap gather, no host interleave);
            # the jitted step normalizes and interleaves on device
            import ml_dtypes

            sampler.normalize_rgb = False
            sampler.packed = True

            def batches():
                while True:
                    b = sampler.batch(args.batch_size)
                    yield {"rgb": jnp.asarray(b["rgb"]),
                           "op": jnp.asarray(
                               b["op"].astype(ml_dtypes.bfloat16))}
        elif args.backend == "normal":
            # file-tree backend decodes JPEG/.flo per clip on the host:
            # fan the decoding out (reference: DataLoader num_workers=16)
            def batches():
                for b in parallel_batches(sampler, args.batch_size,
                                          num_workers=args.num_workers):
                    yield {k: jnp.asarray(v) for k, v in b.items()}
        else:
            def batches():
                while True:
                    b = sampler.batch(args.batch_size)
                    yield {k: jnp.asarray(v) for k, v in b.items()}

        from ..train.steps import _to_model_range

        def psnr_fn(state, batch):
            variables = {"params": state.g_params, **state.g_state}
            rgb = _to_model_range(batch["rgb"])
            op = _to_model_range(batch["op"])
            pred, _, _, _ = gen.apply(variables, rgb[..., :-3],
                                      op[..., :-2], False)
            return psnr_error(pred, rgb[..., -3:])

        def vis_fn(state, batch):
            variables = {"params": state.g_params, **state.g_state}
            rgb = _to_model_range(batch["rgb"])
            op = _to_model_range(batch["op"])
            rgb_pred, op_pred, _, _ = gen.apply(
                variables, rgb[..., :-3], op[..., :-2], False)
            n = min(4, rgb_pred.shape[0])

            # fetch-size hygiene: the grids leave the device every
            # step_summary for the life of an 80k run (800 fetches) over a
            # link whose D2H degrades to ~0.2 MB/s for hours (PERF.md), so
            # quantize rgb to uint8 and keep flows bf16 ON DEVICE — 3.7 MB
            # per summary instead of 10.5 MB, pixel-identical TB output
            def u8(x):
                return ((jnp.clip(x, -1, 1) + 1) * 127.5).astype(jnp.uint8)

            return {"rgb/pred": u8(rgb_pred[:n]),
                    "rgb/target": u8(rgb[..., -3:][:n]),
                    "op/pred": op_pred[:n].astype(jnp.bfloat16),
                    "op/target": op[..., -2:][:n].astype(jnp.bfloat16)}

    else:
        c = ch[args.data_type]
        t = 4 if args.data_type == "rgb" else 3
        state = create_train_state(
            gen, disc, g_tx, d_tx, rng,
            rgb_shape=(args.batch_size, size, size, t * c),
            d_input_channels=c)
        step_fn = jax.jit(make_single_stream_train_step(
            gen, disc, flownet, loss_cfg, g_tx, d_tx,
            data_type=args.data_type,
            freeze_codebook=args.freeze_codebook))
        from ..data.datasets import FrameCache

        root = data.rgb_root if args.data_type == "rgb" else data.op_root
        if args.backend == "device":
            from ..data.resident import DeviceResidentSingleStream

            sampler = DeviceResidentSingleStream(
                VideoIndex(root), args.data_type, t + 1, image_size=size,
                reproduce_flow_bug=data.reproduce_flow_channel_bug,
                seed=args.seed)
            logger.info("device-resident split: %.0f MB in HBM",
                        sampler.resident_bytes / 1e6)

            def batches():
                while True:
                    yield sampler.batch(args.batch_size)
        else:
            cache = (FrameCache(int(args.cache_gb * (1 << 30)))
                     if args.cache_gb > 0 else None)
            sampler = SingleStreamTrainSampler(
                VideoIndex(root), t + 1,
                ClipLoader(args.data_type, size,
                           data.reproduce_flow_channel_bug,
                           cache=cache, normalize_rgb=False, packed=True))

            def batches():
                for b in parallel_batches(sampler, args.batch_size,
                                          num_workers=args.num_workers):
                    yield jnp.asarray(b)

        from ..train.steps import _to_model_range

        def psnr_fn(state, batch):
            variables = {"params": state.g_params, **state.g_state}
            batch = _to_model_range(batch)
            pred, _, _ = gen.apply(variables, batch[..., :-c], False)
            return psnr_error(pred, batch[..., -c:])

        vis_fn = None

    if args.resume:
        from ..train.checkpoint import latest_step, restore_checkpoint
        from ..train.loop import _state_to_pytree
        from ..utils.registry import resolve_run as _resolve

        resume_dir = args.resume
        if not os.path.isdir(resume_dir):
            resume_dir = _resolve(args.registry, args.resume)
        ckpt_dir = os.path.join(resume_dir, "training", "checkpoints")
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
        restored = restore_checkpoint(ckpt_dir, _state_to_pytree(state),
                                      step=step)
        state = dataclasses.replace(
            state, step=jnp.asarray(restored["step"]),
            g_params=restored["g_params"], g_state=restored["g_state"],
            g_opt_state=restored["g_opt_state"],
            d_params=restored["d_params"],
            d_opt_state=restored["d_opt_state"])
        logger.info("resumed full training state from %s step %d",
                    ckpt_dir, step)

    state = train_loop(state, step_fn, batches(), flow_vars,
                       args.iterations, run_dir, logger=logger,
                       psnr_fn=jax.jit(psnr_fn),
                       vis_fn=jax.jit(vis_fn) if vis_fn else None,
                       step_log=args.step_log,
                       step_summary=args.step_summary,
                       step_save=args.step_save,
                       fetch_every_periods=args.fetch_every_periods,
                       async_checkpoints=args.async_checkpoints,
                       keep_ckpts=args.keep_ckpts or None,
                       keep_every=args.keep_every or None)
    logger.info("training done at step %d", int(state.step))
    return run_dir


if __name__ == "__main__":
    main()
