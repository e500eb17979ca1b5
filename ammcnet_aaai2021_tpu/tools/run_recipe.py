"""One-command two-stage training recipe.

Reproduces the reference's full pipeline as a single flow (the reference
splits it over three hand-launched runs: ``train_helper.py:1323-1850`` stage-1
per modality, ``utils.py:236-263`` checkpoint grafting,
``train_helper.py:217-427`` stage-2 from multi-pretrain):

  1. stage-1 rgb branch   (unet_vq_topk_res, rgb_int_gdl_flow_adv_vq)
  2. stage-1 op branch    (unet_vq_topk_res, op_int_adv_vq)
  3. graft both into the two-stream generator, train stage-2 (twostream_vq)
  4. (optional) stage-2 from scratch at equal steps, as the ablation control
  5. run_test on each stage-2 checkpoint; report AUCs + a per-channel
     lam sweep (psnr-only / fea-only / best-fused)

Usage (toydata smoke; real datasets take the same flags):
  python -m ammcnet_aaai2021_tpu.tools.run_recipe \
      --data_dir /data --dataset_name toydata --save_dir runs_recipe \
      --stage1_iters 200 --stage2_iters 200 --image_size 64

The MEMORY-PRESERVING deployment recipe (PERF.md round 4: joint stage-2
training erodes the codebook's anomaly signal on small worlds; the
reference's own frozen-branch mode — ``fixed_rgb_op_branch``,
``Code/models/vqvae.py:634-643`` — is the lever that preserves it):

  python -m ammcnet_aaai2021_tpu.tools.run_recipe \
      --data_dir /tmp/apptoy --anomaly appearance --fix_branches \
      --stage1_iters 400 --stage2_iters 200 --save_dir runs_recipe

``--anomaly appearance`` generates the hollow-glyph toy world (motion
normal, appearance anomalous — the probe that isolates the memory channel)
under data_dir if absent; ``--fix_branches`` trains the stage-2 bridge only,
keeping the grafted branches + codebook at their stage-1 state.  The
printed summary includes fea-only / psnr-only / best-fused AUC so the
memory channel's contribution is visible without hand-running lam_sweep.
"""

from __future__ import annotations

import argparse
import json
import os


def parser_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--dataset_name", default="toydata")
    p.add_argument("--save_dir", default="runs_recipe")
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--stage1_iters", type=int, default=200)
    p.add_argument("--stage2_iters", type=int, default=200)
    p.add_argument("--n_embed", type=int, default=64)
    p.add_argument("--k", type=int, default=2)
    p.add_argument("--seed", type=int, default=20200525)
    p.add_argument("--backend", default="normal",
                   choices=["normal", "framepack", "device"])
    p.add_argument("--flownet_ckpt", default="")
    p.add_argument("--skip_scratch_control", action="store_true",
                   help="skip the stage-2-from-scratch comparison run")
    p.add_argument("--anomaly", default=None,
                   choices=["teleport", "direction", "appearance"],
                   help="generate the toy world under data_dir if absent "
                        "(toydata only); 'appearance' is the memory-channel "
                        "probe (PERF.md round 4)")
    p.add_argument("--fix_branches", action="store_true",
                   help="stage-2 trains the bridge only (the reference's "
                        "fixed_rgb_op_branch mode, vqvae.py:634-643) — "
                        "preserves the memory channel's anomaly signal, "
                        "which joint stage-2 training erodes (PERF.md). "
                        "Applies to the pretrained arm; the scratch control "
                        "stays joint (frozen random branches are not a "
                        "meaningful model)")
    p.add_argument("--freeze_codebook", action="store_true",
                   help="additionally pin the memory codebook (skip the EMA "
                        "carry) in stage 2 — the mechanism control arm; "
                        "measured a wash next to --fix_branches alone")
    p.add_argument("--fetch_every_periods", type=int, default=1,
                   help="passed to run_train: batch K log-periods of "
                        "scalars per D2H fetch — set ~10 on tunneled "
                        "hardware (a degraded-hour RTT can stall a "
                        "per-10-step fetch for minutes)")
    p.add_argument("--tag", default="recipe")
    return p.parse_args(argv)


def main(argv=None) -> dict:
    args = parser_args(argv)
    from ..runners.run_test import main as run_test
    from ..runners.run_train import main as run_train
    from ..train.checkpoint import latest_step

    if args.anomaly:
        assert args.dataset_name == "toydata", \
            "--anomaly generates a toy world; use with --dataset_name toydata"
        if not os.path.isdir(os.path.join(args.data_dir, "toydata")):
            from .make_toydata import make_toydata

            print(f"[recipe] generating toydata (--anomaly {args.anomaly}) "
                  f"under {args.data_dir}")
            make_toydata(args.data_dir, image_size=args.image_size,
                         anomaly=args.anomaly)

    registry = os.path.join(args.save_dir, "registry.json")
    common = ["--dataset_name", args.dataset_name,
              "--data_dir", args.data_dir,
              "--save_dir", args.save_dir, "--registry", registry,
              "--image_size", str(args.image_size),
              "--batch_size", str(args.batch_size),
              "--n_embed", str(args.n_embed), "--k", str(args.k),
              "--seed", str(args.seed), "--backend", args.backend,
              "--fetch_every_periods", str(args.fetch_every_periods)]
    if args.flownet_ckpt:
        common += ["--flownet_ckpt", args.flownet_ckpt]

    def branch_ckpt(run_dir: str) -> str:
        ckpt_dir = os.path.join(run_dir, "training", "checkpoints")
        step = latest_step(ckpt_dir)
        assert step is not None, f"no checkpoint written under {ckpt_dir}"
        return os.path.join(ckpt_dir, f"{step:06d}")

    s1 = ["--net_tag", "unet_vq_topk_res",
          "--iterations", str(args.stage1_iters),
          "--step_save", str(args.stage1_iters)]
    print(f"[recipe] stage-1 rgb ({args.stage1_iters} steps)")
    rgb_run = run_train(common + s1 + [
        "--loss_tag", "rgb_int_gdl_flow_adv_vq", "--data_type", "rgb",
        "--exp_tag", f"{args.tag}-s1-rgb"])
    print(f"[recipe] stage-1 op ({args.stage1_iters} steps)")
    op_run = run_train(common + s1 + [
        "--loss_tag", "op_int_adv_vq", "--data_type", "op",
        "--exp_tag", f"{args.tag}-s1-op"])

    s2 = ["--net_tag", "unet_vq_twostream", "--loss_tag", "twostream_vq",
          "--data_type", "rgb_op", "--iterations", str(args.stage2_iters),
          "--step_save", str(args.stage2_iters)]
    freeze = ((["--fix_branches"] if args.fix_branches else []) +
              (["--freeze_codebook"] if args.freeze_codebook else []))
    print(f"[recipe] stage-2 from pretrained branches "
          f"({args.stage2_iters} steps"
          + (f", frozen-branch mode: {' '.join(freeze)}" if freeze else "")
          + ")")
    run_train(common + s2 + freeze + [
        "--pretrain", "--rgb_model_path", branch_ckpt(rgb_run),
        "--op_model_path", branch_ckpt(op_run),
        "--exp_tag", f"{args.tag}-s2-pretrained"])

    out = {"stage1_rgb": rgb_run, "stage1_op": op_run}

    def test(exp_tag: str) -> dict:
        ret = run_test(["--dataset_name", args.dataset_name,
                        "--data_dir", args.data_dir,
                        "--save_dir", os.path.join(args.save_dir,
                                                   f"eval-{exp_tag}"),
                        "--registry", registry, "--exp_tag", exp_tag,
                        "--batch_size", str(args.batch_size),
                        "--image_size", str(args.image_size)])
        # per-channel sweep on the just-written pickle: the memory channel's
        # contribution (fea-only) and the best fused operating point, so the
        # recipe's output answers the AMMC question directly
        from .lam_sweep import run_sweep

        sweep = run_sweep([(exp_tag, ret["pickle"])], args.data_dir)[exp_tag]
        return float(ret["auc"]), {
            "psnr_only": sweep["psnr_only"], "fea_only": sweep["fea_only"],
            "best_lam": sweep["best"][0], "best_auc": sweep["best"][1]}

    out["auc_pretrained"], out["sweep_pretrained"] = test(
        f"{args.tag}-s2-pretrained")

    if not args.skip_scratch_control:
        print(f"[recipe] stage-2 from scratch ({args.stage2_iters} steps, "
              "ablation control — joint even under --fix_branches)")
        run_train(common + s2 + ["--exp_tag", f"{args.tag}-s2-scratch"])
        out["auc_scratch"], out["sweep_scratch"] = test(
            f"{args.tag}-s2-scratch")

    print("[recipe] " + json.dumps(out))
    return out


if __name__ == "__main__":
    main()
