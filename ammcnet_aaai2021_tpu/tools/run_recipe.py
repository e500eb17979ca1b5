"""One-command two-stage training recipe.

Reproduces the reference's full pipeline as a single flow (the reference
splits it over three hand-launched runs: ``train_helper.py:1323-1850`` stage-1
per modality, ``utils.py:236-263`` checkpoint grafting,
``train_helper.py:217-427`` stage-2 from multi-pretrain):

  1. stage-1 rgb branch   (unet_vq_topk_res, rgb_int_gdl_flow_adv_vq)
  2. stage-1 op branch    (unet_vq_topk_res, op_int_adv_vq)
  3. graft both into the two-stream generator, train stage-2 (twostream_vq)
  4. (optional) stage-2 from scratch at equal steps, as the ablation control
  5. run_test on each stage-2 checkpoint; report AUCs

Usage (toydata smoke; real datasets take the same flags):
  python -m ammcnet_aaai2021_tpu.tools.run_recipe \
      --data_dir /data --dataset_name toydata --save_dir runs_recipe \
      --stage1_iters 200 --stage2_iters 200 --image_size 64
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
    p.add_argument("--tag", default="recipe")
    return p.parse_args(argv)


def main(argv=None) -> dict:
    args = parser_args(argv)
    from ..runners.run_test import main as run_test
    from ..runners.run_train import main as run_train
    from ..train.checkpoint import latest_step

    registry = os.path.join(args.save_dir, "registry.json")
    common = ["--dataset_name", args.dataset_name,
              "--data_dir", args.data_dir,
              "--save_dir", args.save_dir, "--registry", registry,
              "--image_size", str(args.image_size),
              "--batch_size", str(args.batch_size),
              "--n_embed", str(args.n_embed), "--k", str(args.k),
              "--seed", str(args.seed), "--backend", args.backend]
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
    print(f"[recipe] stage-2 from pretrained branches "
          f"({args.stage2_iters} steps)")
    run_train(common + s2 + [
        "--pretrain", "--rgb_model_path", branch_ckpt(rgb_run),
        "--op_model_path", branch_ckpt(op_run),
        "--exp_tag", f"{args.tag}-s2-pretrained"])

    out = {"stage1_rgb": rgb_run, "stage1_op": op_run}

    def test(exp_tag: str) -> float:
        ret = run_test(["--dataset_name", args.dataset_name,
                        "--data_dir", args.data_dir,
                        "--save_dir", os.path.join(args.save_dir,
                                                   f"eval-{exp_tag}"),
                        "--registry", registry, "--exp_tag", exp_tag,
                        "--batch_size", str(args.batch_size),
                        "--image_size", str(args.image_size)])
        return float(ret["auc"])

    out["auc_pretrained"] = test(f"{args.tag}-s2-pretrained")

    if not args.skip_scratch_control:
        print(f"[recipe] stage-2 from scratch ({args.stage2_iters} steps, "
              "ablation control)")
        run_train(common + s2 + ["--exp_tag", f"{args.tag}-s2-scratch"])
        out["auc_scratch"] = test(f"{args.tag}-s2-scratch")

    print("[recipe] " + json.dumps(out))
    return out


if __name__ == "__main__":
    main()
