"""Round-5 item 1: the memory-preserving recipe at RELEASED cadence.

Round 4 proved the mechanism (stage-2 ``--fix_branches`` keeps the memory
channel's fea-only AUC ~0.60 where joint training erodes it to anti-signal)
at <=2000 stage-2 steps.  The reference's actual deployment is an
80k-iteration stage-2 (``/root/reference/Code/main/constant_train.py:47``)
at ckpt-every-1000 cadence (``constant_train.py`` log 10 / summary 100 /
ckpt 1000).  This driver runs the SAME proven recipe (default appearance
toy world seed 7; stage-1 400x2 + graft, seed 20200525) with stage-2
extended to 20k steps at the released cadence, scores EVERY retained
checkpoint through the full run_test pipeline, and lam-sweeps the whole
trajectory so PERF.md gets the fea-only / psnr-only / best-fused columns
at {1k, 2k, 5k, 10k, 20k} (the <=2k transient is already pinned by the
round-4 session-2 tables on this identical world+seed recipe).

Usage:  python scripts/r5_released_cadence.py [--steps 20000] [--root /root/runs_r5]
Writes: <root>/trajectory.json with the sweep rows; pickles under
        <root>/eval-step-*/
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ammcnet_aaai2021_tpu.runners.run_test import main as run_test
from ammcnet_aaai2021_tpu.runners.run_train import main as run_train
from ammcnet_aaai2021_tpu.tools.lam_sweep import run_sweep
from ammcnet_aaai2021_tpu.tools.make_toydata import make_toydata


def log(msg):
    print(f"[r5 +{time.time() - T0:7.1f}s] {msg}", flush=True)


T0 = time.time()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/root/runs_r5")
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--stage1_iters", type=int, default=400)
    p.add_argument("--step_save", type=int, default=1000)
    p.add_argument("--seed", type=int, default=20200525)
    p.add_argument("--skip_train", action="store_true",
                   help="re-run only the eval/sweep over existing ckpts")
    p.add_argument("--joint", action="store_true",
                   help="run the JOINT stage-2 control (no --fix_branches) "
                        "at the same released cadence, reusing the same "
                        "world + stage-1 branches")
    args = p.parse_args()

    root = args.root
    data_dir = os.path.join(root, "apptoy")
    reg = os.path.join(root, "registry.json")
    os.makedirs(root, exist_ok=True)

    if not os.path.isdir(os.path.join(data_dir, "toydata")):
        log("generating default appearance toy world (2+2 videos, seed 7)")
        make_toydata(data_dir, anomaly="appearance")

    common = ["--dataset_name", "toydata", "--data_dir", data_dir,
              "--save_dir", root, "--registry", reg,
              "--image_size", "64", "--batch_size", "4",
              "--n_embed", "64", "--k", "2", "--seed", str(args.seed)]
    s1 = ["--net_tag", "unet_vq_topk_res",
          "--iterations", str(args.stage1_iters),
          "--step_save", str(args.stage1_iters)]

    def ckpt(run_dir, step):
        return os.path.join(run_dir, "training", "checkpoints", f"{step:06d}")

    suffix = "-joint" if args.joint else ""
    marker = os.path.join(root, f"runs{suffix}.json")
    base_marker = os.path.join(root, "runs.json")
    if args.joint and os.path.exists(base_marker) \
            and not os.path.exists(marker):
        # reuse the frozen run's stage-1 branches: the control differs in
        # stage-2 ONLY
        base = json.load(open(base_marker))
        log(f"joint control: reusing stage-1 branches from {base}")
        s2_run = run_train(common + [
            "--net_tag", "unet_vq_twostream", "--loss_tag", "twostream_vq",
            "--data_type", "rgb_op", "--iterations", str(args.steps),
            "--step_save", str(args.step_save),
            "--fetch_every_periods", "10", "--async_checkpoints",
            "--pretrain",
            "--rgb_model_path", ckpt(base["rgb"], args.stage1_iters),
            "--op_model_path", ckpt(base["op"], args.stage1_iters),
            "--exp_tag", "r5-s2-joint"])
        runs = {"rgb": base["rgb"], "op": base["op"], "s2": s2_run}
        json.dump(runs, open(marker, "w"))
    elif args.skip_train or os.path.exists(marker):
        runs = json.load(open(marker))
        log(f"reusing training runs: {runs}")
    else:
        log(f"stage-1 rgb ({args.stage1_iters} steps)")
        rgb_run = run_train(common + s1 + [
            "--loss_tag", "rgb_int_gdl_flow_adv_vq", "--data_type", "rgb",
            "--exp_tag", "r5-s1-rgb"])
        log(f"stage-1 op ({args.stage1_iters} steps)")
        op_run = run_train(common + s1 + [
            "--loss_tag", "op_int_adv_vq", "--data_type", "op",
            "--exp_tag", "r5-s1-op"])
        log(f"stage-2 --fix_branches ({args.steps} steps, "
            f"ckpt every {args.step_save} — released cadence)")
        s2_run = run_train(common + [
            "--net_tag", "unet_vq_twostream", "--loss_tag", "twostream_vq",
            "--data_type", "rgb_op", "--iterations", str(args.steps),
            "--step_save", str(args.step_save),
            "--fetch_every_periods", "10", "--async_checkpoints",
            "--pretrain",
            "--rgb_model_path", ckpt(rgb_run, args.stage1_iters),
            "--op_model_path", ckpt(op_run, args.stage1_iters),
            "--fix_branches", "--exp_tag", "r5-s2-fix"])
        runs = {"rgb": rgb_run, "op": op_run, "s2": s2_run}
        json.dump(runs, open(marker, "w"))
        log(f"training done: {runs}")

    ckpt_dir = os.path.join(runs["s2"], "training", "checkpoints")
    steps = sorted(int(d) for d in os.listdir(ckpt_dir) if d.isdigit())
    log(f"retained checkpoints: {steps}")

    items = []
    for step in steps:
        save_dir = os.path.join(root, f"eval{suffix}-step-{step:06d}")
        pkl = os.path.join(save_dir, "img_pred_fea_comm_rgb_auc",
                           "save_pickle", "toydata")
        if not os.path.exists(pkl):
            log(f"scoring checkpoint step {step}")
            run_test(["--dataset_name", "toydata", "--data_dir", data_dir,
                      "--ckptfile", os.path.join(ckpt_dir, f"{step:06d}"),
                      "--save_dir", save_dir, "--image_size", "64",
                      "--batch_size", "4"])
        items.append((f"step-{step}", pkl))

    log("lam sweep over the trajectory")
    res = run_sweep(items, data_dir)
    rows = {}
    for label, r in res.items():
        rows[label] = {"psnr_only": r["psnr_only"], "fea_only": r["fea_only"],
                       "best_lam": r["best"][0], "best_auc": r["best"][1],
                       "aucs": {str(k): v for k, v in r["aucs"].items()}}
        log(f"{label}: psnr-only {r['psnr_only']:.4f}  "
            f"fea-only {r['fea_only']:.4f}  "
            f"best {r['best'][1]:.4f} @ l1={r['best'][0]:g}")
    out = os.path.join(root, f"trajectory{suffix}.json")
    json.dump(rows, open(out, "w"), indent=1)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
