"""Round-5 items 3 + 7: seed replication of the headline fusion gain, and
the b8 quality-equivalence experiment.

Item 7 (VERDICT r4): the project's most-quoted number — app-pre-200's
+0.051 fused-over-psnr AUC gain (PERF.md round 4) — is n=1 world, n=1
training seed.  Replicate the arm (stage-1 400x2 + graft -> JOINT stage-2
200 steps on the default appearance world) across 2 more TRAINING seeds and
1 more WORLD seed; report the fusion gain (best fused - psnr-only) per run.

Item 3 (VERDICT r4): the b8 training recommendation (PERF.md train-MFU:
2.35x per-sample throughput) is throughput-only.  Same-sample-budget
comparison: b8 @ N/2 steps vs b4 @ N steps (N=2000), same seed, same world,
same grafted stage-1 branches; compare final train-PSNR and the AUC sweep.

Usage: python scripts/r5_experiments.py [--which seeds|b8|all]
Writes <root>/experiments.json.
"""

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ammcnet_aaai2021_tpu.runners.run_test import main as run_test
from ammcnet_aaai2021_tpu.runners.run_train import main as run_train
from ammcnet_aaai2021_tpu.tools.lam_sweep import run_sweep
from ammcnet_aaai2021_tpu.tools.make_toydata import make_toydata

T0 = time.time()


def log(msg):
    print(f"[r5x +{time.time() - T0:7.1f}s] {msg}", flush=True)


def final_train_psnr(run_dir, last_k=200):
    """Mean train_psnr over the last `last_k` logged steps (info.log)."""
    vals = []
    path = os.path.join(run_dir, "log_dir", "info.log")
    for line in open(path):
        m = re.search(r"step (\d+) \|.*train_psnr=([\d.]+)", line)
        if m:
            vals.append((int(m.group(1)), float(m.group(2))))
    if not vals:
        return None
    last_step = vals[-1][0]
    tail = [v for s, v in vals if s > last_step - last_k]
    return sum(tail) / len(tail)


def recipe_arm(root, data_dir, tag, seed, stage2_iters, batch_size=4,
               stage1_iters=400, fix_branches=False, stage1_runs=None):
    """stage-1 x2 (or reuse) -> graft -> stage-2 -> score -> sweep."""
    reg = os.path.join(root, "registry.json")
    common = ["--dataset_name", "toydata", "--data_dir", data_dir,
              "--save_dir", root, "--registry", reg,
              "--image_size", "64", "--n_embed", "64", "--k", "2",
              "--seed", str(seed)]

    def ckpt(run_dir, step):
        return os.path.join(run_dir, "training", "checkpoints",
                            f"{step:06d}")

    if stage1_runs is None:
        s1 = ["--net_tag", "unet_vq_topk_res", "--batch_size", "4",
              "--iterations", str(stage1_iters),
              "--step_save", str(stage1_iters)]
        log(f"{tag}: stage-1 rgb+op ({stage1_iters} steps, seed {seed})")
        rgb_run = run_train(common + s1 + [
            "--loss_tag", "rgb_int_gdl_flow_adv_vq", "--data_type", "rgb",
            "--exp_tag", f"{tag}-s1-rgb"])
        op_run = run_train(common + s1 + [
            "--loss_tag", "op_int_adv_vq", "--data_type", "op",
            "--exp_tag", f"{tag}-s1-op"])
        stage1_runs = (ckpt(rgb_run, stage1_iters), ckpt(op_run,
                                                         stage1_iters))
    log(f"{tag}: stage-2 ({stage2_iters} steps, b{batch_size}"
        + (", fix_branches" if fix_branches else ", joint") + ")")
    s2_run = run_train(common + [
        "--net_tag", "unet_vq_twostream", "--loss_tag", "twostream_vq",
        "--data_type", "rgb_op", "--batch_size", str(batch_size),
        "--iterations", str(stage2_iters),
        "--step_save", str(stage2_iters), "--fetch_every_periods", "10",
        "--pretrain", "--rgb_model_path", stage1_runs[0],
        "--op_model_path", stage1_runs[1]]
        + (["--fix_branches"] if fix_branches else [])
        + ["--exp_tag", f"{tag}-s2"])
    save_dir = os.path.join(root, f"eval-{tag}")
    ret = run_test(["--dataset_name", "toydata", "--data_dir", data_dir,
                    "--ckptfile", ckpt(s2_run, stage2_iters),
                    "--save_dir", save_dir, "--image_size", "64",
                    "--batch_size", "4"])
    sweep = run_sweep([(tag, ret["pickle"])], data_dir)[tag]
    res = {"psnr_only": sweep["psnr_only"], "fea_only": sweep["fea_only"],
           "best_lam": sweep["best"][0], "best_auc": sweep["best"][1],
           "gain": sweep["best"][1] - sweep["psnr_only"],
           "train_psnr_tail": final_train_psnr(s2_run),
           "aucs": {str(k): v for k, v in sweep["aucs"].items()},
           "stage1": list(stage1_runs), "s2_run": s2_run}
    log(f"{tag}: psnr-only {res['psnr_only']:.4f} fea-only "
        f"{res['fea_only']:.4f} best {res['best_auc']:.4f} @ "
        f"{res['best_lam']:g} (gain {res['gain']:+.4f}) "
        f"train_psnr {res['train_psnr_tail']}")
    return res


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/root/runs_r5x")
    p.add_argument("--which", default="all", choices=["seeds", "b8", "all"])
    args = p.parse_args()
    os.makedirs(args.root, exist_ok=True)
    out_path = os.path.join(args.root, "experiments.json")
    out = json.load(open(out_path)) if os.path.exists(out_path) else {}

    # default appearance world (identical to the round-4 session-2 world)
    default_world = os.path.join(args.root, "world7")
    if not os.path.isdir(os.path.join(default_world, "toydata")):
        make_toydata(default_world, anomaly="appearance")

    if args.which in ("seeds", "all"):
        # the recorded arm: world seed 7, train seed 20200525 (round 4).
        # Two more TRAINING seeds on the same world + one more WORLD seed
        # at the recorded training seed.
        for seed in (1, 42):
            key = f"app-pre-200-trainseed{seed}"
            if key not in out:
                out[key] = recipe_arm(args.root, default_world, key, seed,
                                      stage2_iters=200)
                json.dump(out, open(out_path, "w"), indent=1)
        world9 = os.path.join(args.root, "world9")
        if not os.path.isdir(os.path.join(world9, "toydata")):
            make_toydata(world9, anomaly="appearance", seed=9)
        key = "app-pre-200-world9"
        if key not in out:
            out[key] = recipe_arm(args.root, world9, key, 20200525,
                                  stage2_iters=200)
            json.dump(out, open(out_path, "w"), indent=1)

    if args.which in ("b8", "all"):
        # same sample budget (8000 clips), same grafted branches, same seed
        key4, key8 = "b4-2000", "b8-1000"
        if key4 not in out:
            out[key4] = recipe_arm(args.root, default_world, key4, 20200525,
                                   stage2_iters=2000, batch_size=4)
            json.dump(out, open(out_path, "w"), indent=1)
        if key8 not in out:
            out[key8] = recipe_arm(
                args.root, default_world, key8, 20200525,
                stage2_iters=1000, batch_size=8,
                stage1_runs=tuple(out[key4]["stage1"]))
            json.dump(out, open(out_path, "w"), indent=1)

    log("all done: " + json.dumps(
        {k: {kk: v[kk] for kk in ("psnr_only", "fea_only", "best_auc",
                                  "gain", "train_psnr_tail")}
         for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
