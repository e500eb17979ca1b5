"""Watch-folder evaluator: score new checkpoints as training produces them.

Rebuild of the reference's legacy watcher (``Code/main/evaluate.py:164-214``:
poll ``checkpoints/`` every 60s and evaluate ckpts not yet scored) on the
current stack: polls a run dir's orbax checkpoints, runs the fused test
pipeline on each new step, appends (step, auc, fps) to ``watch_results.csv``
in the run dir, and keeps the best.

Usage:
  python -m ammcnet_aaai2021_tpu.runners.watch_eval \
      --run_dir runs/<run> --dataset_name toydata --data_dir /data \
      [--poll 60] [--once]
"""

from __future__ import annotations

import argparse
import csv
import os
import time


def parser_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_dir", required=True)
    p.add_argument("--dataset_name", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--poll", type=float, default=60.0)
    p.add_argument("--once", action="store_true",
                   help="evaluate pending checkpoints once and exit")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--sweep", action="store_true",
                   help="also lam-sweep each checkpoint's records and "
                        "record psnr_only/fea_only/best columns — the live "
                        "memory-channel trajectory (PERF.md round 5) "
                        "without post-hoc lam_sweep runs")
    return p.parse_args(argv)


def main(argv=None):
    args = parser_args(argv)
    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    if jax.process_count() > 1:
        # establish the cross-process collective context before per-rank
        # model builds can skew the ranks past gloo's ~30 s context-init
        # deadline (see parallel.multihost.warm_collectives)
        from ..parallel.multihost import warm_collectives

        warm_collectives()

    from ..configs import FUSION_LAMBDAS
    from ..eval.gt import GroundTruthLoader
    from ..eval.infer import score_dataset
    from ..eval.scoring import img_pred_fea_comm_auc
    from ..models import build_generator
    from ..train.checkpoint import restore_checkpoint
    from ..utils.logging_utils import get_logger
    from ..utils.registry import load_run_config

    cfg = load_run_config(args.run_dir)
    if args.image_size:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, net=dataclasses.replace(cfg.net, image_size=args.image_size),
            data=dataclasses.replace(cfg.data, image_size=args.image_size))
    logger = get_logger("watch_eval", os.path.join(args.run_dir, "log_dir"))
    ckpt_dir = os.path.join(args.run_dir, "training", "checkpoints")
    results_path = os.path.join(args.run_dir, "watch_results.csv")
    header = ["step", "auc", "fps"] + (
        ["psnr_only", "fea_only", "best_lam", "best_auc"]
        if args.sweep else [])
    seen = set()
    if os.path.exists(results_path):
        with open(results_path) as fh:
            seen = {int(row["step"]) for row in csv.DictReader(fh)}
    else:
        with open(results_path, "w", newline="") as fh:
            csv.writer(fh).writerow(header)

    gen = build_generator(cfg.net, per_sample_diff=True)
    size = cfg.data.image_size
    rgb_root = os.path.join(args.data_dir, args.dataset_name,
                            "testing", "frames")
    op_root = os.path.join(args.data_dir, args.dataset_name,
                           "testing", "flows")
    # direct lookup, same policy as run_test.py:246 — an unknown dataset
    # fails loudly instead of silently inheriting ped2's lambdas
    lam = FUSION_LAMBDAS[args.dataset_name]
    best = (None, -1.0)

    while True:
        steps = sorted(int(d) for d in os.listdir(ckpt_dir)
                       if d.isdigit()) if os.path.isdir(ckpt_dir) else []
        pending = [s for s in steps if s not in seen]
        for step in pending:
            # checkpoints hold the full train state; restore raw and pull
            # the generator slice
            restored = restore_checkpoint(ckpt_dir, step=step)
            variables = {"params": restored["g_params"],
                         **restored["g_state"]}
            # commit host numpy leaves to the default device once (see
            # run_test: scorer dispatch + scorer_mode='auto' both want
            # device-resident weights)
            variables = jax.tree.map(jnp.asarray, variables)
            result, fps = score_dataset(
                gen, variables, rgb_root, op_root, args.dataset_name,
                clip_len_rgb=cfg.data.clip_length_rgb,
                clip_len_op=cfg.data.clip_length_op,
                batch_size=args.batch_size, image_size=size,
                reproduce_flow_bug=cfg.data.reproduce_flow_channel_bug,
                logger=logger)
            lengths = [len(a) for a in result["rgb_img_pred_records"]]
            gt = GroundTruthLoader(args.data_dir)(
                args.dataset_name, video_lengths=lengths)
            auc = img_pred_fea_comm_auc(result, gt, lam)
            row = [step, round(auc, 4), round(fps, 2)]
            if args.sweep:
                from ..tools.lam_sweep import DEFAULT_LAMS, sweep_pickle

                rows = dict(sweep_pickle(result, gt, DEFAULT_LAMS, lam[1]))
                best_lam = max(rows, key=rows.get)
                row += [round(rows[0.0], 4), round(rows[1.0], 4),
                        best_lam, round(rows[best_lam], 4)]
                logger.info(
                    "step %d sweep: psnr-only %.4f fea-only %.4f best "
                    "%.4f @ l1=%g", step, rows[0.0], rows[1.0],
                    rows[best_lam], best_lam)
            with open(results_path, "a", newline="") as fh:
                csv.writer(fh).writerow(row)
            seen.add(step)
            if auc > best[1]:
                best = (step, auc)
            logger.info("step %d: auc=%.4f fps=%.1f (best: step %s auc=%.4f)",
                        step, auc, fps, best[0], best[1])
        if args.once:
            break
        time.sleep(args.poll)
    return best


if __name__ == "__main__":
    main()
