"""End-to-end pipeline tests on the synthetic toy dataset: run_test CLI,
run_train CLI, record assembly semantics, native-loader parity, registry
round-trip, and the trained-model-beats-random sanity check."""

import os
import pickle

import numpy as np
import pytest

from ammcnet_aaai2021_tpu.eval.infer import _assemble_records
from ammcnet_aaai2021_tpu.tools.make_toydata import make_toydata


@pytest.fixture(scope="module")
def toydata(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("toy"))
    make_toydata(root, frames_per_video=16, image_size=64)
    return root


class TestRecordAssembly:
    def test_boundary_padding_matches_reference(self):
        # test_helper.py:465-476: scores at cnt+clip_len-1, leading frames
        # backfilled with the first score, op tail copies predecessor.
        scores = np.array([10.0, 20.0, 30.0], np.float32)
        arr = _assemble_records(scores, num_frame=7, clip_len=5)
        np.testing.assert_array_equal(
            arr, [10, 10, 10, 10, 10, 20, 30])
        # op stream: 3 windows of clip 4 over the rgb-based num_frame 7
        arr = _assemble_records(scores, num_frame=7, clip_len=4)
        np.testing.assert_array_equal(
            arr, [10, 10, 10, 10, 20, 30, 30])


class TestHardToydata:
    def test_hard_anomalies_move_at_normal_speed(self, tmp_path):
        """--hard anomalies are direction-only: no frame-to-frame jump may
        exceed ~2x the normal speed anywhere (anomalous frames included, and
        no wrap teleports in normal frames), while the easy variant's
        teleports jump tens of pixels.  This is what keeps frame-level AUC
        from saturating (VERDICT r2 weak #3)."""
        import cv2

        def max_disp(root, split, vid):
            d = os.path.join(root, "toydata", split, "frames", vid)
            centers = []
            for f in sorted(os.listdir(d)):
                img = cv2.imread(os.path.join(d, f), cv2.IMREAD_GRAYSCALE)
                ys, xs = np.where(img > 100)
                centers.append((xs.mean(), ys.mean()))
            c = np.asarray(centers)
            return float(np.linalg.norm(np.diff(c, axis=0), axis=1).max())

        hard = str(tmp_path / "hard")
        make_toydata(hard, frames_per_video=32, image_size=64,
                     anomaly_span=(10, 22), hard=True)
        for split, vid in (("training", "01"), ("testing", "01"),
                           ("testing", "02")):
            assert max_disp(hard, split, vid) <= 7.0, (split, vid)

        easy = str(tmp_path / "easy")
        make_toydata(easy, frames_per_video=32, image_size=64,
                     anomaly_span=(10, 22))
        assert max_disp(easy, "testing", "01") > 15.0


class TestRunTestCLI:
    def test_toydata_end_to_end(self, toydata, tmp_path):
        from ammcnet_aaai2021_tpu.runners.run_test import main

        ret = main(["--dataset_name", "toydata", "--data_dir", toydata,
                    "--save_dir", str(tmp_path / "eval"),
                    "--batch_size", "4", "--image_size", "64"])
        assert 0.0 <= ret["auc"] <= 1.0
        assert ret["fps"] > 0
        with open(ret["pickle"], "rb") as fh:
            rec = pickle.load(fh)
        # golden-pickle schema
        assert set(rec) == {"dataset", "rgb_img_pred_records",
                            "rgb_fea_comm_records", "op_img_pred_records",
                            "op_fea_comm_records"}
        assert len(rec["rgb_img_pred_records"]) == 2
        assert all(len(a) == 16 for a in rec["rgb_img_pred_records"])

    def test_on_the_fly_flow_end_to_end(self, toydata, tmp_path):
        """--on_the_fly_flow: flows come from FlowNet-SD on device instead
        of .flo files (the BASELINE avenue/shanghaitech configuration and
        bench.py's default).  Random FlowNet weights — this pins the CLI
        plumbing (extractor built, .flo reads skipped, records complete),
        not flow quality."""
        from ammcnet_aaai2021_tpu.runners.run_test import main

        ret = main(["--dataset_name", "toydata", "--data_dir", toydata,
                    "--save_dir", str(tmp_path / "otf"),
                    "--batch_size", "4", "--image_size", "64",
                    "--on_the_fly_flow"])
        assert 0.0 <= ret["auc"] <= 1.0
        with open(ret["pickle"], "rb") as fh:
            rec = pickle.load(fh)
        assert len(rec["op_img_pred_records"]) == 2
        # op records must be real numbers driven by the extracted flows
        assert all(np.isfinite(a).all() for a in rec["op_img_pred_records"])
        assert all(np.isfinite(a).all() for a in rec["op_fea_comm_records"])

    def test_fix_flow_bug_flag_changes_records(self, toydata, tmp_path):
        from ammcnet_aaai2021_tpu.runners.run_test import main

        r1 = main(["--dataset_name", "toydata", "--data_dir", toydata,
                   "--save_dir", str(tmp_path / "a"), "--batch_size", "4",
                   "--image_size", "64"])
        r2 = main(["--dataset_name", "toydata", "--data_dir", toydata,
                   "--save_dir", str(tmp_path / "b"), "--batch_size", "4",
                   "--image_size", "64", "--fix_flow_bug"])
        rec1 = pickle.load(open(r1["pickle"], "rb"))
        rec2 = pickle.load(open(r2["pickle"], "rb"))
        # the flow-channel fix must change the op stream's inputs/scores
        assert not np.allclose(rec1["op_img_pred_records"][0],
                               rec2["op_img_pred_records"][0])


class TestWatchEval:
    def test_once_scores_new_checkpoints(self, toydata, tmp_path):
        """Watch-folder evaluator (reference: Code/main/evaluate.py:164-214):
        train 2 steps -> watch_eval --once scores the new checkpoint, appends
        (step, auc, fps) to watch_results.csv, and a rerun re-scores nothing."""
        import csv

        from ammcnet_aaai2021_tpu.runners.run_train import main as train_main
        from ammcnet_aaai2021_tpu.runners.watch_eval import main as watch_main

        run_dir = train_main(
            ["--dataset_name", "toydata", "--data_dir", toydata,
             "--image_size", "64", "--batch_size", "2", "--iterations", "2",
             "--save_dir", str(tmp_path / "runs"),
             "--registry", str(tmp_path / "registry.json"),
             "--n_embed", "64", "--step_save", "2",
             "--exp_tag", "watch-test"])
        best = watch_main(["--run_dir", run_dir, "--dataset_name", "toydata",
                           "--data_dir", toydata, "--once",
                           "--batch_size", "4", "--sweep"])
        assert best[0] == 2 and 0.0 <= best[1] <= 1.0
        rows = list(csv.DictReader(
            open(os.path.join(run_dir, "watch_results.csv"))))
        assert [int(r["step"]) for r in rows] == [2]
        # --sweep appended the live per-channel trajectory columns
        for col in ("psnr_only", "fea_only", "best_lam", "best_auc"):
            assert 0.0 <= float(rows[0][col]) <= 1.0, (col, rows[0])
        assert float(rows[0]["best_auc"]) >= float(rows[0]["psnr_only"])
        # idempotent: a second pass sees the step as already scored
        best2 = watch_main(["--run_dir", run_dir, "--dataset_name", "toydata",
                            "--data_dir", toydata, "--once",
                            "--batch_size", "4"])
        assert best2 == (None, -1.0)  # nothing pending
        rows = list(csv.DictReader(
            open(os.path.join(run_dir, "watch_results.csv"))))
        assert len(rows) == 1


class TestRunTrainCLI:
    def test_stage2_trains_and_checkpoints(self, toydata, tmp_path):
        from ammcnet_aaai2021_tpu.runners.run_train import main
        from ammcnet_aaai2021_tpu.train.checkpoint import latest_step
        from ammcnet_aaai2021_tpu.utils.registry import (
            load_run_config, resolve_run)

        registry = str(tmp_path / "registry.json")
        run_dir = main(["--dataset_name", "toydata", "--data_dir", toydata,
                        "--image_size", "64", "--batch_size", "2",
                        "--iterations", "2", "--save_dir",
                        str(tmp_path / "runs"), "--registry", registry,
                        "--n_embed", "64", "--step_save", "2",
                        "--exp_tag", "e2e-test"])
        ckpts = os.path.join(run_dir, "training", "checkpoints")
        assert latest_step(ckpts) == 2
        # registry round-trip: test mode can rebuild the train-time config
        resolved = resolve_run(registry, "e2e-test")
        assert resolved == run_dir
        cfg = load_run_config(resolved)
        assert cfg.net.n_embed == 64
        assert cfg.data.dataset_name == "toydata"
        # scalars written
        assert os.path.exists(os.path.join(run_dir, "summary", "scalars.csv"))


    def test_stage2_device_backend_trains_and_resumes(self, toydata,
                                                      tmp_path):
        """--backend device: the whole split resident in HBM (here: host
        memory of the CPU device), batches gathered on-device, zero per-step
        pixel H2D.  The run must checkpoint and a second invocation must
        --resume from it and extend the step count — the 80k released-scale
        recipe runs on this backend (PERF.md)."""
        from ammcnet_aaai2021_tpu.runners.run_train import main
        from ammcnet_aaai2021_tpu.train.checkpoint import latest_step

        registry = str(tmp_path / "registry.json")
        common = ["--dataset_name", "toydata", "--data_dir", toydata,
                  "--image_size", "64", "--batch_size", "2",
                  "--save_dir", str(tmp_path / "runs"),
                  "--registry", registry, "--n_embed", "16",
                  "--backend", "device", "--step_log", "1",
                  # the long-run loop options (batched scalar fetches +
                  # writer-thread checkpoints) ride the same path
                  "--fetch_every_periods", "2", "--async_checkpoints"]
        run_dir = main(common + ["--iterations", "2", "--step_save", "2",
                                 "--exp_tag", "dev-backend"])
        ckpts = os.path.join(run_dir, "training", "checkpoints")
        assert latest_step(ckpts) == 2
        # batched-fetch mode must still record every step_log row
        csv_path = os.path.join(run_dir, "summary", "scalars.csv")
        assert os.path.exists(csv_path)
        resumed_dir = main(common + ["--iterations", "4", "--step_save", "2",
                                     "--exp_tag", "dev-backend-resume",
                                     "--resume", run_dir])
        assert latest_step(ckpts) == 2  # original dir untouched past 2
        assert latest_step(os.path.join(resumed_dir, "training",
                                        "checkpoints")) == 4


class TestTwoStageRecipe:
    def test_recipe_chain_executes(self, toydata, tmp_path):
        """Full reference pipeline as one flow: stage-1 rgb -> stage-1 op ->
        graft -> stage-2 -> run_test (train_helper.py:217-427,1323-1850 +
        utils.py:236-263). Tiny step counts: this validates the CHAIN; the
        learning-quality run lives on the real chip (PERF.md)."""
        from ammcnet_aaai2021_tpu.tools.run_recipe import main

        out = main(["--data_dir", toydata, "--dataset_name", "toydata",
                    "--save_dir", str(tmp_path / "recipe"),
                    "--image_size", "64", "--batch_size", "2",
                    "--stage1_iters", "1", "--stage2_iters", "1",
                    "--n_embed", "32", "--k", "1",
                    "--skip_scratch_control"])
        assert 0.0 <= out["auc_pretrained"] <= 1.0
        assert os.path.isdir(out["stage1_rgb"])
        assert os.path.isdir(out["stage1_op"])

    def test_recipe_fix_branches_surface(self, tmp_path):
        """The memory-preserving recipe surface (VERDICT r4 item 4):
        --anomaly generates the appearance world, --fix_branches reaches
        stage-2's optimizer mask, and the output carries the per-channel
        sweep (fea-only / psnr-only / best-fused).  1-step budgets — the
        MECHANISM assertion lives in test_memory_mechanism_on_chip (chip)
        and PERF.md's measured tables."""
        from ammcnet_aaai2021_tpu.tools.run_recipe import main
        from ammcnet_aaai2021_tpu.utils.registry import (load_run_config,
                                                         resolve_run)

        data_dir = str(tmp_path / "appdata")
        save_dir = str(tmp_path / "recipe")
        out = main(["--data_dir", data_dir, "--dataset_name", "toydata",
                    "--anomaly", "appearance", "--fix_branches",
                    "--save_dir", save_dir,
                    "--image_size", "64", "--batch_size", "2",
                    "--stage1_iters", "1", "--stage2_iters", "1",
                    "--n_embed", "32", "--k", "1",
                    "--skip_scratch_control"])
        # world generated by the recipe itself
        assert os.path.isdir(os.path.join(data_dir, "toydata",
                                          "testing", "frames"))
        # frozen-branch mode reached the stage-2 run's config
        run_dir = resolve_run(os.path.join(save_dir, "registry.json"),
                              "recipe-s2-pretrained")
        assert load_run_config(run_dir).optim.fix_branches is True
        # per-channel sweep in the recipe output
        sweep = out["sweep_pretrained"]
        for key in ("psnr_only", "fea_only", "best_lam", "best_auc"):
            assert key in sweep
        assert 0.0 <= sweep["fea_only"] <= 1.0

    @pytest.mark.slow
    @pytest.mark.skipif(not os.environ.get("AMMCNET_TPU_TESTS"),
                        reason="chip test: set AMMCNET_TPU_TESTS=1 (needs "
                               "the TPU tunnel; ~5 min; do not run "
                               "concurrently with another TPU process)")
    def test_memory_mechanism_on_chip(self, tmp_path):
        """Living regression test for the AMMC mechanism itself (VERDICT r4
        item 2): the frozen-branch recipe at the proven round-4 budgets
        (stage-1 400x2 + graft, stage-2 200 --fix_branches, default
        appearance world) must keep the memory channel alive — fea-only
        AUC > 0.5 — and fusion must not lose to PSNR-only.  Measured
        reference points on this exact recipe: fea-only 0.59, best-fused
        >= psnr-only at every budget (PERF.md round-4 2x2 + session-2
        rerun).  Runs in a subprocess with the default (axon) platform —
        the suite process is pinned to CPU."""
        import json
        import subprocess
        import sys

        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)  # let sitecustomize pick axon
        proc = subprocess.run(
            [sys.executable, "-m", "ammcnet_aaai2021_tpu.tools.run_recipe",
             "--data_dir", str(tmp_path / "appdata"),
             "--dataset_name", "toydata", "--anomaly", "appearance",
             "--fix_branches", "--save_dir", str(tmp_path / "recipe"),
             "--stage1_iters", "400", "--stage2_iters", "200",
             "--fetch_every_periods", "10",
             "--skip_scratch_control", "--tag", "mech"],
            capture_output=True, text=True, timeout=3600, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        assert proc.returncode == 0, proc.stderr[-3000:]
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("[recipe] {")][-1]
        out = json.loads(line[len("[recipe] "):])
        sweep = out["sweep_pretrained"]
        assert sweep["fea_only"] > 0.5, sweep
        assert sweep["best_auc"] >= sweep["psnr_only"], sweep


class TestExpTagRoundTrip:
    def test_run_test_resolves_exp_tag(self, toydata, tmp_path):
        """Train registers exp_tag -> run dir with its config; run_test
        --exp_tag must rebuild the exact train-time architecture
        (reference train->test round-trip, models/__init__.py:61-70,149-181)."""
        from ammcnet_aaai2021_tpu.runners.run_test import main as test_main
        from ammcnet_aaai2021_tpu.runners.run_train import main as train_main

        registry = str(tmp_path / "registry.json")
        train_main(["--dataset_name", "toydata", "--data_dir", toydata,
                    "--image_size", "64", "--batch_size", "2",
                    "--iterations", "1", "--save_dir", str(tmp_path / "runs"),
                    "--registry", registry, "--n_embed", "32", "--k", "1",
                    "--exp_tag", "roundtrip"])
        ret = test_main(["--dataset_name", "toydata", "--data_dir", toydata,
                         "--save_dir", str(tmp_path / "eval"),
                         "--batch_size", "4", "--exp_tag", "roundtrip",
                         "--registry", registry])
        # if the n_embed=32/k=1 config had not round-tripped, the generator
        # built here would differ from the trained one; success implies the
        # architecture was rebuilt from the registry config
        assert 0.0 <= ret["auc"] <= 1.0


class TestNativeLoader:
    def test_native_matches_python_loader(self, toydata):
        from ammcnet_aaai2021_tpu.data import native
        from ammcnet_aaai2021_tpu.data.datasets import (
            VideoIndex, _decode_rgb, load_flow)

        if not native.available():
            pytest.skip("native toolchain unavailable")
        idx = VideoIndex(os.path.join(toydata, "toydata", "testing", "frames"))
        paths = idx.videos[idx.names[0]]
        nat = native.decode_video(paths, (64, 64))
        ref = np.stack([_decode_rgb(p, (64, 64)) for p in paths])
        assert int(np.abs(nat.astype(int) - ref.astype(int)).max()) <= 1
        fidx = VideoIndex(os.path.join(toydata, "toydata", "testing", "flows"))
        fpaths = fidx.videos[fidx.names[0]]
        for bug in (True, False):
            natf = native.load_flow_video(fpaths, (64, 64), bug)
            reff = np.stack([load_flow(p, (64, 64), bug) for p in fpaths])
            np.testing.assert_allclose(natf, reff, atol=1e-6)


class TestInt8CLI:
    def test_run_test_int8_end_to_end(self, tmp_path):
        """--int8: quantize + calibrate on the training split, then score
        the test split through the standard eval path (score_dataset with
        the quantized apply_fn).  32x32/10-frame data: int8 convs are
        EMULATED on CPU and minutes-slow at any real size; the chip-side
        throughput claim lives in device_bench --int8 --calibrated
        (PERF.md).  Pins: CLI plumbing, record schema, sane AUC."""
        from ammcnet_aaai2021_tpu.runners.run_test import main

        root = str(tmp_path / "data")
        make_toydata(root, frames_per_video=10, image_size=32)
        ret = main(["--dataset_name", "toydata", "--data_dir", root,
                    "--save_dir", str(tmp_path / "eval"),
                    "--batch_size", "4", "--image_size", "32",
                    "--scorer_mode", "batch",
                    "--int8", "--calib_clips", "4"])
        assert 0.0 <= ret["auc"] <= 1.0
        with open(ret["pickle"], "rb") as fh:
            rec = pickle.load(fh)
        assert len(rec["rgb_img_pred_records"]) == 2
        assert all(len(a) == 10 for a in rec["rgb_img_pred_records"])
        assert all(np.isfinite(a).all() for a in rec["rgb_img_pred_records"])
