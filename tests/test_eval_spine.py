"""Eval-spine tests: golden-AUC regression, sklearn-free ROC parity, .flo IO.

The golden test reproduces the reference's published headline number
(Ped2 frame-level AUC = 0.966, README.md:52 / img/ped2.png) from the released
per-frame score pickles through our scoring pipeline — validating record
normalization, fusion, smoothing, and AUC end to end.
"""

import numpy as np
import pytest

from ammcnet_aaai2021_tpu.configs import FUSION_LAMBDAS
from ammcnet_aaai2021_tpu.data.flo import read_flo, write_flo
from ammcnet_aaai2021_tpu.eval import (
    GroundTruthLoader,
    img_pred_fea_comm_auc,
    ped2_builtin_gt,
    roc_auc,
)
from ammcnet_aaai2021_tpu.eval.scoring import fuse_and_smooth, normalize_records


class TestGoldenAUC:
    def test_ped2_headline_auc(self, golden_pickles):
        records = golden_pickles["ped2"]
        lengths = [len(a) for a in records["rgb_img_pred_records"]]
        gt = ped2_builtin_gt(lengths)
        auc = img_pred_fea_comm_auc(records, gt, FUSION_LAMBDAS["ped2"])
        # README screenshot reports 0.966 from this exact pickle.
        assert round(auc, 3) == 0.966

    def test_ped2_via_gt_loader_fallback(self, golden_pickles):
        records = golden_pickles["ped2"]
        lengths = [len(a) for a in records["rgb_img_pred_records"]]
        gt = GroundTruthLoader(data_dir="/nonexistent")("ped2", video_lengths=lengths)
        auc = img_pred_fea_comm_auc(records, gt, FUSION_LAMBDAS["ped2"])
        assert round(auc, 3) == 0.966


class TestRocAuc:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_sklearn(self, seed):
        sklearn = pytest.importorskip("sklearn.metrics")
        rng = np.random.default_rng(seed)
        labels = (rng.random(5000) < 0.3).astype(np.int8)
        scores = rng.normal(size=5000) - labels * 0.7
        fpr, tpr, _ = sklearn.roc_curve(labels, scores, pos_label=0)
        expected = sklearn.auc(fpr, tpr)
        assert roc_auc(labels, scores, pos_label=0) == pytest.approx(expected, abs=1e-12)

    def test_with_score_ties(self):
        sklearn = pytest.importorskip("sklearn.metrics")
        labels = np.array([0, 0, 1, 1, 0, 1, 0, 0])
        scores = np.array([0.9, 0.9, 0.1, 0.1, 0.5, 0.5, 0.5, 0.2])
        fpr, tpr, _ = sklearn.roc_curve(labels, scores, pos_label=0)
        expected = sklearn.auc(fpr, tpr)
        assert roc_auc(labels, scores, pos_label=0) == pytest.approx(expected, abs=1e-12)

    def test_perfect_separation(self):
        labels = np.array([1, 1, 0, 0])
        scores = np.array([0.0, 0.1, 0.8, 0.9])
        assert roc_auc(labels, scores, pos_label=0) == pytest.approx(1.0)


class TestScoringComponents:
    def test_normalize_records_per_video_then_global(self):
        recs = [np.array([4.0, 6.0, 8.0, 10.0, 10.0, 20.0]),
                np.array([0.0, 1.0, 2.0, 3.0, 4.0, 8.0])]
        out = normalize_records(recs, decidable_idx=4)
        # per-video: video0 -> [.375, 1.0], video1 -> [.5, 1.0]; global minmax
        expected = np.array([0.375, 1.0, 0.5, 1.0])
        expected = (expected - expected.min()) / (expected.max() - expected.min())
        np.testing.assert_allclose(out, expected)

    def test_fuse_and_smooth_is_fir_not_iir(self):
        # The reference list comprehension reads the ORIGINAL scores, so the
        # smoothing must be y[i] = (1-l2)*x[i-1] + l2*x[i], not recursive.
        x_img = np.array([1.0, 0.0, 0.0, 0.0])
        x_fea = np.ones(4)  # (1 - fea) == 0 -> fused == (1-l1)*img
        out = fuse_and_smooth(x_img, x_fea, lam_fea_comm=0.0, lam_smooth=0.5)
        np.testing.assert_allclose(out, [1.0, 0.5, 0.0, 0.0])

    def test_smoothing_matches_reference_listcomp(self, rng):
        x = rng.random(100)
        lam2 = 0.55
        ref = [
            (1 - lam2) * x[i - 1] + lam2 * x[i] if i > 0 else x[i]
            for i in range(len(x))
        ]
        out = fuse_and_smooth(x, np.ones_like(x), 0.0, lam2)
        np.testing.assert_allclose(out, ref)


class TestFloIO:
    def test_roundtrip(self, tmp_path, rng):
        flow = rng.normal(size=(17, 23, 2)).astype(np.float32)
        path = str(tmp_path / "a.flo")
        write_flo(path, flow)
        got = read_flo(path)
        assert got.shape == (17, 23, 2)
        np.testing.assert_array_equal(got, flow)

    def test_bad_magic_rejected(self, tmp_path):
        path = tmp_path / "bad.flo"
        path.write_bytes(b"\x00" * 24)
        with pytest.raises(ValueError, match="magic"):
            read_flo(str(path))
