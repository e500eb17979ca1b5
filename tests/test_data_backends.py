"""Data-backend tests: framepack round-trip, dataset factory dispatch,
PR-AUC/EER metric parity, on-the-fly flow extractor."""

import os

import numpy as np
import pytest

from ammcnet_aaai2021_tpu.data import get_dataset
from ammcnet_aaai2021_tpu.data.framepack import (
    FramePack,
    FramePackTrainSampler,
    FramePackWriter,
    pack_video_tree,
)
from ammcnet_aaai2021_tpu.eval.scoring import (
    compute_eer,
    precision_recall_auc,
    roc_curve,
)
from ammcnet_aaai2021_tpu.tools.make_toydata import make_toydata


@pytest.fixture(scope="module")
def toydata(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("toy"))
    make_toydata(root, frames_per_video=12, image_size=32)
    return root


class TestFramePack:
    def test_roundtrip(self, tmp_path, rng):
        path = str(tmp_path / "pack.fpk")
        videos = {f"{i:02d}": rng.integers(0, 255, (7 + i, 8, 8, 3), np.uint8)
                  for i in range(3)}
        with FramePackWriter(path, (8, 8, 3), "uint8") as w:
            for name, frames in videos.items():
                w.add_video(name, frames)
        pack = FramePack(path)
        assert pack.names == sorted(videos)
        for name, frames in videos.items():
            np.testing.assert_array_equal(np.asarray(pack.video(name)), frames)
        clip = pack.clip("01", 2, 4)
        assert clip.shape == (8, 8, 12)
        np.testing.assert_array_equal(
            clip[..., :3], videos["01"][2])

    def test_pack_video_tree_matches_loader(self, toydata, tmp_path):
        from ammcnet_aaai2021_tpu.data.datasets import VideoIndex, _decode_rgb

        frames_root = os.path.join(toydata, "toydata", "testing", "frames")
        pack = pack_video_tree(frames_root, str(tmp_path / "t.fpk"),
                               image_size=32)
        idx = VideoIndex(frames_root)
        name = idx.names[0]
        ref = np.stack([_decode_rgb(p, (32, 32)) for p in idx.videos[name]])
        np.testing.assert_array_equal(np.asarray(pack.video(name)), ref)

    def test_train_sampler(self, tmp_path, rng):
        path = str(tmp_path / "s.fpk")
        with FramePackWriter(path, (8, 8, 3), "uint8") as w:
            w.add_video("a", rng.integers(0, 255, (20, 8, 8, 3), np.uint8))
        sampler = FramePackTrainSampler(FramePack(path), clip_length=5,
                                        normalize_rgb=True)
        batch = sampler.batch(4)
        assert batch.shape == (4, 8, 8, 15)
        assert batch.min() >= -1.0 and batch.max() <= 1.0


class TestDatasetFactory:
    def test_testing_mode_returns_none(self):
        assert get_dataset("rgb_op", "testing") is None

    def test_normal_twostream(self, toydata):
        s = get_dataset(
            "rgb_op", "training", "normal",
            rgb_root=os.path.join(toydata, "toydata", "training", "frames"),
            op_root=os.path.join(toydata, "toydata", "training", "flows"),
            image_size=32)
        b = s.batch(2)
        assert b["rgb"].shape == (2, 32, 32, 15)
        assert b["op"].shape == (2, 32, 32, 8)

    def test_framepack_backend(self, toydata, tmp_path):
        frames_root = os.path.join(toydata, "toydata", "training", "frames")
        pack_path = str(tmp_path / "train.fpk")
        pack_video_tree(frames_root, pack_path, image_size=32)
        s = get_dataset("rgb", "training", "framepack", rgb_root=pack_path)
        assert s.batch(2).shape == (2, 32, 32, 15)

    def test_lmdb_backend_retired_loudly(self, toydata):
        with pytest.raises(ValueError, match="framepack"):
            get_dataset("rgb", "training", "lmdb", rgb_root="/nonexistent")

    def test_parallel_batches_deterministic(self, toydata):
        """parallel_batches must yield the exact clips the serial sampler
        yields for the same seed — decode threading must not perturb the
        rng draw sequence."""
        from ammcnet_aaai2021_tpu.data.datasets import parallel_batches

        kwargs = dict(
            rgb_root=os.path.join(toydata, "toydata", "training", "frames"),
            op_root=os.path.join(toydata, "toydata", "training", "flows"),
            image_size=32, seed=11)
        serial = get_dataset("rgb_op", "training", "normal", **kwargs)
        expected = [serial.batch(3) for _ in range(4)]
        parallel = get_dataset("rgb_op", "training", "normal", **kwargs)
        it = parallel_batches(parallel, 3, num_workers=4, depth=2)
        for want in expected:
            got = next(it)
            for k in ("rgb", "op"):
                np.testing.assert_array_equal(got[k], want[k])

    def test_packed_u8_layout_matches_parity_path(self, toydata):
        """The fast path (uint8 + frame-packed + in-step normalize/interleave)
        must produce bit-identical model inputs to the float parity path."""
        from ammcnet_aaai2021_tpu.data.datasets import (
            TwoStreamTrainSampler, VideoIndex)
        from ammcnet_aaai2021_tpu.train.steps import _to_model_range

        kwargs = dict(clip_len_rgb=5, clip_len_op=4, image_size=32, seed=7)
        roots = (VideoIndex(os.path.join(toydata, "toydata", "training",
                                         "frames")),
                 VideoIndex(os.path.join(toydata, "toydata", "training",
                                         "flows")))
        parity = TwoStreamTrainSampler(*roots, **kwargs)
        fast = TwoStreamTrainSampler(*roots, **kwargs,
                                     normalize_rgb=False, packed=True)
        want = parity.batch(3)
        got = fast.batch(3)
        assert got["rgb"].dtype == np.uint8
        assert got["rgb"].shape == (3, 5, 32, 32, 3)
        np.testing.assert_array_equal(
            np.asarray(_to_model_range(got["rgb"])), want["rgb"])
        np.testing.assert_array_equal(
            np.asarray(_to_model_range(got["op"])), want["op"])

    def test_device_resident_matches_host_sampler(self, toydata):
        """The device-resident backend (whole split in HBM, on-device clip
        gather) draws the SAME (video, offset) sequence as the host sampler
        for a seed, and its gathered pixels equal the host sampler's packed
        clips (rgb bit-exact u8; flows exact after the bf16 store)."""
        import ml_dtypes

        from ammcnet_aaai2021_tpu.data.datasets import (
            TwoStreamTrainSampler, VideoIndex)
        from ammcnet_aaai2021_tpu.data.resident import DeviceResidentTwoStream

        roots = (VideoIndex(os.path.join(toydata, "toydata", "training",
                                         "frames")),
                 VideoIndex(os.path.join(toydata, "toydata", "training",
                                         "flows")))
        kwargs = dict(clip_len_rgb=5, clip_len_op=4, image_size=32, seed=11)
        host = TwoStreamTrainSampler(*roots, **kwargs,
                                     normalize_rgb=False, packed=True)
        resident = DeviceResidentTwoStream(*roots, **kwargs)

        got = resident.batch(4)
        # replay the host sampler's identical rng draws for the oracle
        want = host.batch(4)
        assert np.asarray(got["rgb"]).dtype == np.uint8
        assert np.asarray(got["op"]).dtype == ml_dtypes.bfloat16
        np.testing.assert_array_equal(np.asarray(got["rgb"]), want["rgb"])
        np.testing.assert_array_equal(
            np.asarray(got["op"]),
            want["op"].astype(ml_dtypes.bfloat16))

    def test_device_resident_single_stream(self, toydata):
        """Single-stream resident variant: coords match the host sampler and
        rgb gathers are bit-exact."""
        from ammcnet_aaai2021_tpu.data.datasets import (
            ClipLoader, SingleStreamTrainSampler, VideoIndex)
        from ammcnet_aaai2021_tpu.data.resident import (
            DeviceResidentSingleStream)

        index = VideoIndex(os.path.join(toydata, "toydata", "training",
                                        "frames"))
        host = SingleStreamTrainSampler(
            index, 5, ClipLoader("rgb", 32, normalize_rgb=False, packed=True),
            seed=13)
        resident = DeviceResidentSingleStream(index, "rgb", 5,
                                              image_size=32, seed=13)
        got = np.asarray(resident.batch(3))
        want = host.batch(3)
        np.testing.assert_array_equal(got, want)

    def test_framepack_packed_matches_parity_path(self, toydata, tmp_path):
        """Framepack's packed (b,t,h,w,c) one-gather batches must produce
        bit-identical model inputs to its interleaved parity path, with the
        same rng draw sequence for the same seed."""
        from ammcnet_aaai2021_tpu.data.framepack import (
            FramePack, FramePackTwoStreamSampler, pack_video_tree)
        from ammcnet_aaai2021_tpu.train.steps import _to_model_range

        base = os.path.join(toydata, "toydata", "training")
        rgb_p = str(tmp_path / "f.fpk")
        op_p = str(tmp_path / "o.fpk")
        pack_video_tree(os.path.join(base, "frames"), rgb_p, image_size=32)
        pack_video_tree(os.path.join(base, "flows"), op_p, image_size=32,
                        data_type="op")
        kwargs = dict(clip_len_rgb=5, clip_len_op=4, seed=13)
        parity = FramePackTwoStreamSampler(FramePack(rgb_p), FramePack(op_p),
                                           **kwargs)
        fast = FramePackTwoStreamSampler(FramePack(rgb_p), FramePack(op_p),
                                         **kwargs, normalize_rgb=False,
                                         packed=True)
        want = parity.batch(3)
        got = fast.batch(3)
        assert got["rgb"].dtype == np.uint8
        assert got["rgb"].shape == (3, 5, 32, 32, 3)
        assert got["op"].shape == (3, 4, 32, 32, 2)
        np.testing.assert_allclose(
            np.asarray(_to_model_range(got["rgb"]), np.float32),
            want["rgb"], atol=1e-7)
        np.testing.assert_array_equal(
            np.asarray(_to_model_range(got["op"])), want["op"])

    def test_parallel_batches_single_stream(self, toydata):
        from ammcnet_aaai2021_tpu.data.datasets import (
            ClipLoader, SingleStreamTrainSampler, VideoIndex,
            parallel_batches)

        root = os.path.join(toydata, "toydata", "training", "frames")
        mk = lambda: SingleStreamTrainSampler(
            VideoIndex(root), 5, ClipLoader("rgb", 32), seed=3)
        want = mk().batch(2)
        got = next(parallel_batches(mk(), 2, num_workers=4))
        np.testing.assert_array_equal(got, want)

    def test_unknown_backend(self):
        with pytest.raises(ValueError, match="which_ds"):
            get_dataset("rgb", "training", "nope")


class TestAltMetrics:
    def test_pr_auc_matches_sklearn(self, rng):
        sklearn = pytest.importorskip("sklearn.metrics")
        labels = (rng.random(2000) < 0.3).astype(np.int8)
        scores = rng.normal(size=2000) - labels * 0.5
        p, r, _ = sklearn.precision_recall_curve(labels, scores, pos_label=0)
        expected = sklearn.auc(r, p)
        got = precision_recall_auc(labels, scores, pos_label=0)
        assert got == pytest.approx(expected, abs=1e-3)

    def test_eer_matches_reference_formula(self, rng):
        sklearn = pytest.importorskip("sklearn.metrics")
        labels = (rng.random(2000) < 0.3).astype(np.int8)
        scores = rng.normal(size=2000) - labels * 0.5
        fpr, tpr, _ = sklearn.roc_curve(labels, scores, pos_label=0)
        expected = fpr[np.nanargmin(np.abs(fpr + tpr - 1))]
        assert compute_eer(labels, scores) == pytest.approx(expected, abs=1e-6)

    def test_roc_curve_matches_sklearn(self, rng):
        sklearn = pytest.importorskip("sklearn.metrics")
        labels = (rng.random(500) < 0.4).astype(np.int8)
        scores = rng.normal(size=500)
        fpr_sk, tpr_sk, _ = sklearn.roc_curve(labels, scores, pos_label=0,
                                              drop_intermediate=False)
        fpr, tpr = roc_curve(labels, scores)
        np.testing.assert_allclose(fpr, fpr_sk, atol=1e-12)
        np.testing.assert_allclose(tpr, tpr_sk, atol=1e-12)


class TestPerFrameMetrics:
    def test_registry_and_values(self, rng):
        import jax.numpy as jnp

        from ammcnet_aaai2021_tpu.ops.metrics import (
            PER_FRAME_METRICS, mse_per_frame, psnr_per_frame, ssim_per_frame)

        assert set(PER_FRAME_METRICS) == {"psnr", "mse", "ssim"}
        a = jnp.asarray(rng.uniform(-1, 1, (3, 16, 16, 3)).astype(np.float32))
        assert np.allclose(np.asarray(ssim_per_frame(a, a)), 1.0, atol=1e-5)
        assert np.all(np.asarray(mse_per_frame(a, a)) == 0.0)
        # psnr of identical frames is +inf; a perturbed pair is finite
        b = a * 0.99
        assert np.all(np.isfinite(np.asarray(psnr_per_frame(a, b))))

    def test_ssim_matches_torch_oracle(self, rng):
        torch = pytest.importorskip("torch")
        import jax.numpy as jnp
        import torch.nn.functional as F

        from ammcnet_aaai2021_tpu.ops.metrics import ssim_per_frame

        a = rng.uniform(-1, 1, (2, 24, 24, 3)).astype(np.float32)
        b = (a + 0.05 * rng.normal(size=a.shape)).astype(np.float32)

        def torch_ssim(x, y, window_size=11, sigma=1.5):
            coords = torch.arange(window_size).float() - window_size // 2
            g = torch.exp(-(coords ** 2) / (2 * sigma ** 2))
            g = g / g.sum()
            w2 = torch.outer(g, g)
            C = x.shape[1]
            w = w2.expand(C, 1, window_size, window_size).contiguous()
            pad = window_size // 2
            mu1 = F.conv2d(x, w, padding=pad, groups=C)
            mu2 = F.conv2d(y, w, padding=pad, groups=C)
            s1 = F.conv2d(x * x, w, padding=pad, groups=C) - mu1 * mu1
            s2 = F.conv2d(y * y, w, padding=pad, groups=C) - mu2 * mu2
            s12 = F.conv2d(x * y, w, padding=pad, groups=C) - mu1 * mu2
            C1, C2 = 0.01 ** 2, 0.03 ** 2
            m = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
                (mu1 * mu1 + mu2 * mu2 + C1) * (s1 + s2 + C2))
            return m.mean(dim=(1, 2, 3))

        ref = torch_ssim(torch.from_numpy(a.transpose(0, 3, 1, 2).copy()),
                         torch.from_numpy(b.transpose(0, 3, 1, 2).copy()))
        got = ssim_per_frame(jnp.asarray(a), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                                   rtol=1e-4, atol=1e-5)


class TestOnTheFlyFlow:
    def test_extractor_shapes_and_normalization(self, rng):
        import jax
        import jax.numpy as jnp

        from ammcnet_aaai2021_tpu.eval.infer import make_otf_flow_extractor
        from ammcnet_aaai2021_tpu.models.flownet_sd import FlowNet2SD

        flownet = FlowNet2SD(dtype=jnp.float32)
        size = 64
        flow_vars = flownet.init({"params": jax.random.PRNGKey(0)},
                                 jnp.zeros((1, size, size, 3, 2)))
        video = jnp.asarray(
            rng.integers(0, 255, (9, size, size, 3), np.uint8))
        ex_bug = make_otf_flow_extractor(flownet, flow_vars, True, chunk=4)
        flows = ex_bug(video)
        assert flows.shape == (8, size, size, 2)
        assert flows.dtype == jnp.bfloat16
        # bug mode: ch1 == ch0 / w
        f = np.asarray(flows, np.float32)
        np.testing.assert_allclose(f[..., 1], f[..., 0] / size,
                                   rtol=1e-2, atol=1e-6)

    def test_extractor_aot_hooks(self, rng):
        """bench.py AOT-warms the extract program via the .jitted/.variables
        hooks (compile-only under a deadline); pin the contract and that the
        lowered program matches the eager path."""
        import jax
        import jax.numpy as jnp

        from ammcnet_aaai2021_tpu.eval.infer import make_otf_flow_extractor
        from ammcnet_aaai2021_tpu.models.flownet_sd import FlowNet2SD

        flownet = FlowNet2SD(dtype=jnp.float32)
        size = 64
        flow_vars = flownet.init({"params": jax.random.PRNGKey(0)},
                                 jnp.zeros((1, size, size, 3, 2)))
        ex = make_otf_flow_extractor(flownet, flow_vars, True, chunk=4)
        video = jnp.asarray(
            rng.integers(0, 255, (9, size, size, 3), np.uint8))
        fv_sds = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), ex.variables)
        compiled = ex.jitted.lower(
            fv_sds, jax.ShapeDtypeStruct(video.shape, video.dtype)).compile()
        np.testing.assert_array_equal(
            np.asarray(compiled(ex.variables, video), np.float32),
            np.asarray(ex(video), np.float32))
