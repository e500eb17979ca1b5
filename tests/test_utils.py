"""Utils tests: flow color wheel vs the reference algorithm, checkpoint
round-trip, config JSON round-trip, logging, profiling."""

import dataclasses
import os

import numpy as np
import pytest

from ammcnet_aaai2021_tpu.configs import ExperimentConfig, NetConfig, preset
from ammcnet_aaai2021_tpu.utils.vis import (
    batch_flow_to_image,
    compute_color,
    flow_to_image,
    make_color_wheel,
)


class TestColorWheel:
    def test_wheel_shape_and_anchors(self):
        wheel = make_color_wheel()
        assert wheel.shape == (55, 3)
        np.testing.assert_array_equal(wheel[0], [255, 0, 0])  # pure red start

    def test_matches_reference_per_pixel_loop(self, rng):
        """Oracle: the reference's per-pixel compute_color loop
        (flowlib.py:489-530), reimplemented scalar-wise."""
        u = rng.normal(size=(9, 7)) * 0.8
        v = rng.normal(size=(9, 7)) * 0.8
        wheel = make_color_wheel()
        ncols = wheel.shape[0]
        expected = np.zeros((9, 7, 3), np.uint8)
        for i in range(9):
            for j in range(7):
                rad = np.sqrt(u[i, j] ** 2 + v[i, j] ** 2)
                a = np.arctan2(-v[i, j], -u[i, j]) / np.pi
                fk = (a + 1) / 2 * (ncols - 1) + 1
                k0 = int(np.floor(fk))
                k1 = 1 if k0 + 1 == ncols + 1 else k0 + 1
                f = fk - k0
                for c in range(3):
                    col0 = wheel[k0 - 1, c] / 255.0
                    col1 = wheel[k1 - 1, c] / 255.0
                    col = (1 - f) * col0 + f * col1
                    if rad <= 1:
                        col = 1 - rad * (1 - col)
                    else:
                        col *= 0.75
                    expected[i, j, c] = int(np.floor(255 * col))
        got = compute_color(u, v)
        np.testing.assert_array_equal(got, expected)

    def test_flow_to_image_batch(self, rng):
        flows = rng.normal(size=(2, 8, 8, 2)).astype(np.float32)
        imgs = batch_flow_to_image(flows)
        assert imgs.shape == (2, 8, 8, 3) and imgs.dtype == np.uint8

    def test_unknown_flow_zeroed(self):
        flow = np.full((4, 4, 2), 1e8, np.float32)
        img = flow_to_image(flow)
        np.testing.assert_array_equal(img, 0)


class TestCheckpointRoundtrip:
    def test_orbax_save_restore(self, tmp_path):
        import jax.numpy as jnp

        from ammcnet_aaai2021_tpu.train.checkpoint import (
            latest_step, restore_checkpoint, save_checkpoint)

        state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
                 "step": jnp.int32(7)}
        save_checkpoint(str(tmp_path), 7, state)
        save_checkpoint(str(tmp_path), 12, state)
        assert latest_step(str(tmp_path)) == 12
        restored = restore_checkpoint(str(tmp_path),
                                      {"params": {"w": jnp.zeros((2, 3))},
                                       "step": jnp.int32(0)}, step=7)
        np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                      np.arange(6.0).reshape(2, 3))

    def test_prune_retention_policy(self, tmp_path):
        """prune_checkpoints keeps newest-N union every-K union latest
        (VERDICT r3: the 80k run wrote 80 x 296 MB without a knob)."""
        import jax.numpy as jnp

        from ammcnet_aaai2021_tpu.train.checkpoint import (
            latest_step, prune_checkpoints, save_checkpoint)

        state = {"w": jnp.zeros((2,))}
        for s in (1000, 2000, 3000, 4000, 5000):
            save_checkpoint(str(tmp_path), s, state)
        # no policy -> no-op
        assert prune_checkpoints(str(tmp_path)) == []
        deleted = prune_checkpoints(str(tmp_path), keep_last=2,
                                    keep_every=2000)
        assert deleted == [1000, 3000]
        kept = sorted(int(d) for d in os.listdir(tmp_path) if d.isdigit())
        assert kept == [2000, 4000, 5000]
        assert latest_step(str(tmp_path)) == 5000
        # keep_last alone always preserves the newest
        deleted = prune_checkpoints(str(tmp_path), keep_last=1)
        assert deleted == [2000, 4000]
        assert latest_step(str(tmp_path)) == 5000

    def test_msgpack_roundtrip(self, tmp_path):
        import jax.numpy as jnp

        from ammcnet_aaai2021_tpu.train.checkpoint import (
            load_msgpack, save_msgpack)

        variables = {"params": {"k": jnp.ones((3, 3))}}
        path = str(tmp_path / "v.msgpack")
        save_msgpack(path, variables)
        out = load_msgpack(path, {"params": {"k": jnp.zeros((3, 3))}})
        np.testing.assert_array_equal(np.asarray(out["params"]["k"]), 1.0)


class TestConfig:
    def test_json_roundtrip_preserves_nested(self):
        cfg = preset("avenue")
        cfg = dataclasses.replace(
            cfg, net=dataclasses.replace(cfg.net, n_embed=128, k=3))
        restored = ExperimentConfig.from_json(cfg.to_json())
        assert restored == cfg

    def test_fusion_preset_values(self):
        # reference test_helper.py:565-569
        from ammcnet_aaai2021_tpu.configs import FUSION_LAMBDAS

        assert FUSION_LAMBDAS["ped2"] == (0.01, 0.55)
        assert FUSION_LAMBDAS["avenue"] == (0.04, 0.65)
        assert FUSION_LAMBDAS["shanghaitech"] == (0.13, 0.60)

    def test_unknown_dataset_rejected(self):
        with pytest.raises(ValueError, match="unknown dataset"):
            preset("ped3")

    def test_train_loss_preset_gdl_key_bug(self):
        """Reference parity: for vq loss tags the ini reader takes lam_gdl
        from the lam_adv key (constant_train.py:316,336)."""
        from ammcnet_aaai2021_tpu.configs import train_loss_preset

        shipped = train_loss_preset("ped2", "twostream_vq")
        assert shipped.lam_gdl == shipped.lam_adv == 0.05
        fixed = train_loss_preset("ped2", "twostream_vq",
                                  reproduce_gdl_key_bug=False)
        assert fixed.lam_gdl == 1.0
        # non-vq tags read the real gdl key either way
        stage1 = train_loss_preset("avenue", "rgb_int_gdl_flow_adv")
        assert stage1.lam_gdl == 1.0

    def test_preset_wires_per_dataset_loss(self):
        cfg = preset("avenue", mode="training")
        assert cfg.loss.loss_tag == "twostream_vq"
        assert cfg.loss.lam_latent == 0.25
        assert cfg.loss.lam_gdl == cfg.loss.lam_adv


class TestCompileCache:
    """(folded from the round-2 review-fix grab-bag file)"""

    def test_cpu_cache_dir_is_machine_keyed(self, tmp_path):
        # CPU-only processes must never share AOT executables across
        # machines (cpu_aot_loader SIGILL risk after a VM migration); the
        # suite runs under jax_platforms=cpu so the subdir must be applied
        from ammcnet_aaai2021_tpu.utils.compile_cache import (
            _machine_fingerprint, enable_compilation_cache)

        got = enable_compilation_cache(str(tmp_path / "cache"))
        fp = _machine_fingerprint()
        assert got == str(tmp_path / "cache" / f"cpu-{fp}")
        assert os.path.isdir(got)
        assert len(fp) == 10
        # fingerprint is stable within one host
        assert _machine_fingerprint() == fp
        # restore the suite-wide cache dir (conftest set it at import)
        enable_compilation_cache()
