"""Loss tests: torch-oracle parity for every primitive + composition wiring."""

import jax.numpy as jnp
import numpy as np
import pytest

from ammcnet_aaai2021_tpu.configs import LossConfig
from ammcnet_aaai2021_tpu.losses import (
    LOSS_TAGS,
    adversarial_loss,
    discriminate_loss,
    flow_loss,
    get_loss,
    gradient_loss,
    intensity_loss,
)

torch = pytest.importorskip("torch")


@pytest.fixture()
def frames(rng):
    gen = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    gt = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    return gen, gt


def to_torch(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


class TestPrimitivesTorchParity:
    def test_flow_loss(self, frames):
        gen, gt = frames
        ref = torch.mean(torch.abs(to_torch(gen) - to_torch(gt))).item()
        assert float(flow_loss(jnp.asarray(gen), jnp.asarray(gt))) == pytest.approx(ref, rel=1e-6)

    def test_intensity_l1(self, frames):
        gen, gt = frames
        ref = torch.abs(to_torch(gen) - to_torch(gt)).mean().item()
        got = float(intensity_loss(jnp.asarray(gen), jnp.asarray(gt), l_num=1))
        assert got == pytest.approx(ref, rel=1e-6)

    def test_intensity_l2_is_channel_norm(self, frames):
        # reference L2 = torch.norm(diff, p=2, dim=1).mean()
        gen, gt = frames
        ref = torch.norm(to_torch(gen) - to_torch(gt), p=2, dim=1).mean().item()
        got = float(intensity_loss(jnp.asarray(gen), jnp.asarray(gt), l_num=2))
        assert got == pytest.approx(ref, rel=1e-5)

    def test_gradient_loss(self, frames):
        gen, gt = frames
        # torch oracle per losses_utils.py:30-61
        tg, tt = to_torch(gen), to_torch(gt)
        filt = torch.FloatTensor([[-1.0, 1.0]])
        fx = filt.view(1, 1, 1, 2).repeat(1, 3, 1, 1)
        fy = filt.view(1, 1, 2, 1).repeat(1, 3, 1, 1)
        import torch.nn.functional as F
        gen_dx = F.conv2d(F.pad(tg, (1, 0, 0, 0)), fx)
        gen_dy = F.conv2d(F.pad(tg, (0, 0, 1, 0)), fy)
        gt_dx = F.conv2d(F.pad(tt, (1, 0, 0, 0)), fx)
        gt_dy = F.conv2d(F.pad(tt, (0, 0, 1, 0)), fy)
        ref = torch.mean(torch.abs(gt_dx - gen_dx) ** 1
                         + torch.abs(gt_dy - gen_dy) ** 1).item()
        got = float(gradient_loss(jnp.asarray(gen), jnp.asarray(gt), alpha=1))
        assert got == pytest.approx(ref, rel=1e-5)

    def test_lsgan_pair(self, rng):
        d_real = rng.normal(size=(2, 34, 34, 1)).astype(np.float32)
        d_fake = rng.normal(size=(2, 34, 34, 1)).astype(np.float32)
        tr, tf = torch.from_numpy(d_real), torch.from_numpy(d_fake)
        ref_g = torch.mean((tf - 1) ** 2 / 2).item()
        ref_d = (torch.mean((tr - 1) ** 2 / 2) + torch.mean(tf ** 2 / 2)).item()
        assert float(adversarial_loss(jnp.asarray(d_fake))) == pytest.approx(ref_g, rel=1e-6)
        assert float(discriminate_loss(jnp.asarray(d_real), jnp.asarray(d_fake))) == pytest.approx(ref_d, rel=1e-6)


class TestCompositions:
    def _batch(self, rng):
        f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
        return {
            "rgb_pred": f(2, 16, 16, 3), "rgb_target": f(2, 16, 16, 3),
            "op_pred": f(2, 16, 16, 2), "op_target": f(2, 16, 16, 2),
            "d_gen": f(2, 3, 3, 1),
            "flow_pred": f(2, 16, 16, 2), "flow_gt": f(2, 16, 16, 2),
            "latent_diff": (jnp.float32(0.25), jnp.float32(0.5)),
        }

    @pytest.mark.parametrize("tag", sorted(LOSS_TAGS))
    def test_all_tags_compute(self, tag, rng):
        g_fn, d_fn = get_loss(tag)
        g, comps = g_fn(self._batch(rng), LossConfig(loss_tag=tag))
        assert np.isfinite(float(g))
        assert all(np.isfinite(float(v)) for v in comps.values())

    def test_twostream_vq_weights_apply(self, rng):
        b = self._batch(rng)
        g_fn, _ = get_loss("twostream_vq")
        w0 = LossConfig(lam_latent=0.0)
        w1 = LossConfig(lam_latent=1.0)
        g0, _ = g_fn(b, w0)
        g1, _ = g_fn(b, w1)
        # latent tuple sums to 0.75
        assert float(g1) - float(g0) == pytest.approx(0.75, rel=1e-5)

    def test_unknown_tag_raises(self):
        with pytest.raises(ValueError, match="unknown loss_tag"):
            get_loss("nope")
