"""Model-zoo tests: param counts vs the reference's recorded torchsummaryX
totals, output shapes, torch numeric parity for the layers whose conversion
semantics are nontrivial (ConvTranspose, BatchNorm), and factory dispatch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ammcnet_aaai2021_tpu.configs import NetConfig
from ammcnet_aaai2021_tpu.models import (
    NET_TAGS,
    PixelDiscriminator,
    TwoStreamUNetMem,
    UNetMemStream,
    build_generator,
    build_model,
)
from ammcnet_aaai2021_tpu.models.vqvae import (
    VQVAE,
    VQVAETopK,
    VQVAETopKRes,
    VQVAETopKTwoStream,
)


def n_params(variables):
    return sum(x.size for x in jax.tree.leaves(variables["params"]))


def init_model(module, *shapes):
    inputs = [jnp.zeros(s) for s in shapes]
    return module.init({"params": jax.random.PRNGKey(0)}, *inputs), inputs


class TestParamCounts:
    """Totals recorded by the reference's torchsummaryX harnesses."""

    def test_twostream_25_049M(self):
        # unet.py:1268-1275: 25.049029M @ embed_dim=64, n_embed=512, k=2
        m = TwoStreamUNetMem(rgb_out=3, op_out=2, embed_dim=64, n_embed=512, k=2)
        vs, _ = init_model(m, (1, 32, 32, 12), (1, 32, 32, 6))
        assert n_params(vs) == 25_049_029

    def test_unetmem_v4_7_855M(self):
        # ground truth from instantiating the reference torch UNetMem_v4
        # directly: 7,855,363 @ embed_dim=64, n_embed=512, k=2 (the
        # 7.377731M docstring at unet.py:1206 belongs to the v3 harness)
        from ammcnet_aaai2021_tpu.models import UNetMemV4

        m = UNetMemV4(out_channels=3, embed_dim=64, n_embed=512, k=2,
                      dtype=jnp.float32)
        vs, _ = init_model(m, (1, 32, 32, 12))
        assert n_params(vs) == 7_855_363

    def test_unetmem_v7_7_806M(self):
        # unet.py:1283-1290 records 7.805891M for the rgb stage-1 net
        m = UNetMemStream(out_channels=3, embed_dim=64, n_embed=512, k=2)
        vs, _ = init_model(m, (1, 32, 32, 12))
        assert n_params(vs) == 7_805_891

    # NOTE: exact VQVAE-family totals below were obtained by instantiating
    # the reference torch modules directly (the docstring totals at
    # vqvae.py:407-420 are mislabeled: 1.442371M belongs to _res, not _topk).

    def test_vqvae_1_413M(self):
        m = VQVAE(out_channel=3, dtype=jnp.float32)
        vs, _ = init_model(m, (1, 64, 64, 27))
        assert n_params(vs) == 1_413_443

    def test_vqvae_topk_1_422M(self):
        m = VQVAETopK(out_channel=3, dtype=jnp.float32)
        vs, _ = init_model(m, (1, 64, 64, 27))
        assert n_params(vs) == 1_421_763

    def test_vqvae_topk_res_1_442M(self):
        m = VQVAETopKRes(out_channel=3, dtype=jnp.float32)
        vs, _ = init_model(m, (1, 64, 64, 27))
        assert n_params(vs) == 1_442_371

    def test_vqvae_twostream_3_029M(self):
        # vqvae.py:652-672: 3.028613M @ in (27, 16), k=1
        m = VQVAETopKTwoStream(rgb_out=3, op_out=2, dtype=jnp.float32)
        vs, _ = init_model(m, (1, 64, 64, 27), (1, 64, 64, 16))
        assert n_params(vs) == 3_028_613


class TestForwardShapes:
    def test_twostream_outputs(self):
        m = TwoStreamUNetMem(rgb_out=3, op_out=2, embed_dim=64, n_embed=256, k=2)
        vs, inputs = init_model(m, (2, 64, 64, 12), (2, 64, 64, 6))
        rgb, op, diffs, codes = m.apply(vs, *inputs)
        assert rgb.shape == (2, 64, 64, 3) and op.shape == (2, 64, 64, 2)
        assert rgb.dtype == jnp.float32
        assert len(diffs) == 2 and all(d.shape == () for d in diffs)
        # tanh output range
        assert float(jnp.max(jnp.abs(rgb))) <= 1.0

    def test_twostream_train_mutates_codebook_and_bn(self):
        m = TwoStreamUNetMem(rgb_out=3, op_out=2, embed_dim=64, n_embed=256, k=2)
        vs, inputs = init_model(m, (2, 32, 32, 12), (2, 32, 32, 6))
        out, updates = m.apply(vs, *inputs, True,
                               mutable=["codebook", "batch_stats"])
        assert "codebook" in updates and "batch_stats" in updates
        old = vs["codebook"]["rgb"]["vq_down3"]["quan"]["quantize"]["cluster_size"]
        new = updates["codebook"]["rgb"]["vq_down3"]["quan"]["quantize"]["cluster_size"]
        assert not np.allclose(np.asarray(old), np.asarray(new))

    def test_discriminator_patch_map(self):
        d = PixelDiscriminator()
        vs, (x,) = init_model(d, (2, 256, 256, 3))
        out = d.apply(vs, x)
        # three stride-2 convs with p=2 k=4: 256 -> 129 -> 65 -> 33, final s1
        assert out.shape == (2, 34, 34, 1)

    def test_vqvae_topk_res_forward(self):
        m = VQVAETopKRes(out_channel=3, dtype=jnp.float32)
        vs, (x,) = init_model(m, (1, 64, 64, 27))
        dec, diff = m.apply(vs, x)
        assert dec.shape == (1, 64, 64, 3)
        assert diff.shape == ()

    def test_vqvae_twostream_forward(self):
        m = VQVAETopKTwoStream(rgb_out=3, op_out=2, dtype=jnp.float32)
        vs, inputs = init_model(m, (1, 64, 64, 27), (1, 64, 64, 16))
        d1, d2, diff = m.apply(vs, *inputs)
        assert d1.shape == (1, 64, 64, 3) and d2.shape == (1, 64, 64, 2)


class TestFactory:
    @pytest.mark.parametrize("tag", NET_TAGS)
    def test_all_tags_construct(self, tag):
        cfg = NetConfig(net_tag=tag, dtype="float32")
        m = build_generator(cfg)
        assert m is not None

    def test_build_model_training_has_d_and_flownet(self):
        model = build_model(NetConfig(), mode="training")
        assert model.discriminator is not None
        assert model.flow_network is not None

    def test_build_model_testing_generator_only(self):
        model = build_model(NetConfig(), mode="testing")
        assert model.discriminator is None and model.flow_network is None

    def test_broken_reference_tags_fail_loudly(self):
        # these reference tags dispatch to non-runnable dead code
        # (SURVEY.md 2.3.6; verified against the source: UNetMem_v1/v2/v3
        # tuple-call outc, twostream_add_dire references undefined `diff`)
        for tag in ("unet_vq", "unet_vq_res", "unet_vq_topk",
                    "twostream_add_dire"):
            with pytest.raises(ValueError, match="non-runnable"):
                build_generator(NetConfig(net_tag=tag, dtype="float32"))

    def test_tags_match_reference_net_map(self):
        # reference net_map keys (models/__init__.py:92-107) minus the four
        # that dispatch to non-runnable classes == our NET_TAGS
        reference_tags = {
            "vqvae", "vqvae_topk", "vqvae_topk_res", "vqvae_twostream",
            "unet", "unet_vq_topk_res", "unet_vq_twostream",
            "twostream_concat_dire",
        }
        assert set(NET_TAGS) == reference_tags

    def test_concat_dire_is_amft_as_shipped(self):
        # reference twostream_concat_dire wires the AMFT bridge
        # (unet.py:1043), so its params must equal the twostream's
        import jax

        a = build_generator(NetConfig(net_tag="unet_vq_twostream",
                                      dtype="float32"))
        b = build_generator(NetConfig(net_tag="twostream_concat_dire",
                                      dtype="float32"))
        va, _ = init_model(a, (1, 32, 32, 12), (1, 32, 32, 6))
        vb, _ = init_model(b, (1, 32, 32, 12), (1, 32, 32, 6))
        assert (jax.tree.structure(va["params"])
                == jax.tree.structure(vb["params"]))


class TestTorchParity:
    """Numeric parity for conversion-critical layers against torch CPU."""

    def test_conv_transpose_2x2(self):
        torch = pytest.importorskip("torch")
        from flax import linen as nn

        torch.manual_seed(1)
        tconv = torch.nn.ConvTranspose2d(4, 2, 2, stride=2)
        x = torch.randn(2, 4, 8, 8)
        with torch.no_grad():
            ref = tconv(x).permute(0, 2, 3, 1).numpy()
        kern = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)  # ->(kh,kw,out,in)
        m = nn.ConvTranspose(2, (2, 2), strides=(2, 2), padding="SAME",
                             transpose_kernel=True)
        out = m.apply(
            {"params": {"kernel": jnp.asarray(kern),
                        "bias": jnp.asarray(tconv.bias.detach().numpy())}},
            jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_conv_transpose_4x4_s2_p1(self):
        torch = pytest.importorskip("torch")
        from flax import linen as nn

        torch.manual_seed(2)
        tconv = torch.nn.ConvTranspose2d(3, 5, 4, stride=2, padding=1)
        x = torch.randn(1, 3, 16, 16)
        with torch.no_grad():
            ref = tconv(x).permute(0, 2, 3, 1).numpy()
        kern = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
        m = nn.ConvTranspose(5, (4, 4), strides=(2, 2), padding="SAME",
                             transpose_kernel=True)
        out = m.apply(
            {"params": {"kernel": jnp.asarray(kern),
                        "bias": jnp.asarray(tconv.bias.detach().numpy())}},
            jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_batchnorm_eval_parity(self):
        torch = pytest.importorskip("torch")
        from flax import linen as nn

        torch.manual_seed(3)
        tbn = torch.nn.BatchNorm2d(6)
        tbn.weight.data.uniform_(0.5, 1.5)
        tbn.bias.data.uniform_(-0.5, 0.5)
        tbn.running_mean.uniform_(-1, 1)
        tbn.running_var.uniform_(0.5, 2.0)
        tbn.eval()
        x = torch.randn(2, 6, 8, 8)
        with torch.no_grad():
            ref = tbn(x).permute(0, 2, 3, 1).numpy()
        m = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)
        out = m.apply(
            {"params": {"scale": jnp.asarray(tbn.weight.detach().numpy()),
                        "bias": jnp.asarray(tbn.bias.detach().numpy())},
             "batch_stats": {"mean": jnp.asarray(tbn.running_mean.numpy()),
                             "var": jnp.asarray(tbn.running_var.numpy())}},
            jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_strided_conv_p2_parity(self):
        # the discriminator's k4 s2 p2 conv
        torch = pytest.importorskip("torch")
        from flax import linen as nn

        torch.manual_seed(4)
        tconv = torch.nn.Conv2d(3, 8, 4, stride=2, padding=2)
        x = torch.randn(1, 3, 32, 32)
        with torch.no_grad():
            ref = tconv(x).permute(0, 2, 3, 1).numpy()
        kern = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)  # (kh,kw,in,out)
        m = nn.Conv(8, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)))
        out = m.apply(
            {"params": {"kernel": jnp.asarray(kern),
                        "bias": jnp.asarray(tconv.bias.detach().numpy())}},
            jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
