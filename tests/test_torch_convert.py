"""Checkpoint-converter tests: end-to-end numeric parity.

The oracle is the ACTUAL reference torch module (imported from the read-only
snapshot, used only as a black box): random-init it, convert its state_dict,
run both models on the same input, and require matching outputs.  This is the
strongest possible guarantee that released .pth checkpoints will convert
correctly when present.
"""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ammcnet_aaai2021_tpu.models import TwoStreamUNetMem, UNetMemStream
from ammcnet_aaai2021_tpu.tools.torch_convert import (
    convert_twostream,
    convert_unetmem_stream,
)

REF_UNET = "/root/reference/Code/models/unet.py"


@pytest.fixture(scope="module")
def ref_unet():
    import os

    if not os.path.exists(REF_UNET):
        pytest.skip("reference snapshot not mounted")
    if "torchsummaryX" not in sys.modules:
        stub = types.ModuleType("torchsummaryX")
        stub.summary = lambda *a, **k: None
        sys.modules["torchsummaryX"] = stub
    spec = importlib.util.spec_from_file_location("ref_unet", REF_UNET)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def to_nhwc(x):
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


class TestTwoStreamParity:
    def test_forward_parity_random_weights(self, ref_unet, rng):
        torch.manual_seed(42)
        tnet = ref_unet.twostream(rgb_in_c=12, rgb_out_c=3, op_in_c=6,
                                  op_out_c=2, embed_dim=64, n_embed=256, k=2)
        tnet.eval()
        # make BN running stats non-trivial so eval-mode parity is meaningful
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.8, 1.2)
        state = {k: v.numpy() for k, v in tnet.state_dict().items()}
        variables = convert_twostream(state)
        variables = jax.tree.map(jnp.asarray, variables)

        jnet = TwoStreamUNetMem(rgb_out=3, op_out=2, embed_dim=64,
                                n_embed=256, k=2, dtype=jnp.float32)
        rgb = torch.randn(2, 12, 64, 64)
        op = torch.randn(2, 6, 64, 64)
        with torch.no_grad():
            t_rgb, t_op, t_diffs, _ = tnet(rgb, op)
        j_rgb, j_op, j_diffs, _ = jnet.apply(variables, to_nhwc(rgb),
                                             to_nhwc(op))
        np.testing.assert_allclose(
            np.asarray(j_rgb), t_rgb.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(j_op), t_op.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=2e-4)
        assert float(j_diffs[0]) == pytest.approx(float(t_diffs[0]), rel=1e-3)
        assert float(j_diffs[1]) == pytest.approx(float(t_diffs[1]), rel=1e-3)

    def test_single_stream_parity(self, ref_unet):
        torch.manual_seed(7)
        tnet = ref_unet.UNetMem_v7(input_channels=12, output_channel=3,
                                   embed_dim=64, n_embed=256, k=2)
        tnet.eval()
        state = {k: v.numpy() for k, v in tnet.state_dict().items()}
        p, s, c = convert_unetmem_stream(state)
        variables = jax.tree.map(
            jnp.asarray, {"params": p, "batch_stats": s, "codebook": c})
        jnet = UNetMemStream(out_channels=3, embed_dim=64, n_embed=256, k=2,
                             dtype=jnp.float32)
        x = torch.randn(1, 12, 64, 64)
        with torch.no_grad():
            t_out, t_diff, _ = tnet(x)
        j_out, j_diff, _ = jnet.apply(variables, to_nhwc(x))
        np.testing.assert_allclose(
            np.asarray(j_out), t_out.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=2e-4)
        assert float(j_diff) == pytest.approx(float(t_diff), rel=1e-3)

    def test_converted_tree_structure_matches_init(self, ref_unet):
        """Converted tree must be loadable where an init tree is expected."""
        torch.manual_seed(1)
        tnet = ref_unet.twostream(rgb_in_c=12, rgb_out_c=3, op_in_c=6,
                                  op_out_c=2, embed_dim=64, n_embed=256, k=2)
        state = {k: v.numpy() for k, v in tnet.state_dict().items()}
        converted = convert_twostream(state)
        jnet = TwoStreamUNetMem(rgb_out=3, op_out=2, embed_dim=64,
                                n_embed=256, k=2, dtype=jnp.float32)
        init_vars = jnet.init({"params": jax.random.PRNGKey(0)},
                              jnp.zeros((1, 32, 32, 12)),
                              jnp.zeros((1, 32, 32, 6)))
        init_paths = {jax.tree_util.keystr(p)
                      for p, _ in jax.tree.leaves_with_path(init_vars)}
        conv_paths = {jax.tree_util.keystr(p)
                      for p, _ in jax.tree.leaves_with_path(converted)}
        assert conv_paths == init_paths
        # shapes agree leaf-by-leaf
        for (pa, a), (pb, b) in zip(
            sorted(jax.tree.leaves_with_path(init_vars),
                   key=lambda t: jax.tree_util.keystr(t[0])),
            sorted(jax.tree.leaves_with_path(converted),
                   key=lambda t: jax.tree_util.keystr(t[0])),
        ):
            assert np.shape(a) == np.shape(b), (jax.tree_util.keystr(pa),
                                                np.shape(a), np.shape(b))
