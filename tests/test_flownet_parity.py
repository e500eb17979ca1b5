"""FlowNet2-SD parity: run the ACTUAL reference torch module as the oracle,
convert its state_dict, and require matching flow outputs — this is what
guarantees a real FlowNet2-SD checkpoint drives identical training losses."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_DIR = "/root/reference/Code/models/flownet2"


@pytest.fixture(scope="module")
def ref_flownet():
    if not os.path.isdir(REF_DIR):
        pytest.skip("reference snapshot not mounted")
    # load the flownet2 package from the read-only snapshot
    pkg = types.ModuleType("refflownet2")
    pkg.__path__ = [REF_DIR]
    sys.modules["refflownet2"] = pkg
    for name in ("submodules", "FlowNetSD", "models"):
        spec = importlib.util.spec_from_file_location(
            f"refflownet2.{name}", os.path.join(REF_DIR, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refflownet2.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["refflownet2.models"]


class TestFlowNetParity:
    def test_flownet2sd_inference_parity(self, ref_flownet):
        import jax
        import jax.numpy as jnp

        from ammcnet_aaai2021_tpu.models.flownet_sd import FlowNet2SD
        from ammcnet_aaai2021_tpu.tools.torch_convert import (
            convert_flownet_sd_state)

        torch.manual_seed(11)
        tnet = ref_flownet.FlowNet2SD(batchNorm=False)
        tnet.eval()
        state = {k: v.numpy() for k, v in tnet.state_dict().items()}
        variables = convert_flownet_sd_state(state)
        variables = jax.tree.map(jnp.asarray, variables)

        jnet = FlowNet2SD(dtype=jnp.float32)
        # (b, 3, 2, h, w) torch layout -> (b, h, w, 3, 2) NHWC-first
        frames = torch.rand(1, 3, 2, 64, 64) * 255.0
        with torch.no_grad():
            t_out = tnet(frames)  # (b, 2, h, w) after x4 upsample
        j_in = jnp.asarray(frames.permute(0, 3, 4, 1, 2).numpy())
        j_out = jnet.apply(variables, j_in)
        t_np = t_out.numpy().transpose(0, 2, 3, 1)
        # bilinear x4 upsample semantics differ at the borders between
        # torch nn.Upsample and jax.image.resize; compare the interior
        np.testing.assert_allclose(
            np.asarray(j_out)[:, 8:-8, 8:-8], t_np[:, 8:-8, 8:-8],
            rtol=2e-2, atol=2e-2)
        # and the pre-upsample correlation must be essentially exact:
        corr = np.corrcoef(np.asarray(j_out).ravel(), t_np.ravel())[0, 1]
        assert corr > 0.999

    def test_converted_tree_matches_init_structure(self, ref_flownet):
        import jax
        import jax.numpy as jnp

        from ammcnet_aaai2021_tpu.models.flownet_sd import FlowNet2SD
        from ammcnet_aaai2021_tpu.tools.torch_convert import (
            convert_flownet_sd_state)

        tnet = ref_flownet.FlowNet2SD(batchNorm=False)
        state = {k: v.numpy() for k, v in tnet.state_dict().items()}
        converted = convert_flownet_sd_state(state)
        jnet = FlowNet2SD(dtype=jnp.float32)
        init_vars = jnet.init({"params": jax.random.PRNGKey(0)},
                              jnp.zeros((1, 64, 64, 3, 2)))
        init_paths = {jax.tree_util.keystr(p)
                      for p, _ in jax.tree.leaves_with_path(init_vars)}
        conv_paths = {jax.tree_util.keystr(p)
                      for p, _ in jax.tree.leaves_with_path(converted)}
        assert conv_paths == init_paths
