"""Folded two-stream forward (models/folded.py) must equal the unfolded
TwoStreamUNetMem bit-for-near-bit: the stream-axis vmap + zero-padding is a
pure reassociation of the same convolutions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ammcnet_aaai2021_tpu.configs import NetConfig
from ammcnet_aaai2021_tpu.models import build_generator
from ammcnet_aaai2021_tpu.models.folded import (fold_twostream_variables,
                                                make_folded_forward)

N_EMBED = 64


@pytest.fixture(scope="module")
def setup():
    cfg = NetConfig(dtype="float32", use_pallas_memory=False, n_embed=N_EMBED)
    gen = build_generator(cfg, per_sample_diff=True)
    size = 32
    variables = gen.init({"params": jax.random.PRNGKey(0)},
                         jnp.zeros((1, size, size, 12)),
                         jnp.zeros((1, size, size, 6)))
    rng = np.random.default_rng(3)
    rgb_x = jnp.asarray(rng.uniform(-1, 1, (2, size, size, 12))
                        .astype(np.float32))
    op_x = jnp.asarray(rng.uniform(-1, 1, (2, size, size, 6))
                       .astype(np.float32))
    return cfg, gen, variables, rgb_x, op_x


class TestFoldedParity:
    def test_matches_unfolded(self, setup):
        cfg, gen, variables, rgb_x, op_x = setup
        ref_rgb, ref_op, ref_diffs, _ = gen.apply(variables, rgb_x, op_x,
                                                  False)
        stacked, bridge = fold_twostream_variables(variables)
        fwd = jax.jit(make_folded_forward(
            embed_dim=cfg.embed_dim, n_embed=N_EMBED, k=cfg.k,
            dtype=jnp.float32, per_sample_diff=True))
        rgb_pred, op_pred, diffs = fwd(stacked, bridge, rgb_x, op_x)
        np.testing.assert_allclose(np.asarray(rgb_pred), np.asarray(ref_rgb),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(op_pred), np.asarray(ref_op),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(diffs[0]),
                                   np.asarray(ref_diffs[0]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(diffs[1]),
                                   np.asarray(ref_diffs[1]),
                                   rtol=1e-5, atol=1e-6)

    def test_padded_leaves_exact(self, setup):
        """The zero-padding is exact: op outputs are identical, not merely
        close, when the op input's pad channels are zero (they always are)
        — checked on the shape-divergent leaves themselves."""
        _, _, variables, _, _ = setup
        stacked, _ = fold_twostream_variables(variables)
        inc_k = stacked["params"]["inc"]["conv0"]["kernel"]
        assert inc_k.shape[0] == 2 and inc_k.shape[3] == 12
        # op half's padded input-channel taps are zero
        np.testing.assert_array_equal(np.asarray(inc_k[1, :, :, 6:]), 0.0)
        outc_k = stacked["params"]["outc"]["kernel"]
        np.testing.assert_array_equal(np.asarray(outc_k[1, ..., 2:]), 0.0)
