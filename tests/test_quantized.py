"""int8 inference forward (models/quantized): exactness + agreement.

The quantized path must be *provably plumbed right* (scale axes, BN fold,
transpose-kernel semantics) before any accuracy claim means anything, so
the first tests use exactly-representable weights/activations where int8
math must equal float math bit-for-bit; the end-to-end test then bounds
the real quantization error against the float forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from ammcnet_aaai2021_tpu.configs import NetConfig
from ammcnet_aaai2021_tpu.models import build_generator
from ammcnet_aaai2021_tpu.models.quantized import (
    _fold_bn, _qconv, _qconv_transpose, _quant_weight,
    make_quantized_forward, quantize_twostream_variables)


def _exact_weight(rng, shape, out_axis):
    """Kernel whose per-out-channel quantization is EXACT: integer grids
    in [-127, 127] times a per-channel scale, with max |int| = 127 so the
    recovered scale matches."""
    ints = rng.integers(-127, 128, size=shape).astype(np.float32)
    # force the max to 127 along every out channel
    idx = [0] * len(shape)
    for c in range(shape[out_axis]):
        idx[out_axis] = c
        idx_t = tuple(idx)
        ints[idx_t] = 127.0
    scale_shape = [1] * len(shape)
    scale_shape[out_axis] = shape[out_axis]
    scales = (rng.uniform(0.5, 2.0, size=shape[out_axis])
              .astype(np.float32).reshape(scale_shape))
    return jnp.asarray(ints * scales)


class TestExactness:
    def test_quant_weight_roundtrip_exact(self):
        rng = np.random.default_rng(0)
        w = _exact_weight(rng, (3, 3, 8, 16), out_axis=3)
        q = _quant_weight(w, out_axis=3)
        back = q["w"].astype(np.float32) * np.asarray(q["scale"])
        np.testing.assert_allclose(np.asarray(back), np.asarray(w),
                                   rtol=1e-6)

    def test_qconv_equals_float_conv_on_exact_values(self):
        rng = np.random.default_rng(1)
        w = _exact_weight(rng, (3, 3, 8, 16), out_axis=3)
        bias = jnp.asarray(rng.normal(size=16).astype(np.float32))
        # activations: integers in [-127, 127] (scale 1 recovered when a
        # 127 is present) — int8 path must be exact integer math
        x = jnp.asarray(rng.integers(-127, 128, (2, 10, 10, 8))
                        .astype(np.float32)).at[0, 0, 0, 0].set(127.0)
        got = _qconv(x, {"w": _quant_weight(w, 3)["w"],
                         "scale": _quant_weight(w, 3)["scale"],
                         "bias": bias}, relu=False)
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))) + bias
        # int32 accumulation is exact; only the final bf16 cast rounds
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref.astype(jnp.bfloat16),
                                              np.float32), rtol=1e-6)

    def test_qconv_transpose_matches_flax_module(self):
        """Proves the (kh, kw, OUT, IN) out-axis choice and the
        transpose_kernel lowering agree with blocks.Up's ConvTranspose."""
        rng = np.random.default_rng(2)
        w = _exact_weight(rng, (2, 2, 4, 8), out_axis=2)  # out=4, in=8
        bias = jnp.asarray(rng.normal(size=4).astype(np.float32))
        x = jnp.asarray(rng.integers(-127, 128, (2, 6, 6, 8))
                        .astype(np.float32)).at[0, 0, 0, 0].set(127.0)
        q = _quant_weight(w, out_axis=2)
        q["bias"] = bias
        got = _qconv_transpose(x, q)

        mod = nn.ConvTranspose(4, (2, 2), strides=(2, 2),
                               transpose_kernel=True, dtype=jnp.float32)
        ref = mod.apply({"params": {"kernel": w, "bias": bias}}, x)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref.astype(jnp.bfloat16),
                                              np.float32), rtol=1e-6)

    def test_bn_fold_exact(self):
        """folded conv+bias == conv -> inference BatchNorm, to f32 accuracy."""
        rng = np.random.default_rng(3)
        w = jnp.asarray(rng.normal(size=(3, 3, 4, 8)).astype(np.float32))
        bn_p = {"scale": jnp.asarray(rng.uniform(0.5, 2, 8), jnp.float32),
                "bias": jnp.asarray(rng.normal(size=8), jnp.float32)}
        bn_s = {"mean": jnp.asarray(rng.normal(size=8), jnp.float32),
                "var": jnp.asarray(rng.uniform(0.1, 2, 8), jnp.float32)}
        x = jnp.asarray(rng.normal(size=(2, 6, 6, 4)).astype(np.float32))
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y_ref = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                             dimension_numbers=dn)
        y_ref = (y_ref - bn_s["mean"]) / jnp.sqrt(bn_s["var"] + 1e-5) \
            * bn_p["scale"] + bn_p["bias"]
        kf, bf = _fold_bn(w, bn_p, bn_s)
        y_fold = jax.lax.conv_general_dilated(x, kf, (1, 1), "SAME",
                                              dimension_numbers=dn) + bf
        np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref),
                                   rtol=1e-4, atol=1e-5)


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def built(self):
        cfg = NetConfig(dtype="float32", use_pallas_memory=False,
                        n_embed=32, image_size=32)
        gen = build_generator(cfg, per_sample_diff=True)
        variables = gen.init({"params": jax.random.PRNGKey(0)},
                             jnp.zeros((1, 32, 32, 12)),
                             jnp.zeros((1, 32, 32, 6)))
        # perturb the BN running stats away from init (mean=0, var=1) so
        # the end-to-end path exercises a non-trivial fold
        keys = iter(jax.random.split(jax.random.PRNGKey(1), 4096))
        variables = dict(variables)
        # small shifts: random-init activations are tiny (0.02-std
        # kernels), a large mean shift would ReLU-zero the whole net
        variables["batch_stats"] = jax.tree.map(
            lambda x: x * (1 + 0.1 * jax.random.uniform(next(keys), x.shape))
            + 0.01 * jax.random.uniform(next(keys), x.shape),
            variables["batch_stats"])
        return cfg, gen, variables

    def test_quantized_forward_tracks_float(self, built):
        cfg, gen, variables = built
        rng = np.random.default_rng(7)
        rgb = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 12)), jnp.float32)
        op = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 6)), jnp.float32)

        r_ref, o_ref, (dr_ref, do_ref), _ = gen.apply(variables, rgb, op,
                                                      False)
        qvars = quantize_twostream_variables(variables)
        fwd = make_quantized_forward(embed_dim=cfg.embed_dim,
                                     n_embed=cfg.n_embed, k=cfg.k,
                                     per_sample_diff=True)
        r_q, o_q, (dr_q, do_q), _ = jax.jit(fwd)(qvars, rgb, op)

        for ref, got in ((r_ref, r_q), (o_ref, o_q)):
            ref = np.asarray(ref, np.float32).ravel()
            got = np.asarray(got, np.float32).ravel()
            assert np.all(np.isfinite(got))
            r = np.corrcoef(ref, got)[0, 1]
            assert r > 0.97, f"quantized/float correlation {r}"
        # commit diffs ride the float memory block on quantized encodings
        np.testing.assert_allclose(np.asarray(dr_q), np.asarray(dr_ref),
                                   rtol=0.5)
        assert dr_q.shape == dr_ref.shape and do_q.shape == do_ref.shape

    def test_wires_into_multi_video_scorer(self, built):
        """The scorer contract the bench/serving path uses (same hook as
        the folded variant)."""
        from ammcnet_aaai2021_tpu.eval.infer import make_multi_video_scorer
        cfg, gen, variables = built
        qvars = quantize_twostream_variables(variables)
        fwd = make_quantized_forward(embed_dim=cfg.embed_dim,
                                     n_embed=cfg.n_embed, k=cfg.k,
                                     per_sample_diff=True)
        scorer = make_multi_video_scorer(
            gen, qvars, window_batch=4,
            apply_fn=lambda v, r, o: fwd(v, r, o))
        rng = np.random.default_rng(9)
        rgbs = tuple(jnp.asarray(rng.integers(0, 255, (8, 32, 32, 3)),
                                 jnp.uint8) for _ in range(2))
        ops = tuple(jnp.asarray(rng.normal(size=(7, 32, 32, 2)),
                                jnp.bfloat16) for _ in range(2))
        out = scorer(rgbs, ops)
        assert out.shape[0] == 2 and out.shape[1] == 4
        assert np.all(np.isfinite(np.asarray(out, np.float32)))

    def test_calibrated_scales_match_dynamic_on_calibration_set(self, built):
        """Calibrating on batch X then evaluating on X must reproduce the
        dynamic forward: each site's static scale equals the dynamic
        per-call scale (asserted exactly at the input site), so outputs
        agree to float-ulp tolerance.  (Not bit-exact: calibration records
        maxima from the EAGER dynamic forward, and XLA's fma contraction
        under jit shifts deep activations by ulps, which can flip isolated
        int8 rounding boundaries.)  Every quantized conv dict must receive
        a scale — the structural 1:1 site<->tree-path guarantee."""
        from ammcnet_aaai2021_tpu.models.quantized import (_quant_act,
                                                           calibrate_act_scales)

        cfg, gen, variables = built
        rng = np.random.default_rng(11)
        rgb = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 12)), jnp.float32)
        op = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 6)), jnp.float32)
        qvars = quantize_twostream_variables(variables)
        fwd = make_quantized_forward(embed_dim=cfg.embed_dim,
                                     n_embed=cfg.n_embed, k=cfg.k,
                                     per_sample_diff=True)
        qcal = calibrate_act_scales(fwd, qvars, [(rgb, op)])

        # structural: EVERY quantized conv dict got an act_scale
        def conv_dicts(tree):
            if isinstance(tree, dict):
                if "w" in tree and "scale" in tree:
                    yield tree
                else:
                    for v in tree.values():
                        yield from conv_dicts(v)
        convs = list(conv_dicts({"streams": qcal["streams"],
                                 "bridge": qcal["bridge"]}))
        assert len(convs) == 40 and all("act_scale" in c for c in convs)

        # the input site's static scale IS the dynamic scale, exactly
        _, sx_dyn = _quant_act(rgb)
        assert np.float32(sx_dyn) == np.float32(
            qcal["streams"]["rgb"]["inc"]["conv0"]["act_scale"])

        r_dyn, o_dyn, _, _ = jax.jit(fwd)(qvars, rgb, op)
        r_cal, o_cal, _, _ = jax.jit(fwd)(qcal, rgb, op)
        np.testing.assert_allclose(np.asarray(r_dyn, np.float32),
                                   np.asarray(r_cal, np.float32),
                                   atol=5e-5, rtol=0)
        np.testing.assert_allclose(np.asarray(o_dyn, np.float32),
                                   np.asarray(o_cal, np.float32),
                                   atol=5e-5, rtol=0)

    def test_resident_int8_bit_equals_nonresident(self, built):
        """int8 residency (conv0->conv1 activations stored int8 at the
        consumer's calibrated scale) must be BIT-EXACT vs the non-resident
        calibrated forward: the epilogue keeps the bf16 cast before the
        round/clip, and ReLU commutes with the monotone round/clip for a
        symmetric positive scale."""
        from ammcnet_aaai2021_tpu.models.quantized import calibrate_act_scales

        cfg, gen, variables = built
        rng = np.random.default_rng(17)
        cal = [(jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 12)),
                            jnp.float32),
                jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 6)),
                            jnp.float32))]
        rgb = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 12)), jnp.float32)
        op = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 6)), jnp.float32)
        qvars = quantize_twostream_variables(variables)
        fwd_res = make_quantized_forward(embed_dim=cfg.embed_dim,
                                         n_embed=cfg.n_embed, k=cfg.k,
                                         per_sample_diff=True,
                                         resident=True)
        fwd_off = make_quantized_forward(embed_dim=cfg.embed_dim,
                                         n_embed=cfg.n_embed, k=cfg.k,
                                         per_sample_diff=True,
                                         resident=False)
        qcal = calibrate_act_scales(fwd_res, qvars, cal)
        r_a, o_a, (da_r, da_o), _ = jax.jit(fwd_res)(qcal, rgb, op)
        r_b, o_b, (db_r, db_o), _ = jax.jit(fwd_off)(qcal, rgb, op)
        for a, b in ((r_a, r_b), (o_a, o_b), (da_r, db_r), (da_o, db_o)):
            np.testing.assert_array_equal(np.asarray(a, np.float32),
                                          np.asarray(b, np.float32))
        # uncalibrated (dynamic) trees: residency is a structural no-op
        r_c, o_c, _, _ = jax.jit(fwd_res)(qvars, rgb, op)
        r_d, o_d, _, _ = jax.jit(fwd_off)(qvars, rgb, op)
        np.testing.assert_array_equal(np.asarray(r_c, np.float32),
                                      np.asarray(r_d, np.float32))
        np.testing.assert_array_equal(np.asarray(o_c, np.float32),
                                      np.asarray(o_d, np.float32))

    def test_qconv_out_scale_emits_int8_and_chains_exactly(self):
        """Unit contract of the residency epilogue: _qconv(out_scale=s)
        returns int8, and feeding it to the next _qconv (whose act_scale
        is s) reproduces the bf16 hand-off bit-for-bit."""
        rng = np.random.default_rng(19)
        w0 = _exact_weight(rng, (3, 3, 8, 8), out_axis=3)
        w1 = _exact_weight(rng, (3, 3, 8, 8), out_axis=3)
        q0 = _quant_weight(w0, 3)
        q0["bias"] = jnp.asarray(rng.normal(size=8).astype(np.float32))
        q1 = _quant_weight(w1, 3)
        q1["bias"] = jnp.asarray(rng.normal(size=8).astype(np.float32))
        x = jnp.asarray(rng.integers(-127, 128, (2, 8, 8, 8))
                        .astype(np.float32)).at[0, 0, 0, 0].set(127.0)
        s1 = jnp.float32(0.37)  # the consumer's calibrated scale
        q1c = dict(q1, act_scale=s1)

        y8 = _qconv(x, q0, relu=True, out_scale=s1)
        assert y8.dtype == jnp.int8
        got = _qconv(y8, q1c, relu=True)

        y_bf = _qconv(x, q0, relu=True)  # bf16 hand-off
        ref = _qconv(y_bf, q1c, relu=True)
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(ref, np.float32))

    def test_calibrated_tracks_dynamic_on_fresh_data(self, built):
        """On data the calibration never saw (same distribution), static
        scales may clip rare maxima but outputs must stay close."""
        from ammcnet_aaai2021_tpu.models.quantized import calibrate_act_scales

        cfg, gen, variables = built
        rng = np.random.default_rng(13)
        cal = [(jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 12)),
                            jnp.float32),
                jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 6)),
                            jnp.float32)) for _ in range(3)]
        rgb = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 12)), jnp.float32)
        op = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 6)), jnp.float32)
        qvars = quantize_twostream_variables(variables)
        fwd = make_quantized_forward(embed_dim=cfg.embed_dim,
                                     n_embed=cfg.n_embed, k=cfg.k,
                                     per_sample_diff=True)
        qcal = calibrate_act_scales(fwd, qvars, cal)
        r_dyn, o_dyn, _, _ = jax.jit(fwd)(qvars, rgb, op)
        r_cal, o_cal, _, _ = jax.jit(fwd)(qcal, rgb, op)
        for dyn, calo in ((r_dyn, r_cal), (o_dyn, o_cal)):
            dyn = np.asarray(dyn, np.float32).ravel()
            calo = np.asarray(calo, np.float32).ravel()
            assert np.all(np.isfinite(calo))
            r = np.corrcoef(dyn, calo)[0, 1]
            assert r > 0.99, f"calibrated/dynamic correlation {r}"
