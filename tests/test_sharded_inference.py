"""Multi-chip serving scorer: windows sharded over the mesh's data axis must
produce results identical to single-device scoring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ammcnet_aaai2021_tpu.configs import NetConfig
from ammcnet_aaai2021_tpu.eval.infer import make_video_scorer
from ammcnet_aaai2021_tpu.models import build_generator
from ammcnet_aaai2021_tpu.parallel import make_mesh


class TestShardedScorer:
    def test_mesh_scorer_matches_single_device(self, cpu_mesh_devices, rng):
        cfg = NetConfig(dtype="float32", use_pallas_memory=False, n_embed=64)
        gen = build_generator(cfg, per_sample_diff=True)
        size = 32
        variables = gen.init({"params": jax.random.PRNGKey(0)},
                             jnp.zeros((1, size, size, 12)),
                             jnp.zeros((1, size, size, 6)))
        video = jnp.asarray(
            rng.integers(0, 255, (20, size, size, 3), np.uint8))
        flows = jnp.asarray(
            rng.normal(0, 0.02, (19, size, size, 2)).astype(np.float32))
        idx = jnp.arange(16)

        single = make_video_scorer(gen, variables, window_batch=16)
        mesh = make_mesh(8, devices=cpu_mesh_devices)
        sharded = make_video_scorer(gen, variables, window_batch=16,
                                    mesh=mesh)
        ref = single(video, flows, idx)
        out = sharded(video, flows, idx)
        # outputs actually sharded over the mesh
        assert len(out[0].sharding.device_set) == 8
        for r, o in zip(ref, out):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       rtol=1e-5, atol=1e-5)


class TestPallasUnderMesh:
    def test_pjit_train_step_pallas_matches_xla(self, cpu_mesh_devices):
        """One full jitted train step with use_pallas_memory=True over an
        8-device data mesh must produce the same losses AND the same updated
        EMA codebook as the XLA-path step on the same global batch (the
        kernel's in-kernel statistics + GSPMD's global reduction compose)."""
        from ammcnet_aaai2021_tpu.configs import LossConfig, NetConfig, OptimConfig
        from ammcnet_aaai2021_tpu.models import PixelDiscriminator, build_generator
        from ammcnet_aaai2021_tpu.parallel import replicate, shard_batch
        from ammcnet_aaai2021_tpu.train.optim import make_optimizers
        from ammcnet_aaai2021_tpu.train.state import create_train_state
        from ammcnet_aaai2021_tpu.train.steps import make_single_stream_train_step

        size, t, ch = 32, 3, 2  # op recipe: no FlowNet, so 32x32 is legal
        mesh = make_mesh(8, devices=cpu_mesh_devices)
        rng_np = np.random.default_rng(7)
        batch = jnp.asarray(rng_np.uniform(
            -1, 1, (8, size, size, (t + 1) * ch)).astype(np.float32))

        results = {}
        for use_pallas in (False, True):
            cfg = NetConfig(net_tag="unet_vq_topk_res", data_type="op",
                            dtype="float32", n_embed=32,
                            use_pallas_memory=use_pallas)
            gen = build_generator(cfg)
            disc = PixelDiscriminator(dtype=jnp.float32)
            g_tx, d_tx = make_optimizers(OptimConfig())
            state = create_train_state(
                gen, disc, g_tx, d_tx, jax.random.PRNGKey(0),
                rgb_shape=(8, size, size, t * ch), d_input_channels=ch)
            step_fn = jax.jit(make_single_stream_train_step(
                gen, disc, None, LossConfig(loss_tag="op_int_adv_vq"),
                g_tx, d_tx, data_type="op"))
            if use_pallas:  # the mesh path under test
                new_state, metrics = step_fn(
                    replicate(mesh, state), shard_batch(mesh, batch), None)
            else:  # single-device XLA oracle on the same global batch
                new_state, metrics = step_fn(state, batch, None)
            jax.block_until_ready(metrics)
            results[use_pallas] = (new_state, metrics)

        (ref_state, ref_m), (pal_state, pal_m) = results[False], results[True]
        assert float(pal_m["g_loss"]) == pytest.approx(
            float(ref_m["g_loss"]), rel=1e-4)
        assert float(pal_m["d_loss"]) == pytest.approx(
            float(ref_m["d_loss"]), rel=1e-4)
        ref_cb = jax.tree.leaves(ref_state.g_state["codebook"])
        pal_cb = jax.tree.leaves(pal_state.g_state["codebook"])
        for r, p in zip(ref_cb, pal_cb):
            np.testing.assert_allclose(np.asarray(p), np.asarray(r),
                                       rtol=1e-4, atol=1e-5)


class TestTensorParallelPlacement:
    def test_bottleneck_kernels_shard_over_model(self, cpu_mesh_devices):
        import numpy as np
        from jax.sharding import Mesh

        from ammcnet_aaai2021_tpu.configs import NetConfig
        from ammcnet_aaai2021_tpu.models import build_generator
        from ammcnet_aaai2021_tpu.parallel import shard_params_tensor_parallel

        mesh = Mesh(np.asarray(cpu_mesh_devices).reshape(4, 2),
                    ("data", "model"))
        cfg = NetConfig(dtype="float32", use_pallas_memory=False, n_embed=32)
        gen = build_generator(cfg)
        vs = gen.init({"params": jax.random.PRNGKey(0)},
                      jnp.zeros((1, 32, 32, 12)), jnp.zeros((1, 32, 32, 6)))
        placed = shard_params_tensor_parallel(mesh, vs["params"])
        # a 512-out-channel bottleneck kernel shards over 'model'
        wide = placed["rgb"]["down3"]["conv"]["conv0"]["kernel"]
        assert not wide.sharding.is_fully_replicated
        # a narrow kernel stays replicated
        narrow = placed["rgb"]["inc"]["conv0"]["kernel"]
        assert narrow.sharding.is_fully_replicated
        # the placed tree still powers a forward pass (XLA inserts collectives)
        out = gen.apply({"params": placed,
                         **{k: v for k, v in vs.items() if k != "params"}},
                        jnp.zeros((2, 32, 32, 12)), jnp.zeros((2, 32, 32, 6)))
        ref = gen.apply(vs, jnp.zeros((2, 32, 32, 12)),
                        jnp.zeros((2, 32, 32, 6)))
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                                   rtol=1e-5, atol=1e-5)


class TestInt8UnderMesh:
    def test_mesh_scorer_int8_matches_single_device(self, cpu_mesh_devices,
                                                    rng):
        """Multi-chip serving of the QUANTIZED forward (the deployment
        shape x the int8 lever): calibrated int8 windows sharded over the
        data axis must reproduce the unsharded int8 scorer exactly — the
        static act_scales replicate with the weights, and window sharding
        cannot change per-window numerics."""
        from ammcnet_aaai2021_tpu.models.quantized import (
            calibrate_act_scales, make_quantized_forward,
            quantize_twostream_variables)

        cfg = NetConfig(dtype="float32", use_pallas_memory=False,
                        n_embed=32, image_size=32)
        gen = build_generator(cfg, per_sample_diff=True)
        size = 32
        variables = gen.init({"params": jax.random.PRNGKey(0)},
                             jnp.zeros((1, size, size, 12)),
                             jnp.zeros((1, size, size, 6)))
        qfwd = make_quantized_forward(embed_dim=cfg.embed_dim,
                                      n_embed=cfg.n_embed, k=cfg.k,
                                      per_sample_diff=True)
        qvars = quantize_twostream_variables(variables)
        cal_rgb = jnp.asarray(rng.uniform(-1, 1, (2, size, size, 12)),
                              jnp.float32)
        cal_op = jnp.asarray(rng.uniform(-1, 1, (2, size, size, 6)),
                             jnp.float32)
        qcal = calibrate_act_scales(qfwd, qvars, [(cal_rgb, cal_op)])

        video = jnp.asarray(
            rng.integers(0, 255, (12, size, size, 3), np.uint8))
        flows = jnp.asarray(
            rng.normal(0, 0.02, (11, size, size, 2)).astype(np.float32))
        idx = jnp.arange(8)

        single = make_video_scorer(gen, qcal, window_batch=8,
                                   apply_fn=qfwd)
        mesh = make_mesh(8, devices=cpu_mesh_devices)
        sharded = make_video_scorer(gen, qcal, window_batch=8, mesh=mesh,
                                    apply_fn=qfwd)
        ref = single(video, flows, idx)
        out = sharded(video, flows, idx)
        assert len(out[0].sharding.device_set) == 8
        for r, o in zip(ref, out):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       rtol=1e-5, atol=1e-5)
