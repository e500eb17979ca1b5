"""Train-step tests: one jitted step runs, losses are finite and decrease on
a fixed batch, state/codebook/BN all update, branch grafting works, and the
data-parallel step over the 8-device CPU mesh matches expectations.

Shapes are 64x64 — the smallest FlowNetSD supports (6 stride-2 encoder
levels); only conv sizes change vs the real 256x256.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ammcnet_aaai2021_tpu.configs import LossConfig, NetConfig, OptimConfig
from ammcnet_aaai2021_tpu.models import (
    PixelDiscriminator,
    build_generator,
)
from ammcnet_aaai2021_tpu.models.flownet_sd import FlowNet2SD
from ammcnet_aaai2021_tpu.train.optim import make_optimizers
from ammcnet_aaai2021_tpu.train.state import (
    AMMCTrainState,
    create_train_state,
    graft_branches,
)
from ammcnet_aaai2021_tpu.train.steps import (
    make_single_stream_train_step,
    make_twostream_train_step,
)

SIZE = 64


def small_net(tag="unet_vq_twostream"):
    return NetConfig(net_tag=tag, dtype="float32", use_pallas_memory=False)


@pytest.fixture(scope="module")
def twostream_setup():
    cfg = small_net()
    gen = build_generator(cfg)
    disc = PixelDiscriminator(dtype=jnp.float32)
    flownet = FlowNet2SD(dtype=jnp.float32)
    loss_cfg = LossConfig(loss_tag="twostream_vq")
    g_tx, d_tx = make_optimizers(OptimConfig(lr_g=1e-3, lr_d=1e-4))
    rng = jax.random.PRNGKey(0)
    state = create_train_state(
        gen, disc, g_tx, d_tx, rng,
        rgb_shape=(2, SIZE, SIZE, 12), op_shape=(2, SIZE, SIZE, 6))
    flow_vars = flownet.init({"params": jax.random.PRNGKey(9)},
                             jnp.zeros((2, SIZE, SIZE, 3, 2)))
    step_fn = jax.jit(make_twostream_train_step(
        gen, disc, flownet, loss_cfg, g_tx, d_tx))
    rng_np = np.random.default_rng(0)
    batch = {
        "rgb": jnp.asarray(rng_np.uniform(-1, 1, (2, SIZE, SIZE, 15))
                           .astype(np.float32)),
        "op": jnp.asarray(rng_np.uniform(-1, 1, (2, SIZE, SIZE, 8))
                          .astype(np.float32)),
    }
    return state, step_fn, batch, flow_vars


class TestTwoStreamStep:
    def test_one_step_runs_and_metrics_finite(self, twostream_setup):
        state, step_fn, batch, flow_vars = twostream_setup
        new_state, metrics = step_fn(state, batch, flow_vars)
        assert int(new_state.step) == 1
        for k, v in metrics.items():
            assert np.isfinite(float(v)), f"{k} not finite"
        assert {"g_loss", "d_loss", "g_adv_loss", "g_flow_loss", "g_int_loss",
                "g_gd_loss", "g_int_loss_op", "g_latent_loss"} <= set(metrics)

    def test_params_and_state_update(self, twostream_setup):
        state, step_fn, batch, flow_vars = twostream_setup
        new_state, _ = step_fn(state, batch, flow_vars)
        # conv params moved
        old = jax.tree.leaves(state.g_params)[0]
        new = jax.tree.leaves(new_state.g_params)[0]
        assert not np.allclose(np.asarray(old), np.asarray(new))
        # codebook EMA moved
        old_cs = state.g_state["codebook"]["rgb"]["vq_down3"]["quan"][
            "quantize"]["cluster_size"]
        new_cs = new_state.g_state["codebook"]["rgb"]["vq_down3"]["quan"][
            "quantize"]["cluster_size"]
        assert not np.allclose(np.asarray(old_cs), np.asarray(new_cs))
        # discriminator moved
        old_d = jax.tree.leaves(state.d_params)[0]
        new_d = jax.tree.leaves(new_state.d_params)[0]
        assert not np.allclose(np.asarray(old_d), np.asarray(new_d))

    def test_loss_decreases_on_fixed_batch(self, twostream_setup):
        state, step_fn, batch, flow_vars = twostream_setup
        first = None
        for i in range(8):
            state, metrics = step_fn(state, batch, flow_vars)
            if first is None:
                first = float(metrics["g_int_loss"])
        assert float(metrics["g_int_loss"]) < first

    def test_remat_step_matches_plain(self, twostream_setup):
        # jax.checkpoint must change memory usage only, not the math
        state, _, batch, flow_vars = twostream_setup
        cfg = small_net()
        gen = build_generator(cfg)
        disc = PixelDiscriminator(dtype=jnp.float32)
        flownet = FlowNet2SD(dtype=jnp.float32)
        loss_cfg = LossConfig(loss_tag="twostream_vq")
        g_tx, d_tx = make_optimizers(OptimConfig())
        outs = []
        for remat in (False, True):
            step_fn = jax.jit(make_twostream_train_step(
                gen, disc, flownet, loss_cfg, g_tx, d_tx, remat=remat))
            new_state, metrics = step_fn(state, batch, flow_vars)
            outs.append((jax.tree.leaves(new_state.g_params)[0],
                         float(metrics["g_loss"])))
        np.testing.assert_allclose(np.asarray(outs[0][0]),
                                   np.asarray(outs[1][0]), atol=1e-6)
        assert outs[0][1] == pytest.approx(outs[1][1], rel=1e-6)

    def test_flow_loss_carries_no_gradient(self, twostream_setup):
        # faithful .detach(): lam_flow must not change g_grads
        state, _, batch, flow_vars = twostream_setup
        from ammcnet_aaai2021_tpu.models.flownet_sd import FlowNet2SD

        cfg = small_net()
        gen = build_generator(cfg)
        disc = PixelDiscriminator(dtype=jnp.float32)
        flownet = FlowNet2SD(dtype=jnp.float32)
        g_tx, d_tx = make_optimizers(OptimConfig())

        grads = []
        for lam_flow in (0.0, 10.0):
            loss_cfg = LossConfig(loss_tag="twostream_vq", lam_flow=lam_flow)
            step_fn = jax.jit(make_twostream_train_step(
                gen, disc, flownet, loss_cfg, g_tx, d_tx))
            new_state, _ = step_fn(state, batch, flow_vars)
            grads.append(jax.tree.leaves(new_state.g_params)[0])
        np.testing.assert_allclose(np.asarray(grads[0]), np.asarray(grads[1]),
                                   atol=1e-7)

    def test_freeze_codebook_pins_ema_state(self, twostream_setup):
        """freeze_codebook=True: codebook bit-identical after N steps while
        params/batch_stats keep training; False: EMA moves (the control is
        test_params_and_state_update).  Gradients must be unchanged by the
        flag on the FIRST step (the freeze only gates the state carry)."""
        state, _, batch, flow_vars = twostream_setup
        cfg = small_net()
        gen = build_generator(cfg)
        disc = PixelDiscriminator(dtype=jnp.float32)
        flownet = FlowNet2SD(dtype=jnp.float32)
        loss_cfg = LossConfig(loss_tag="twostream_vq")
        g_tx, d_tx = make_optimizers(OptimConfig())
        step_fn = jax.jit(make_twostream_train_step(
            gen, disc, flownet, loss_cfg, g_tx, d_tx, freeze_codebook=True))

        s = state
        for _ in range(3):
            s, _ = step_fn(s, batch, flow_vars)
        for old, new in zip(jax.tree.leaves(state.g_state["codebook"]),
                            jax.tree.leaves(s.g_state["codebook"])):
            np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
        # encoder/decoder still train
        assert not np.allclose(np.asarray(jax.tree.leaves(state.g_params)[0]),
                               np.asarray(jax.tree.leaves(s.g_params)[0]))
        # first-step params identical to the unfrozen step: the flag gates
        # only the codebook carry, never the loss/grads of the current step
        plain_fn = jax.jit(make_twostream_train_step(
            gen, disc, flownet, loss_cfg, g_tx, d_tx, freeze_codebook=False))
        frozen1, _ = step_fn(state, batch, flow_vars)
        plain1, _ = plain_fn(state, batch, flow_vars)
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(frozen1.g_params)[0]),
            np.asarray(jax.tree.leaves(plain1.g_params)[0]), atol=1e-7)


    def test_fix_branches_plus_freeze_codebook_static_memory_path(
            self, twostream_setup):
        """The fully-static arm of the PERF.md round-4 2x2 ablation:
        fix_branches (bridge-only optax mask, as run_train builds it) +
        freeze_codebook => branch params AND codebook EMA bit-invariant
        across steps while the bridge keeps training.  (Branch BN running
        stats still update — they are state, not params, as in the
        reference's fixed_rgb_op_branch mode, vqvae.py:634-643.)"""
        import dataclasses
        state, _, batch, flow_vars = twostream_setup
        cfg = small_net()
        gen = build_generator(cfg)
        disc = PixelDiscriminator(dtype=jnp.float32)
        flownet = FlowNet2SD(dtype=jnp.float32)
        loss_cfg = LossConfig(loss_tag="twostream_vq")
        mask = {k: k == "bridge" for k in state.g_params}
        g_tx, d_tx = make_optimizers(OptimConfig(lr_g=1e-3, lr_d=1e-4),
                                     g_mask=mask)
        state = dataclasses.replace(state,
                                    g_opt_state=g_tx.init(state.g_params))
        step_fn = jax.jit(make_twostream_train_step(
            gen, disc, flownet, loss_cfg, g_tx, d_tx, freeze_codebook=True))
        s = state
        for _ in range(3):
            s, _ = step_fn(s, batch, flow_vars)
        for key in ("rgb", "op"):
            for old, new in zip(jax.tree.leaves(state.g_params[key]),
                                jax.tree.leaves(s.g_params[key])):
                np.testing.assert_array_equal(np.asarray(old),
                                              np.asarray(new))
        for old, new in zip(jax.tree.leaves(state.g_state["codebook"]),
                            jax.tree.leaves(s.g_state["codebook"])):
            np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
        old_b = jax.tree.leaves(state.g_params["bridge"])[0]
        new_b = jax.tree.leaves(s.g_params["bridge"])[0]
        assert not np.allclose(np.asarray(old_b), np.asarray(new_b))


class TestSingleStreamStep:
    @pytest.mark.parametrize("tag,loss_tag,ch", [
        ("unet_vq_topk_res", "rgb_int_gdl_flow_adv_vq", 3),
        ("unet_vq_topk_res", "op_int_adv_vq", 2),
    ])
    def test_stage1_recipes(self, tag, loss_tag, ch):
        data_type = "rgb" if ch == 3 else "op"
        cfg = NetConfig(net_tag=tag, dtype="float32", use_pallas_memory=False,
                        data_type=data_type)
        gen = build_generator(cfg)
        disc = PixelDiscriminator(dtype=jnp.float32)
        flownet = FlowNet2SD(dtype=jnp.float32)
        loss_cfg = LossConfig(loss_tag=loss_tag)
        g_tx, d_tx = make_optimizers(OptimConfig())
        rng = jax.random.PRNGKey(0)
        t = 4 if ch == 3 else 3
        state = create_train_state(
            gen, disc, g_tx, d_tx, rng,
            rgb_shape=(2, SIZE, SIZE, t * ch), d_input_channels=ch)
        flow_vars = (flownet.init({"params": jax.random.PRNGKey(9)},
                                  jnp.zeros((2, SIZE, SIZE, 3, 2)))
                     if "flow" in loss_tag else None)
        step_fn = jax.jit(make_single_stream_train_step(
            gen, disc, flownet, loss_cfg, g_tx, d_tx, data_type=data_type))
        rng_np = np.random.default_rng(1)
        batch = jnp.asarray(rng_np.uniform(
            -1, 1, (2, SIZE, SIZE, (t + 1) * ch)).astype(np.float32))
        new_state, metrics = step_fn(state, batch, flow_vars)
        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics["g_loss"]))


class TestBranchFreezing:
    def test_masked_optimizer_freezes_not_ascends(self):
        """optax.masked alone passes raw gradients through masked-out leaves
        (gradient ASCENT); the optimizer factory must zero them."""
        import optax

        params = {"bridge": jnp.ones(3), "rgb": jnp.ones(3)}
        mask = {"bridge": True, "rgb": False}
        g_tx, _ = make_optimizers(OptimConfig(lr_g=1e-3), g_mask=mask)
        state = g_tx.init(params)
        grads = jax.tree.map(lambda x: jnp.full_like(x, 0.5), params)
        updates, _ = g_tx.update(grads, state, params)
        assert np.all(np.asarray(updates["rgb"]) == 0.0)
        assert np.any(np.asarray(updates["bridge"]) != 0.0)
        new_params = optax.apply_updates(params, updates)
        np.testing.assert_array_equal(np.asarray(new_params["rgb"]),
                                      np.asarray(params["rgb"]))


class TestGrafting:
    def test_graft_branches_mounts_pretrained(self):
        cfg = small_net()
        two = build_generator(cfg)
        single_rgb = build_generator(NetConfig(net_tag="unet_vq_topk_res",
                                               dtype="float32",
                                               use_pallas_memory=False))
        single_op = build_generator(NetConfig(net_tag="unet_vq_topk_res",
                                              dtype="float32",
                                              use_pallas_memory=False,
                                              data_type="op",
                                              out_channel=(3, 2)))
        k0 = jax.random.PRNGKey(0)
        two_vars = two.init({"params": k0}, jnp.zeros((1, SIZE, SIZE, 12)),
                            jnp.zeros((1, SIZE, SIZE, 6)))
        rgb_vars = single_rgb.init({"params": jax.random.PRNGKey(1)},
                                   jnp.zeros((1, SIZE, SIZE, 12)))
        op_vars = single_op.init({"params": jax.random.PRNGKey(2)},
                                 jnp.zeros((1, SIZE, SIZE, 6)))
        grafted = graft_branches(two_vars["params"], rgb_vars["params"],
                                 op_vars["params"])
        # rgb subtree now equals the pretrained stream
        a = jax.tree.leaves(grafted["rgb"])[0]
        b = jax.tree.leaves(rgb_vars["params"])[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # bridge untouched
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(grafted["bridge"])[0]),
            np.asarray(jax.tree.leaves(two_vars["params"]["bridge"])[0]))
        # the grafted tree still powers a forward pass
        out = two.apply({"params": grafted, **{k: v for k, v in
                                               two_vars.items()
                                               if k != "params"}},
                        jnp.zeros((1, SIZE, SIZE, 12)),
                        jnp.zeros((1, SIZE, SIZE, 6)))
        assert out[0].shape == (1, SIZE, SIZE, 3)


class TestDataParallelStep:
    def test_pjit_step_over_mesh(self, twostream_setup, cpu_mesh_devices):
        """Full train step jitted with the batch sharded over 8 devices."""
        from ammcnet_aaai2021_tpu.parallel import (
            make_mesh, replicate, shard_batch)

        state, step_fn, _, flow_vars = twostream_setup
        mesh = make_mesh(8, devices=cpu_mesh_devices)
        rng_np = np.random.default_rng(5)
        batch = {
            "rgb": jnp.asarray(rng_np.uniform(-1, 1, (8, SIZE, SIZE, 15))
                               .astype(np.float32)),
            "op": jnp.asarray(rng_np.uniform(-1, 1, (8, SIZE, SIZE, 8))
                              .astype(np.float32)),
        }
        sharded = shard_batch(mesh, batch)
        state_r = replicate(mesh, state)
        flow_r = replicate(mesh, flow_vars)
        new_state, metrics = step_fn(state_r, sharded, flow_r)
        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics["g_loss"]))
        # params stay replicated (single logical copy)
        leaf = jax.tree.leaves(new_state.g_params)[0]
        assert leaf.sharding.is_fully_replicated

    def test_fix_branches_step_over_mesh(self, twostream_setup,
                                         cpu_mesh_devices):
        """The RECOMMENDED deployment config (README: stage-2
        --fix_branches, the reference's fixed_rgb_op_branch mode,
        vqvae.py:634-643) composed with the DP mesh — what a production
        multi-chip finetune actually runs.  Branch params must stay
        bit-frozen under the sharded step (the optax zero-update mask
        composed with XLA's gradient all-reduce) while the bridge updates
        and stays replicated."""
        import dataclasses

        from ammcnet_aaai2021_tpu.parallel import (
            make_mesh, replicate, shard_batch)

        state, _, _, flow_vars = twostream_setup
        cfg = small_net()
        gen = build_generator(cfg)
        disc = PixelDiscriminator(dtype=jnp.float32)
        flownet = FlowNet2SD(dtype=jnp.float32)
        loss_cfg = LossConfig(loss_tag="twostream_vq")
        mask = {k: k == "bridge" for k in state.g_params}
        g_tx, d_tx = make_optimizers(OptimConfig(lr_g=1e-3, lr_d=1e-4),
                                     g_mask=mask)
        state = dataclasses.replace(state,
                                    g_opt_state=g_tx.init(state.g_params))
        step_fn = jax.jit(make_twostream_train_step(
            gen, disc, flownet, loss_cfg, g_tx, d_tx))
        mesh = make_mesh(8, devices=cpu_mesh_devices)
        rng_np = np.random.default_rng(11)
        batch = {
            "rgb": jnp.asarray(rng_np.uniform(-1, 1, (8, SIZE, SIZE, 15))
                               .astype(np.float32)),
            "op": jnp.asarray(rng_np.uniform(-1, 1, (8, SIZE, SIZE, 8))
                              .astype(np.float32)),
        }
        s, _ = step_fn(replicate(mesh, state), shard_batch(mesh, batch),
                       replicate(mesh, flow_vars))
        for key in ("rgb", "op"):
            for old, new in zip(jax.tree.leaves(state.g_params[key]),
                                jax.tree.leaves(s.g_params[key])):
                np.testing.assert_array_equal(np.asarray(old),
                                              np.asarray(new))
        old_b = jax.tree.leaves(state.g_params["bridge"])[0]
        new_b = jax.tree.leaves(s.g_params["bridge"])[0]
        assert not np.allclose(np.asarray(old_b), np.asarray(new_b))
        assert new_b.sharding.is_fully_replicated
