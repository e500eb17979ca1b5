"""Memory-op tests: NumPy oracle parity, EMA semantics, straight-through
gradients, cross-replica psum consistency, and Pallas-kernel equivalence.

The oracle re-derives the reference semantics (Code/models/unet.py:282-313)
independently in NumPy: expanded-quadratic L2 distances, top-k gather with
channel concat, EMA update with Laplace smoothing, commit loss on the top-1
codeword, straight-through estimator.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ammcnet_aaai2021_tpu.ops.memory import (
    Codebook,
    ema_update,
    init_codebook,
    quantize_topk,
)

DIM, N_EMBED, K = 64, 256, 2


def numpy_oracle(z, embed, cluster_size, embed_avg, k, train,
                 decay=0.99, eps=1e-5):
    """Independent NumPy derivation of the reference memory module."""
    lead = z.shape[:-1]
    # float32 throughout so near-tie argmin ordering matches the f32 op.
    flat = z.reshape(-1, embed.shape[0]).astype(np.float32)
    embed32 = embed.astype(np.float32)
    dist = (
        (flat ** 2).sum(1, keepdims=True)
        - 2 * flat @ embed32
        + (embed32 ** 2).sum(0, keepdims=True)
    )
    order = np.argsort(dist, axis=1, kind="stable")
    topk_idx = order[:, :k]
    top1 = topk_idx[:, 0]
    q_topk = embed32.T[topk_idx].reshape(len(flat), -1)
    q1 = embed32.T[top1]
    diff = np.mean((q1 - flat.astype(np.float64)) ** 2)
    new_state = (embed, cluster_size, embed_avg)
    if train:
        onehot = np.eye(embed.shape[1])[top1]
        cs = cluster_size * decay + (1 - decay) * onehot.sum(0)
        ea = embed_avg * decay + (1 - decay) * (flat.T @ onehot)
        n = cs.sum()
        smoothed = (cs + eps) / (n + embed.shape[1] * eps) * n
        new_state = (ea / smoothed[None, :], cs, ea)
    return (
        q_topk.reshape(*lead, -1),
        diff,
        top1.reshape(lead),
        new_state,
    )


@pytest.fixture()
def setup(rng):
    key = jax.random.PRNGKey(7)
    cb = init_codebook(key, DIM, N_EMBED)
    z = jnp.asarray(rng.normal(size=(2, 8, 8, DIM)).astype(np.float32))
    return cb, z


class TestForwardParity:
    def test_matches_oracle(self, setup):
        cb, z = setup
        q_topk, diff, q_st, _ = quantize_topk(z, cb, K, train=False)
        o_topk, o_diff, o_top1, _ = numpy_oracle(
            np.asarray(z), np.asarray(cb.embed),
            np.asarray(cb.cluster_size), np.asarray(cb.embed_avg), K, False
        )
        np.testing.assert_allclose(np.asarray(q_topk), o_topk, rtol=2e-4, atol=2e-5)
        assert float(diff) == pytest.approx(float(o_diff), rel=1e-4)
        assert q_topk.shape == (2, 8, 8, K * DIM)
        assert q_st.shape == z.shape

    def test_st_equals_top1_codeword_in_value(self, setup):
        cb, z = setup
        _, _, q_st, _ = quantize_topk(z, cb, K, train=False)
        _, _, o_top1, _ = numpy_oracle(
            np.asarray(z), np.asarray(cb.embed),
            np.asarray(cb.cluster_size), np.asarray(cb.embed_avg), K, False
        )
        expected = np.asarray(cb.embed).T[o_top1]
        np.testing.assert_allclose(np.asarray(q_st), expected, rtol=1e-5, atol=1e-6)

    def test_topk_first_column_is_top1(self, setup):
        cb, z = setup
        q_topk, _, q_st, _ = quantize_topk(z, cb, K, train=False)
        np.testing.assert_allclose(
            np.asarray(q_topk[..., :DIM]), np.asarray(q_st), rtol=1e-5, atol=1e-6
        )


class TestEMA:
    def test_ema_update_matches_oracle(self, setup):
        cb, z = setup
        *_, new_cb = quantize_topk(z, cb, K, train=True)
        _, _, _, (o_embed, o_cs, o_ea) = numpy_oracle(
            np.asarray(z), np.asarray(cb.embed),
            np.asarray(cb.cluster_size), np.asarray(cb.embed_avg), K, True
        )
        np.testing.assert_allclose(np.asarray(new_cb.cluster_size), o_cs,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(new_cb.embed_avg), o_ea,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(new_cb.embed), o_embed,
                                   rtol=1e-4, atol=1e-5)

    def test_eval_mode_leaves_state_untouched(self, setup):
        cb, z = setup
        *_, new_cb = quantize_topk(z, cb, K, train=False)
        assert new_cb is cb

    def test_multi_step_convergence_toward_data(self, rng):
        # On clustered data, repeated EMA updates pull used codewords to the
        # cluster centroids, so the commit loss collapses toward the
        # within-cluster noise floor.
        cb = init_codebook(jax.random.PRNGKey(0), DIM, N_EMBED)
        centroids = rng.normal(size=(8, DIM)).astype(np.float32) * 4.0
        assign = rng.integers(0, 8, size=(4 * 8 * 8,))
        z = centroids[assign] + 0.05 * rng.normal(size=(4 * 8 * 8, DIM))
        z = jnp.asarray(z.reshape(4, 8, 8, DIM).astype(np.float32))
        step = jax.jit(functools.partial(quantize_topk, k=K, train=True))
        _, diff0, _, cb = step(z, cb)
        for _ in range(50):
            _, diff, _, cb = step(z, cb)
        assert float(diff) < 0.1 * float(diff0)


class TestGradients:
    def test_straight_through_identity(self, setup):
        cb, z = setup

        def f(z):
            _, _, q_st, _ = quantize_topk(z, cb, K, train=False)
            return jnp.sum(q_st)

        g = jax.grad(f)(z)
        np.testing.assert_allclose(np.asarray(g), np.ones_like(g), rtol=1e-6)

    def test_commit_loss_gradient(self, setup):
        cb, z = setup

        def f(z):
            _, diff, _, _ = quantize_topk(z, cb, K, train=False)
            return diff

        g = jax.grad(f)(z)
        _, _, o_top1, _ = numpy_oracle(
            np.asarray(z), np.asarray(cb.embed),
            np.asarray(cb.cluster_size), np.asarray(cb.embed_avg), K, False
        )
        q1 = np.asarray(cb.embed).T[o_top1]
        expected = 2.0 * (np.asarray(z) - q1) / z.size
        np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-3, atol=1e-7)

    def test_topk_output_carries_no_gradient(self, setup):
        cb, z = setup

        def f(z):
            q_topk, _, _, _ = quantize_topk(z, cb, K, train=False)
            return jnp.sum(q_topk)

        g = jax.grad(f)(z)
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-12)


class TestDataParallelEMA:
    def test_psum_matches_global_batch(self, setup, cpu_mesh_devices):
        """Sharded EMA (psum over 'data') == unsharded EMA on the full batch."""
        from jax import shard_map
        from jax.sharding import Mesh, PartitionSpec as P

        cb, _ = setup
        rng = np.random.default_rng(3)
        z = jnp.asarray(rng.normal(size=(8, 4, 4, DIM)).astype(np.float32))

        *_, ref_cb = quantize_topk(z, cb, K, train=True)

        mesh = Mesh(np.array(cpu_mesh_devices), ("data",))

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P("data"), P(None, None), P(None), P(None, None)),
            out_specs=(P(None, None), P(None), P(None, None)),
            check_vma=False,
        )
        def sharded(z, embed, cs, ea):
            cb_local = Codebook(embed, cs, ea)
            *_, new_cb = quantize_topk(z, cb_local, K, train=True,
                                       axis_name="data")
            return new_cb.embed, new_cb.cluster_size, new_cb.embed_avg

        embed, cs, ea = sharded(z, cb.embed, cb.cluster_size, cb.embed_avg)
        np.testing.assert_allclose(np.asarray(cs),
                                   np.asarray(ref_cb.cluster_size),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(embed),
                                   np.asarray(ref_cb.embed),
                                   rtol=1e-4, atol=1e-5)

    def test_pallas_train_kernel_composes_with_psum(self, setup,
                                                    cpu_mesh_devices):
        """The TRAINING Pallas kernel's in-kernel EMA statistics must compose
        with the cross-replica psum (ema_apply axis_name): per-shard
        (counts, embed_sum) from the kernel, psum'd over 'data', must give
        the same codebook update as the unsharded XLA path on the global
        batch — the per-GPU-buffer divergence the torch version silently
        accepts (unet.py:298-309) can never happen here."""
        import functools

        from jax import shard_map
        from jax.sharding import Mesh, PartitionSpec as P

        cb, _ = setup
        rng = np.random.default_rng(5)
        z = jnp.asarray(rng.normal(size=(8, 4, 4, DIM)).astype(np.float32))

        *_, ref_cb = quantize_topk(z, cb, K, train=True)  # XLA, global batch

        mesh = Mesh(np.array(cpu_mesh_devices), ("data",))

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P("data"), P(None, None), P(None), P(None, None)),
            out_specs=(P(None, None), P(None), P(None, None)),
            check_vma=False,
        )
        def sharded(z, embed, cs, ea):
            cb_local = Codebook(embed, cs, ea)
            *_, new_cb = quantize_topk(z, cb_local, K, train=True,
                                       axis_name="data", use_pallas=True)
            return new_cb.embed, new_cb.cluster_size, new_cb.embed_avg

        embed, cs, ea = sharded(z, cb.embed, cb.cluster_size, cb.embed_avg)
        np.testing.assert_allclose(np.asarray(cs),
                                   np.asarray(ref_cb.cluster_size),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ea),
                                   np.asarray(ref_cb.embed_avg),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(embed),
                                   np.asarray(ref_cb.embed),
                                   rtol=1e-4, atol=1e-5)


class TestPallasKernel:
    def test_matches_pure_jax(self, setup):
        cb, z = setup
        q_ref, diff_ref, q_st_ref, _ = quantize_topk(z, cb, K, train=False)
        q_pal, diff_pal, q_st_pal, _ = quantize_topk(
            z, cb, K, train=False, use_pallas=True
        )
        np.testing.assert_allclose(np.asarray(q_pal), np.asarray(q_ref),
                                   rtol=1e-5, atol=1e-5)
        assert float(diff_pal) == pytest.approx(float(diff_ref), rel=1e-5)
        np.testing.assert_allclose(np.asarray(q_st_pal), np.asarray(q_st_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_non_tile_aligned_rows(self, setup):
        # 2*8*8 = 128 rows < tile 512: exercises the padding path.
        cb, _ = setup
        rng = np.random.default_rng(11)
        z = jnp.asarray(rng.normal(size=(1, 5, 7, DIM)).astype(np.float32))
        q_ref, *_ = quantize_topk(z, cb, K, train=False)
        q_pal, *_ = quantize_topk(z, cb, K, train=False, use_pallas=True)
        np.testing.assert_allclose(np.asarray(q_pal), np.asarray(q_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_train_kernel_matches_pure_jax_ema(self, setup):
        """The training kernel's in-kernel EMA statistics (incl. the pad-row
        count correction) must give the same codebook update as pure JAX."""
        cb, z = setup
        q_ref, diff_ref, _, cb_ref = quantize_topk(z, cb, K, train=True)
        q_pal, diff_pal, _, cb_pal = quantize_topk(z, cb, K, train=True,
                                                   use_pallas=True)
        np.testing.assert_allclose(np.asarray(q_pal), np.asarray(q_ref),
                                   rtol=1e-5, atol=1e-5)
        assert float(diff_pal) == pytest.approx(float(diff_ref), rel=1e-5)
        np.testing.assert_allclose(np.asarray(cb_pal.cluster_size),
                                   np.asarray(cb_ref.cluster_size),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(cb_pal.embed_avg),
                                   np.asarray(cb_ref.embed_avg),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(cb_pal.embed),
                                   np.asarray(cb_ref.embed),
                                   rtol=1e-4, atol=1e-5)

    def test_train_kernel_gradients_match(self, setup):
        """Encoder gradient (through the commit loss) must be unchanged by
        the kernel path."""
        cb, z = setup

        def loss(z, use_pallas):
            _, diff, _, _ = quantize_topk(z, cb, K, train=True,
                                          use_pallas=use_pallas)
            return diff

        g_ref = jax.grad(lambda z: loss(z, False))(z)
        g_pal = jax.grad(lambda z: loss(z, True))(z)
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-8)
