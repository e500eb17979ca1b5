"""Top-k discrete memory addressing (VQ-VAE-style codebook quantizer).

TPU-native rebuild of the reference memory module
(``Code/models/unet.py:267-331`` ``Quantize_topk`` / ``enc_quan_dec_topk``):
L2-nearest-codeword lookup over ``n_embed`` codewords of dim ``embed_dim``,
top-k indices gathered and channel-concatenated, EMA codebook update
(decay 0.99, Laplace-smoothed cluster sizes) during training, straight-through
estimator, and a scalar commit loss ``mean((sg[q] - z)^2)``.

Design differences from the torch original (deliberate, TPU-first):

* The codebook is explicit functional state (:class:`Codebook` NamedTuple)
  threaded through the train step, not a hidden buffer — this is what makes
  the op jit/pjit-safe and lets the EMA statistics be ``psum``'d across a
  data-parallel mesh axis (the torch version silently kept per-GPU buffers).
* Distances are computed as one ``(N, dim) @ (dim, n_embed)`` matmul that XLA
  tiles onto the MXU, with a fused Pallas kernel available for the hot
  inference path (:mod:`ammcnet_aaai2021_tpu.ops.memory_pallas`).
* Semantics preserved exactly: the top-k gather is a pure lookup carrying no
  gradient to the encoder (indices are integers and the codebook is
  non-gradient state); the *only* encoder gradient from this op flows through
  the commit loss, matching the reference where ``embed`` is a torch buffer.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class Codebook(NamedTuple):
    """EMA codebook state (reference registers these as buffers, unet.py:276-280)."""

    embed: jax.Array  # (dim, n_embed) float32
    cluster_size: jax.Array  # (n_embed,) float32
    embed_avg: jax.Array  # (dim, n_embed) float32


def init_codebook(key: jax.Array, dim: int, n_embed: int) -> Codebook:
    """Standard-normal init, embed_avg starting as a copy (unet.py:276-280)."""
    embed = jax.random.normal(key, (dim, n_embed), dtype=jnp.float32)
    return Codebook(
        embed=embed,
        cluster_size=jnp.zeros((n_embed,), jnp.float32),
        embed_avg=embed,
    )


def codebook_distances(flat: jax.Array, embed: jax.Array) -> jax.Array:
    """Squared L2 distances ``(N, n_embed)`` via the expanded quadratic form.

    ``||z||^2 - 2 z.E + ||E||^2`` — one MXU matmul plus two rank-1 updates,
    matching the reference's formulation bit-for-bit in float32.
    """
    flat = flat.astype(jnp.float32)
    embed = embed.astype(jnp.float32)
    z_sq = jnp.sum(flat * flat, axis=1, keepdims=True)  # (N, 1)
    e_sq = jnp.sum(embed * embed, axis=0, keepdims=True)  # (1, n_embed)
    # HIGHEST precision: on TPU, default-precision f32 matmuls run as bf16
    # passes, which can flip near-tie argmins; this matmul is (N,64)x(64,256)
    # — negligible next to the conv trunk — so buy exactness.
    cross = jnp.dot(flat, embed, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return z_sq - 2.0 * cross + e_sq


def ema_apply(
    codebook: Codebook,
    counts: jax.Array,
    embed_sum: jax.Array,
    decay: float = 0.99,
    eps: float = 1e-5,
    axis_name: Optional[str] = None,
) -> Codebook:
    """Apply the EMA + Laplace smoothing given the batch statistics
    (unet.py:298-309).  Under data parallelism the per-shard statistics are
    ``psum``'d over ``axis_name`` before the EMA so every replica applies the
    identical global update (the reference is single-GPU and has no analogue).
    """
    n_embed = codebook.embed.shape[1]
    if axis_name is not None:
        counts = jax.lax.psum(counts, axis_name)
        embed_sum = jax.lax.psum(embed_sum, axis_name)
    cluster_size = codebook.cluster_size * decay + (1.0 - decay) * counts
    embed_avg = codebook.embed_avg * decay + (1.0 - decay) * embed_sum
    n = jnp.sum(cluster_size)
    smoothed = (cluster_size + eps) / (n + n_embed * eps) * n
    embed = embed_avg / smoothed[None, :]
    return Codebook(embed=embed, cluster_size=cluster_size, embed_avg=embed_avg)


def ema_update(
    codebook: Codebook,
    flat: jax.Array,
    top1_idx: jax.Array,
    decay: float = 0.99,
    eps: float = 1e-5,
    axis_name: Optional[str] = None,
) -> Codebook:
    """EMA update computing the one-hot statistics from indices (XLA path)."""
    n_embed = codebook.embed.shape[1]
    flat = flat.astype(jnp.float32)
    onehot = jax.nn.one_hot(top1_idx, n_embed, dtype=jnp.float32)  # (N, n_embed)
    counts = jnp.sum(onehot, axis=0)  # (n_embed,)
    embed_sum = jnp.dot(flat.T, onehot, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    return ema_apply(codebook, counts, embed_sum, decay, eps, axis_name)


def quantize_topk(
    z: jax.Array,
    codebook: Codebook,
    k: int,
    *,
    train: bool = False,
    decay: float = 0.99,
    eps: float = 1e-5,
    axis_name: Optional[str] = None,
    use_pallas: bool = False,
    st_mode: str = "top1",
    per_sample: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, Codebook]:
    """Top-k memory addressing.

    Args:
      z: ``(..., dim)`` latent (any leading shape; reference uses (b, h, w, dim)).
      codebook: current :class:`Codebook` state.
      k: number of nearest codewords gathered and channel-concatenated.
      train: apply the EMA codebook update (reference gates on self.training).
      axis_name: mesh axis to psum EMA statistics over (data-parallel training).
      use_pallas: fuse distance + top-k + gather into one Pallas kernel.
      st_mode: which straight-through variant the two reference module
        families use:

        * ``"top1"`` (``Code/models/unet.py:282-313``): the top-k gather is a
          *pure lookup* carrying no gradient; the commit loss is against the
          top-1 codeword; ``q_st`` is the ST top-1 quantization (returned for
          logging, not fed to the decoder).
        * ``"topk"`` (``Code/models/vqvae.py:283-319``): the input is tiled k
          times and the ST estimator is applied to the *whole* top-k output,
          so decoder gradients reach the encoder; the commit loss compares
          all k codewords against the tiled input; the third return is the
          ST top-1 (== first dim-block of ``q_topk``).  With k=1 this is the
          classic VQ-VAE-2 ``Quantize`` (vqvae.py:9-55).

    Returns:
      ``(q_topk, diff, q_st, new_codebook)`` — ``q_topk`` is ``(..., k*dim)``,
      ``diff`` is the scalar commit loss, ``q_st`` is the ST top-1
      quantization, and ``new_codebook`` the (possibly EMA-updated) state.
    """
    if st_mode not in ("top1", "topk"):
        raise ValueError(f"unknown st_mode {st_mode!r}")
    dim = codebook.embed.shape[0]
    lead_shape = z.shape[:-1]
    flat = z.reshape(-1, dim)

    ema_stats = None
    # pallas_call has no VJP rule; in top1 mode the lookup legitimately
    # carries no gradient (reference embed is a buffer, indices are ints), so
    # the kernel runs on stop_gradient'd inputs — the encoder's only gradient
    # from this op is the commit loss, computed outside the kernel on z.
    flat_ng = jax.lax.stop_gradient(flat)
    if use_pallas and train and st_mode == "top1":
        # training-path kernel also emits the EMA statistics in one pass
        from .memory_pallas import quantize_topk_pallas_train

        q_topk_flat, q1_flat, top1_idx, counts, embed_sum = (
            quantize_topk_pallas_train(flat_ng, codebook.embed, k))
        ema_stats = (counts, embed_sum)
    elif use_pallas and not train:
        from .memory_pallas import quantize_topk_pallas

        q_topk_flat, q1_flat, top1_idx = quantize_topk_pallas(
            flat_ng, codebook.embed, k)
    else:
        dist = codebook_distances(flat, codebook.embed)  # (N, n_embed)
        # top-k smallest distances == top-k largest of -dist (unet.py:294).
        _neg_topv, topk_idx = jax.lax.top_k(-dist, k)  # (N, k)
        top1_idx = topk_idx[:, 0]
        # (N, k, dim) gather from the codeword table; pure int lookup, so no
        # gradient path to z (the reference's embed is a buffer).
        q_topk_flat = jnp.take(codebook.embed.T, topk_idx, axis=0)
        q_topk_flat = q_topk_flat.reshape(-1, k * dim)
        q1_flat = jnp.take(codebook.embed.T, top1_idx, axis=0)

    def _diff(sq_err: jax.Array) -> jax.Array:
        # per_sample: mean over each batch element's own positions/features
        # (the fused scorer's per-frame commit distance; the batch mean of
        # these equals the reference's scalar diff for equal-sized frames).
        if not per_sample:
            return jnp.mean(sq_err)
        per_elem = sq_err.reshape(lead_shape[0], -1) if lead_shape else sq_err
        return jnp.mean(per_elem, axis=-1)

    zf = flat.astype(jnp.float32)
    if st_mode == "top1":
        diff = _diff(jnp.square(jax.lax.stop_gradient(q1_flat) - zf)
                     .reshape(*lead_shape, dim))
        q_out_flat = q_topk_flat
    else:
        z_tiled = jnp.tile(zf, (1, k))  # input.repeat(1,1,1,k), vqvae.py:312
        diff = _diff(jnp.square(jax.lax.stop_gradient(q_topk_flat) - z_tiled)
                     .reshape(*lead_shape, k * dim))
        q_out_flat = z_tiled + jax.lax.stop_gradient(q_topk_flat - z_tiled)
    q_st_flat = zf + jax.lax.stop_gradient(q1_flat - zf)

    new_codebook = codebook
    if train:
        if ema_stats is not None:
            new_codebook = ema_apply(codebook, *ema_stats, decay=decay,
                                     eps=eps, axis_name=axis_name)
        else:
            new_codebook = ema_update(
                codebook, flat, top1_idx, decay=decay, eps=eps,
                axis_name=axis_name
            )

    q_topk = q_out_flat.reshape(*lead_shape, k * dim).astype(z.dtype)
    q_st = q_st_flat.reshape(*lead_shape, dim).astype(z.dtype)
    return q_topk, diff, q_st, new_codebook
