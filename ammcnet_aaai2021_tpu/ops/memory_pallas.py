"""Fused Pallas TPU kernel for top-k memory addressing.

Fuses the three stages of the reference memory lookup
(``Code/models/unet.py:282-296``: distance computation, top-k selection,
codeword gather) into a single VMEM-resident kernel so the (N, n_embed)
distance matrix never round-trips to HBM.

Problem size (released configs): N = b*32*32 rows, dim=64, n_embed=256, k=2.
The whole codebook (64 KiB) lives in VMEM; each grid step processes a
TILE_N-row block of latents.  Two MXU tricks replace unsupported ops:

* the distance matrix comes from one ``(TILE_N, dim) @ (dim, n_embed)``
  matmul (the ``||z||^2`` term is row-constant and dropped for ranking);
* the gather of selected codewords is a one-hot ``(TILE_N, n_embed) @
  (n_embed, dim)`` matmul instead of a dynamic row gather, which the MXU
  executes natively.

Top-k for small static k is iterative min + mask (k=2 in all released
models).  Falls back to interpret mode off-TPU so tests run on CPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30  # python float: avoids capturing a traced constant in the kernel


def _use_interpret() -> bool:
    """Compile on TPU; interpret elsewhere (CPU tests).

    ``jax.default_backend()`` alone is not enough in this environment: the
    TPU plugin registers itself even when tests pin jax_default_device to
    CPU, so honor the configured default device first.
    """
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform != "tpu"
    return jax.default_backend() != "tpu"


def _quantize_kernel(flat_ref, embed_ref, embed_t_ref, qtopk_ref, q1_ref,
                     idx_ref, *, k: int, n_embed: int, dim: int):
    flat = flat_ref[:].astype(jnp.float32)  # (TILE_N, dim)
    embed = embed_ref[:].astype(jnp.float32)  # (dim, n_embed)
    embed_t = embed_t_ref[:].astype(jnp.float32)  # (n_embed, dim)
    tile_n = flat.shape[0]

    # Ranking scores: -2 z.E + ||E||^2 (row-constant ||z||^2 omitted).
    # HIGHEST precision matches the pure-JAX path bit-for-bit on the f32 MXU
    # (default precision would run bf16 passes and round the codewords).
    e_sq = jnp.sum(embed * embed, axis=0, keepdims=True)  # (1, n_embed)
    dist = -2.0 * jnp.dot(flat, embed, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST) + e_sq

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_n, n_embed), 1)
    remaining = dist
    for j in range(k):
        # Argmin via min + lowest-index tie-break (matches jax.lax.top_k /
        # torch.topk determinism).  cumsum doesn't lower on Mosaic, so the
        # first-match one-hot is built from a min over column indices.
        m = jnp.min(remaining, axis=1, keepdims=True)  # (TILE_N, 1)
        is_min = remaining <= m
        idx_min = jnp.min(
            jnp.where(is_min, col_ids, n_embed), axis=1, keepdims=True
        )
        onehot = (col_ids == idx_min).astype(jnp.float32)  # (TILE_N, n_embed)
        # Gather as matmul: selected codewords (TILE_N, dim) on the MXU.
        q_j = jnp.dot(onehot, embed_t, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        qtopk_ref[:, j * dim : (j + 1) * dim] = q_j
        if j == 0:
            q1_ref[:] = q_j
            idx = jnp.sum(onehot * col_ids.astype(jnp.float32), axis=1)
            idx_ref[:] = idx.astype(jnp.int32)[:, None]
        remaining = remaining + onehot * _BIG

def _quantize_train_kernel(flat_ref, embed_ref, embed_t_ref, qtopk_ref,
                           q1_ref, idx_ref, counts_ref, esum_ref,
                           *, k: int, n_embed: int, dim: int):
    """Training variant: additionally accumulates the EMA statistics
    (one-hot counts and z^T.onehot codeword sums) across grid steps into
    revisited output blocks — the scatter-add the torch version does on host
    buffers happens here on the MXU."""
    i = pl.program_id(0)
    flat = flat_ref[:].astype(jnp.float32)
    embed = embed_ref[:].astype(jnp.float32)
    embed_t = embed_t_ref[:].astype(jnp.float32)
    tile_n = flat.shape[0]

    e_sq = jnp.sum(embed * embed, axis=0, keepdims=True)
    dist = -2.0 * jnp.dot(flat, embed, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST) + e_sq
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_n, n_embed), 1)
    remaining = dist
    onehot1 = None
    for j in range(k):
        m = jnp.min(remaining, axis=1, keepdims=True)
        is_min = remaining <= m
        idx_min = jnp.min(jnp.where(is_min, col_ids, n_embed), axis=1,
                          keepdims=True)
        onehot = (col_ids == idx_min).astype(jnp.float32)
        q_j = jnp.dot(onehot, embed_t, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        qtopk_ref[:, j * dim : (j + 1) * dim] = q_j
        if j == 0:
            onehot1 = onehot
            q1_ref[:] = q_j
            idx = jnp.sum(onehot * col_ids.astype(jnp.float32), axis=1)
            idx_ref[:] = idx.astype(jnp.int32)[:, None]
        remaining = remaining + onehot * _BIG

    # EMA statistics, accumulated across the (sequential) TPU grid into the
    # revisited (1, n_embed)/(dim, n_embed) output blocks
    tile_counts = jnp.sum(onehot1, axis=0, keepdims=True)  # (1, n_embed)
    tile_esum = jnp.dot(flat.T, onehot1,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # (dim, n_embed)

    @pl.when(i == 0)
    def _():
        counts_ref[:] = tile_counts
        esum_ref[:] = tile_esum

    @pl.when(i > 0)
    def _():
        counts_ref[:] = counts_ref[:] + tile_counts
        esum_ref[:] = esum_ref[:] + tile_esum


def quantize_topk_pallas_train(
    flat: jax.Array, embed: jax.Array, k: int, tile_n: int = 512,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Training-path fused kernel: lookup outputs PLUS the EMA statistics
    (counts (n_embed,), embed_sum (dim, n_embed)) in one pass.

    Rows are zero-padded up to a multiple of ``tile_n``.  A pad row is the
    zero vector: it contributes nothing to ``embed_sum`` (0^T @ onehot) but
    adds 1 to its nearest codeword's count, so this wrapper subtracts the
    pad rows' contribution from ``counts`` using their returned top-1
    indices before handing the statistics back.
    """
    n, dim = flat.shape
    n_embed = embed.shape[1]
    n_pad = -(-n // tile_n) * tile_n
    flat_p = jnp.pad(flat, ((0, n_pad - n), (0, 0)))
    grid = (n_pad // tile_n,)

    kernel = functools.partial(_quantize_train_kernel, k=k, n_embed=n_embed,
                               dim=dim)
    q_topk, q1, idx, counts, esum = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, n_embed), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_embed, dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, k * dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_embed), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, n_embed), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, k * dim), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, dim), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, n_embed), jnp.float32),
            jax.ShapeDtypeStruct((dim, n_embed), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(flat_p, embed, embed.T)
    counts = counts[0]
    if n_pad != n:
        # pad rows are zero vectors: their embed_sum contribution is zero
        # (0^T @ onehot) but each adds 1 to its chosen codeword's count —
        # subtract those using the returned pad-row indices
        pad_idx = idx[n:, 0]
        correction = jax.nn.one_hot(pad_idx, n_embed,
                                    dtype=jnp.float32).sum(axis=0)
        counts = counts - correction
    return q_topk[:n], q1[:n], idx[:n, 0], counts, esum


def quantize_topk_pallas(
    flat: jax.Array, embed: jax.Array, k: int, tile_n: int = 512,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused distance + top-k + gather.

    Args:
      flat: (N, dim) latents.
      embed: (dim, n_embed) codebook.
      k: codewords per row.

    Returns:
      (q_topk (N, k*dim) f32, q1 (N, dim) f32, top1_idx (N,) int32)
    """
    n, dim = flat.shape
    n_embed = embed.shape[1]
    n_pad = -(-n // tile_n) * tile_n
    flat_p = jnp.pad(flat, ((0, n_pad - n), (0, 0)))
    grid = (n_pad // tile_n,)

    kernel = functools.partial(
        _quantize_kernel, k=k, n_embed=n_embed, dim=dim
    )
    q_topk, q1, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, n_embed), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_embed, dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, k * dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, k * dim), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, dim), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * dim * n_embed * (1 + k),
            bytes_accessed=4 * (n_pad * dim * 2 + dim * n_embed * 2
                                + n_pad * k * dim),
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(flat_p, embed, embed.T)
    return q_topk[:n], q1[:n], idx[:n, 0]
