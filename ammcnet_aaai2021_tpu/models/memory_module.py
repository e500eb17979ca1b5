"""Flax wrappers around the functional memory op.

Rebuild of ``Code/models/unet.py:318-331,379-387``
(``enc_quan_dec_topk`` / ``enc_quan_dec_res_topk``): a 1x1 conv squeezes the
trunk channels to ``embed_dim``, the top-k quantizer addresses the codebook,
and a 1x1 conv expands ``k * embed_dim`` back, optionally with a residual
connection around the whole block.

The EMA codebook lives in a dedicated ``codebook`` variable collection
(torch buffers -> flax non-param state), updated in-place during training
applies with ``mutable=["codebook", "batch_stats"]``.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.memory import Codebook, quantize_topk
from .blocks import conv_init


class TopKMemory(nn.Module):
    """The quantizer itself (reference Quantize_topk, unet.py:267-313)."""

    embed_dim: int
    n_embed: int
    k: int = 1
    decay: float = 0.99
    eps: float = 1e-5
    axis_name: Optional[str] = None
    use_pallas: bool = False
    per_sample_diff: bool = False

    @nn.compact
    def __call__(self, z: jax.Array,
                 train: bool = False) -> Tuple[jax.Array, jax.Array, jax.Array]:
        init_embed = None

        def embed_init():
            nonlocal init_embed
            if init_embed is None:
                init_embed = jax.random.normal(
                    self.make_rng("params"), (self.embed_dim, self.n_embed),
                    dtype=jnp.float32)
            return init_embed

        embed = self.variable("codebook", "embed", embed_init)
        cluster_size = self.variable(
            "codebook", "cluster_size",
            lambda: jnp.zeros((self.n_embed,), jnp.float32))
        embed_avg = self.variable("codebook", "embed_avg", embed_init)

        cb = Codebook(embed.value, cluster_size.value, embed_avg.value)
        do_train = train and not self.is_initializing()
        q_topk, diff, q_st, new_cb = quantize_topk(
            z, cb, self.k, train=do_train, decay=self.decay, eps=self.eps,
            axis_name=self.axis_name,
            use_pallas=self.use_pallas and self.axis_name is None,
            per_sample=self.per_sample_diff,
        )
        if do_train:
            embed.value = new_cb.embed
            cluster_size.value = new_cb.cluster_size
            embed_avg.value = new_cb.embed_avg
        return q_topk, diff, q_st


class EncQuanDecTopK(nn.Module):
    """1x1 conv -> quantize -> 1x1 conv (reference enc_quan_dec_topk)."""

    in_features: int
    embed_dim: int
    n_embed: int
    k: int = 1
    dtype: Any = jnp.bfloat16
    axis_name: Optional[str] = None
    use_pallas: bool = False
    per_sample_diff: bool = False

    @nn.compact
    def __call__(self, x: jax.Array,
                 train: bool = False) -> Tuple[jax.Array, jax.Array, jax.Array]:
        z = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype,
                    kernel_init=conv_init, name="enc")(x)
        q_topk, diff, q_st = TopKMemory(
            self.embed_dim, self.n_embed, self.k,
            axis_name=self.axis_name, use_pallas=self.use_pallas,
            per_sample_diff=self.per_sample_diff,
            name="quantize")(z, train)
        out = nn.Conv(self.in_features, (1, 1), dtype=self.dtype,
                      kernel_init=conv_init, name="dec")(q_topk.astype(self.dtype))
        return out, diff, q_st


class EncQuanDecResTopK(nn.Module):
    """Residual wrapper: out += x (reference enc_quan_dec_res_topk)."""

    in_features: int
    embed_dim: int
    n_embed: int
    k: int = 1
    dtype: Any = jnp.bfloat16
    axis_name: Optional[str] = None
    use_pallas: bool = False
    per_sample_diff: bool = False

    @nn.compact
    def __call__(self, x: jax.Array,
                 train: bool = False) -> Tuple[jax.Array, jax.Array, jax.Array]:
        out, diff, q_st = EncQuanDecTopK(
            self.in_features, self.embed_dim, self.n_embed, self.k,
            dtype=self.dtype, axis_name=self.axis_name,
            use_pallas=self.use_pallas,
            per_sample_diff=self.per_sample_diff, name="quan")(x, train)
        return out + x, diff, q_st
