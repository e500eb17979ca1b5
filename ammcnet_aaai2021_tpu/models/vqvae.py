"""VQ-VAE-2 generator family (stage-1-era / ablation nets).

Rebuild of ``Code/models/vqvae.py``: two-level (top + bottom) VQ-VAE with
stride-4/stride-2 encoders, the ``_topk`` / ``_topk_res`` variants whose
memory blocks use the vqvae-flavoured straight-through (st_mode="topk",
vqvae.py:283-319), and the ``_twostream`` variant with a ``middle_unet``
concat bridge at both levels plus branch freezing for stage-2
(vqvae.py:526-643).

These stay in the factory surface for parity (models/__init__.py:92-107);
the released AMMCNet model is :class:`~.unet_mem.TwoStreamUNetMem`.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.memory import Codebook, quantize_topk
from .blocks import conv_init


class ResBlock(nn.Module):
    """relu -> conv3x3 -> relu -> conv1x1, residual (vqvae.py:58-73)."""

    res_channel: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.relu(x)
        h = nn.Conv(self.res_channel, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=conv_init, name="conv0")(h)
        h = nn.relu(h)
        h = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                    kernel_init=conv_init, name="conv1")(h)
        return x + h


class Encoder(nn.Module):
    """Strided conv encoder, stride in {2, 4, 8} (vqvae.py:75-114)."""

    channel: int
    n_res_block: int
    n_res_channel: int
    stride: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.channel

        def sconv(x, feat, i):
            return nn.Conv(feat, (4, 4), strides=(2, 2), padding=1,
                           dtype=self.dtype, kernel_init=conv_init,
                           name=f"conv{i}")(x)

        if self.stride == 8:
            x = nn.relu(sconv(x, c // 2, 0))
            x = nn.relu(sconv(x, c, 1))
            x = nn.relu(sconv(x, c, 2))
            x = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                        kernel_init=conv_init, name="conv3")(x)
        elif self.stride == 4:
            x = nn.relu(sconv(x, c // 2, 0))
            x = nn.relu(sconv(x, c, 1))
            x = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                        kernel_init=conv_init, name="conv2")(x)
        elif self.stride == 2:
            x = nn.relu(sconv(x, c // 2, 0))
            x = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                        kernel_init=conv_init, name="conv1")(x)
        else:
            raise ValueError(f"unsupported stride {self.stride}")
        for i in range(self.n_res_block):
            x = ResBlock(self.n_res_channel, self.dtype, name=f"res{i}")(x)
        return nn.relu(x)


class Decoder(nn.Module):
    """conv3x3 -> resblocks -> transpose-conv upsampling (vqvae.py:117-161)."""

    out_channel: int
    channel: int
    n_res_block: int
    n_res_channel: int
    stride: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.channel
        x = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=conv_init, name="conv_in")(x)
        for i in range(self.n_res_block):
            x = ResBlock(self.n_res_channel, self.dtype, name=f"res{i}")(x)
        x = nn.relu(x)

        def up(x, feat, i):
            # torch ConvTranspose2d(k=4, s=2, p=1) == flax SAME +
            # transpose_kernel (verified numerically in tests/test_models.py).
            return nn.ConvTranspose(feat, (4, 4), strides=(2, 2),
                                    padding="SAME", transpose_kernel=True,
                                    dtype=self.dtype, kernel_init=conv_init,
                                    name=f"up{i}")(x)

        if self.stride == 8:
            x = nn.relu(up(x, c // 2, 0))
            x = nn.relu(up(x, self.out_channel, 1))
            x = up(x, self.out_channel, 2)
        elif self.stride == 4:
            x = nn.relu(up(x, c // 2, 0))
            x = up(x, self.out_channel, 1)
        elif self.stride == 2:
            x = up(x, self.out_channel, 0)
        else:
            raise ValueError(f"unsupported stride {self.stride}")
        return x


class VQMemory(nn.Module):
    """vqvae-flavoured memory block: 1x1 enc -> Quantize_topk(st=topk) ->
    1x1 dec to embed_dim (vqvae.py:321-336).  ``residual_proj=True`` adds the
    ``enc_x`` projection residual of enc_quan_dec_res_topk (vqvae.py:436-446).
    """

    embed_dim: int
    n_embed: int
    k: int = 1
    residual_proj: bool = False
    # classic VQVAE (vqvae.py:164-240) has only the pre-quantize 1x1
    # (quantize_conv_t/b) and feeds the ST quantize straight to the decoder.
    use_dec: bool = True
    dtype: Any = jnp.bfloat16
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
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

        z = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype,
                    kernel_init=conv_init, name="enc")(x)
        cb = Codebook(embed.value, cluster_size.value, embed_avg.value)
        do_train = train and not self.is_initializing()
        q_topk, diff, q_st, new_cb = quantize_topk(
            z, cb, self.k, train=do_train, axis_name=self.axis_name,
            st_mode="topk")
        if do_train:
            embed.value = new_cb.embed
            cluster_size.value = new_cb.cluster_size
            embed_avg.value = new_cb.embed_avg
        if not self.use_dec:
            return q_topk.astype(self.dtype), diff, q_st
        out = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype,
                      kernel_init=conv_init, name="dec")(q_topk.astype(self.dtype))
        if self.residual_proj:
            out = out + nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype,
                                kernel_init=conv_init, name="enc_x")(x)
        return out, diff, q_st


class _VQVAEBase(nn.Module):
    """Two-level VQ-VAE trunk (vqvae.py:164-240); subclass picks the memory."""

    out_channel: int = 3
    channel: int = 128
    n_res_block: int = 2
    n_res_channel: int = 32
    embed_dim: int = 64
    n_embed: int = 512
    k: int = 1
    residual_proj: bool = False
    classic: bool = False  # True: plain VQVAE with 1x1 quantize_conv only
    dtype: Any = jnp.bfloat16
    axis_name: Optional[str] = None

    def setup(self):
        c, rb, rc = self.channel, self.n_res_block, self.n_res_channel
        self.enc_b = Encoder(c, rb, rc, stride=4, dtype=self.dtype)
        self.enc_t = Encoder(c, rb, rc, stride=2, dtype=self.dtype)
        self.quantize_t = VQMemory(self.embed_dim, self.n_embed,
                                   1 if self.classic else self.k,
                                   residual_proj=self.residual_proj,
                                   use_dec=not self.classic,
                                   dtype=self.dtype, axis_name=self.axis_name)
        self.dec_t = Decoder(self.embed_dim, c, rb, rc, stride=2,
                             dtype=self.dtype)
        self.quantize_b = VQMemory(self.embed_dim, self.n_embed,
                                   1 if self.classic else self.k,
                                   residual_proj=self.residual_proj,
                                   use_dec=not self.classic,
                                   dtype=self.dtype, axis_name=self.axis_name)
        self.upsample_t = nn.ConvTranspose(self.embed_dim, (4, 4),
                                           strides=(2, 2), padding="SAME",
                                           transpose_kernel=True,
                                           dtype=self.dtype,
                                           kernel_init=conv_init)
        self.dec = Decoder(self.out_channel, c, rb, rc, stride=4,
                           dtype=self.dtype)

    def encode(self, x, train=False):
        enc_b = self.enc_b(x)
        enc_t = self.enc_t(enc_b)
        quant_t, diff_t, id_t = self.quantize_t(enc_t, train)
        dec_t = self.dec_t(quant_t)
        enc_b = jnp.concatenate([dec_t, enc_b], axis=-1)
        quant_b, diff_b, id_b = self.quantize_b(enc_b, train)
        return quant_t, quant_b, diff_t + diff_b, id_t, id_b

    def decode(self, quant_t, quant_b):
        up_t = self.upsample_t(quant_t)
        quant = jnp.concatenate([up_t, quant_b], axis=-1)
        return self.dec(quant)

    def __call__(self, x: jax.Array, train: bool = False):
        quant_t, quant_b, diff, _, _ = self.encode(x, train)
        return self.decode(quant_t, quant_b), diff


class VQVAE(_VQVAEBase):
    """Classic two-level VQ-VAE (vqvae.py:164-240): k=1, ST quantize."""

    classic: bool = True


class VQVAETopK(_VQVAEBase):
    """VQVAE_topk (vqvae.py:336-398)."""


class VQVAETopKRes(_VQVAEBase):
    """VQVAE_topk_res (vqvae.py:436-501): projection-residual memory."""

    residual_proj: bool = True


class MiddleUNet(nn.Module):
    """Concat bridge of the vqvae two-stream (vqvae.py:526-539):
    ResBlock cross paths + 1x1 reducers."""

    features: int = 64
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, zx: jax.Array, zy: jax.Array
                 ) -> Tuple[jax.Array, jax.Array]:
        o2f = ResBlock(self.features, self.dtype, name="O2F")(zy)
        f2o = ResBlock(self.features, self.dtype, name="F2O")(zx)
        x1 = jnp.concatenate([zx, o2f], axis=-1)
        y1 = jnp.concatenate([zy, f2o], axis=-1)
        x1 = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                     kernel_init=conv_init, name="dec_x")(x1)
        y1 = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                     kernel_init=conv_init, name="dec_y")(y1)
        return x1, y1


class VQVAETopKTwoStream(nn.Module):
    """Two-stream VQ-VAE with middle_unet bridges at both levels
    (vqvae.py:541-643).  Branch freezing (fixed_rgb_op_branch) is expressed
    at the optimizer level via :func:`bridge_only_mask` — in functional JAX
    "requires_grad=False" becomes an optax zero-update mask."""

    rgb_out: int = 3
    op_out: int = 2
    channel: int = 128
    n_res_block: int = 2
    n_res_channel: int = 32
    embed_dim: int = 64
    n_embed: int = 512
    k: int = 1
    dtype: Any = jnp.bfloat16
    axis_name: Optional[str] = None

    def setup(self):
        c, rb, rc, e = self.channel, self.n_res_block, self.n_res_channel, self.embed_dim
        self.enc_b_1 = Encoder(c, rb, rc, stride=4, dtype=self.dtype)
        self.enc_t_1 = Encoder(c, rb, rc, stride=2, dtype=self.dtype)
        self.enc_b_2 = Encoder(c, rb, rc, stride=4, dtype=self.dtype)
        self.enc_t_2 = Encoder(c, rb, rc, stride=2, dtype=self.dtype)
        self.quantize_t_1 = VQMemory(e, self.n_embed, self.k, dtype=self.dtype,
                                     axis_name=self.axis_name)
        self.dec_t_1 = Decoder(e, c, rb, rc, stride=2, dtype=self.dtype)
        self.quantize_t_2 = VQMemory(e, self.n_embed, self.k, dtype=self.dtype,
                                     axis_name=self.axis_name)
        self.dec_t_2 = Decoder(e, c, rb, rc, stride=2, dtype=self.dtype)
        self.bridge_t = MiddleUNet(e, self.dtype)
        self.quantize_b_1 = VQMemory(e, self.n_embed, self.k, dtype=self.dtype,
                                     axis_name=self.axis_name)
        self.upsample_t_1 = nn.ConvTranspose(e, (4, 4), strides=(2, 2),
                                             padding="SAME",
                                             transpose_kernel=True,
                                             dtype=self.dtype,
                                             kernel_init=conv_init)
        self.dec_1 = Decoder(self.rgb_out, c, rb, rc, stride=4, dtype=self.dtype)
        self.quantize_b_2 = VQMemory(e, self.n_embed, self.k, dtype=self.dtype,
                                     axis_name=self.axis_name)
        self.upsample_t_2 = nn.ConvTranspose(e, (4, 4), strides=(2, 2),
                                             padding="SAME",
                                             transpose_kernel=True,
                                             dtype=self.dtype,
                                             kernel_init=conv_init)
        self.dec_2 = Decoder(self.op_out, c, rb, rc, stride=4, dtype=self.dtype)
        # reference misspells this attr as "bride_b" (vqvae.py:578); use the
        # correct name here, converter maps it.
        self.bridge_b = MiddleUNet(e, self.dtype)

    def __call__(self, rgb: jax.Array, op: jax.Array, train: bool = False):
        enc_b_1 = self.enc_b_1(rgb)
        enc_t_1 = self.enc_t_1(enc_b_1)
        enc_b_2 = self.enc_b_2(op)
        enc_t_2 = self.enc_t_2(enc_b_2)
        quant_t_1, diff_t_1, _ = self.quantize_t_1(enc_t_1, train)
        quant_t_2, diff_t_2, _ = self.quantize_t_2(enc_t_2, train)
        quant_t_1, quant_t_2 = self.bridge_t(quant_t_1, quant_t_2)
        dec_t_1 = self.dec_t_1(quant_t_1)
        enc_b_1 = jnp.concatenate([dec_t_1, enc_b_1], axis=-1)
        dec_t_2 = self.dec_t_2(quant_t_2)
        enc_b_2 = jnp.concatenate([dec_t_2, enc_b_2], axis=-1)
        quant_b_1, diff_b_1, _ = self.quantize_b_1(enc_b_1, train)
        quant_b_2, diff_b_2, _ = self.quantize_b_2(enc_b_2, train)
        quant_b_1, quant_b_2 = self.bridge_b(quant_b_1, quant_b_2)
        up_1 = self.upsample_t_1(quant_t_1)
        dec_1 = self.dec_1(jnp.concatenate([up_1, quant_b_1], axis=-1))
        up_2 = self.upsample_t_2(quant_t_2)
        dec_2 = self.dec_2(jnp.concatenate([up_2, quant_b_2], axis=-1))
        diff = diff_t_1 + diff_t_2 + diff_b_1 + diff_b_2
        return dec_1, dec_2, diff


def bridge_only_mask(params) -> object:
    """optax mask pytree: True (trainable) only for bridge subtrees.

    Functional replacement for the reference's ``fixed_rgb_op_branch``
    (vqvae.py:634-643) and the requires_grad-filtered optimizer
    (optimizer/__init__.py:40-42): everything except ``bridge*`` params gets
    zero updates.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    mask = {kp: kp[0].startswith("bridge") for kp in flat}
    return flax.traverse_util.unflatten_dict(mask)
