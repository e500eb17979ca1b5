"""UNet building blocks (flax.linen, NHWC).

TPU-native rebuild of the reference UNet plumbing
(``Code/models/unet.py:8-84``: double_conv / inconv / down / up / UNet).
Everything is NHWC (TPU conv-native layout) with bfloat16 compute and
float32 params; BatchNorm statistics stay float32.

Parity notes for the torch->jax checkpoint converter
(:mod:`ammcnet_aaai2021_tpu.tools.torch_convert`):

* 3x3 convs in double_conv carry no bias (BatchNorm follows), the final
  1-channel output conv does (unet.py:11-15,71).
* torch BatchNorm2d(momentum=0.1, eps=1e-5) == flax BatchNorm(momentum=0.9,
  epsilon=1e-5) — flax momentum is the *retention* factor.
* torch ConvTranspose2d(in, in//2, 2, stride=2) == flax ConvTranspose with
  ``transpose_kernel=True`` (gradient-of-conv semantics); verified
  numerically against torch in tests/test_models.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

# Conv-weight init used by the reference trainer (utils.py:328-334:
# normal(0, 0.02) on every Conv layer).
conv_init = nn.initializers.normal(stddev=0.02)


class DoubleConv(nn.Module):
    """(conv 3x3 -> BN -> relu) x 2 (reference double_conv, unet.py:8-20)."""

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, kernel_init=conv_init,
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class Down(nn.Module):
    """maxpool 2x2 then DoubleConv (reference down, unet.py:33-41)."""

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return DoubleConv(self.features, self.dtype, name="conv")(x, train)


class Up(nn.Module):
    """ConvTranspose 2x2 stride-2 upsample, concat skip, DoubleConv
    (reference up, unet.py:44-59).  ``features`` is the output channel count;
    the transpose conv halves the incoming channels like the torch original.
    """

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x1: jax.Array, x2: jax.Array,
                 train: bool = False) -> jax.Array:
        in_ch = x1.shape[-1]
        x1 = nn.ConvTranspose(in_ch // 2, (2, 2), strides=(2, 2),
                              transpose_kernel=True, dtype=self.dtype,
                              kernel_init=conv_init, name="up")(x1)
        #

        # Center-pad to the skip's spatial dims (torch F.pad with diff//2).
        dh = x2.shape[1] - x1.shape[1]
        dw = x2.shape[2] - x1.shape[2]
        if dh or dw:
            x1 = jnp.pad(x1, ((0, 0), (dh // 2, dh - dh // 2),
                              (dw // 2, dw - dw // 2), (0, 0)))
        x = jnp.concatenate([x2, x1], axis=-1)
        return DoubleConv(self.features, self.dtype, name="conv")(x, train)


class UNet(nn.Module):
    """Plain 4-level UNet with tanh output (reference UNet, unet.py:61-84)."""

    out_channels: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x1 = DoubleConv(64, self.dtype, name="inc")(x, train)
        x2 = Down(128, self.dtype, name="down1")(x1, train)
        x3 = Down(256, self.dtype, name="down2")(x2, train)
        x4 = Down(512, self.dtype, name="down3")(x3, train)
        y = Up(256, self.dtype, name="up1")(x4, x3, train)
        y = Up(128, self.dtype, name="up2")(y, x2, train)
        y = Up(64, self.dtype, name="up3")(y, x1, train)
        y = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=conv_init, name="outc")(y)
        return jnp.tanh(y.astype(jnp.float32))
