"""PatchGAN discriminator.

Rebuild of the reference "PixelDiscriminator" (``Code/models/pix2pix_networks.py:580-631``
as configured by ``const_params.py:34``): despite the name it is a 4-layer
PatchGAN — 4x4 convs, stride 2, padding 2, LeakyReLU(0.1), filter widths
(128, 256, 512, 512), then a final 4x4 stride-1 conv to a 1-channel score
map.  Applied to the RGB prediction only (train_helper.py:318,327-334).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import conv_init


class PixelDiscriminator(nn.Module):
    num_filters: Sequence[int] = (128, 256, 512, 512)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = ((2, 2), (2, 2))
        for i, width in enumerate(self.num_filters[:-1]):
            x = nn.Conv(width, (4, 4), strides=(2, 2), padding=pad,
                        dtype=self.dtype, kernel_init=conv_init,
                        name=f"conv{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.1)
        x = nn.Conv(1, (4, 4), strides=(1, 1), padding=pad, dtype=self.dtype,
                    kernel_init=conv_init, name="out")(x)
        return x.astype(jnp.float32)
