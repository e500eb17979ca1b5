"""FlowNetSD / FlowNet2-SD: frozen optical-flow teacher.

Rebuild of ``Code/models/flownet2/`` (FlowNetSD.py, submodules.py, models.py).
Used ONLY during training to compute the flow-consistency loss between
(last_input, prediction) and (last_input, target) frame pairs
(train_helper.py:309-316); the network is loaded from an external checkpoint,
kept in eval mode, and its outputs are treated as constants (stop_gradient).

Architecture (FlowNetSD.py:7-100): 13 conv encoder (conv0..conv6_1,
LeakyReLU 0.1), 4 deconv stages with 5 predict_flow heads and 4 learned 2ch
flow-upsample transpose convs, inference output ``upsample(flow2 * 20)`` with
bilinear x4 (FlowNet2SD wrapper, models.py:9-59: per-image mean subtraction,
/255 scaling, pair concat to 6ch).

The released pipeline loads FlowNet2-SD with batchNorm=False
(models/__init__.py builds ``FlowNet2SD()`` whose default is batchNorm=False),
so convs carry biases; BN mode is kept for completeness.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

_slope = 0.1


class _ConvLReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    batch_norm: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=pad,
                    use_bias=not self.batch_norm, dtype=self.dtype,
                    name="conv")(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.leaky_relu(x, negative_slope=_slope)


class _IConv(nn.Module):
    """inter_conv: conv with NO activation (submodules.py:24-36)."""

    features: int
    batch_norm: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), padding=1, use_bias=True,
                    dtype=self.dtype, name="conv")(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return x


class _Deconv(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                             padding="SAME", transpose_kernel=True,
                             dtype=self.dtype, name="deconv")(x)
        return nn.leaky_relu(x, negative_slope=_slope)


class FlowNetSD(nn.Module):
    """Core FlowNetSD; input is a (b, h, w, 6) stacked frame pair."""

    batch_norm: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        bn, dt = self.batch_norm, self.dtype
        c = lambda f, k, s, name: _ConvLReLU(f, k, s, bn, dt, name=name)
        out_conv0 = c(64, 3, 1, "conv0")(x, train)
        out_conv1 = c(64, 3, 2, "conv1")(out_conv0, train)
        out_conv1 = c(128, 3, 1, "conv1_1")(out_conv1, train)
        out_conv2 = c(128, 3, 2, "conv2")(out_conv1, train)
        out_conv2 = c(128, 3, 1, "conv2_1")(out_conv2, train)
        out_conv3 = c(256, 3, 2, "conv3")(out_conv2, train)
        out_conv3 = c(256, 3, 1, "conv3_1")(out_conv3, train)
        out_conv4 = c(512, 3, 2, "conv4")(out_conv3, train)
        out_conv4 = c(512, 3, 1, "conv4_1")(out_conv4, train)
        out_conv5 = c(512, 3, 2, "conv5")(out_conv4, train)
        out_conv5 = c(512, 3, 1, "conv5_1")(out_conv5, train)
        out_conv6 = c(1024, 3, 2, "conv6")(out_conv5, train)
        out_conv6 = c(1024, 3, 1, "conv6_1")(out_conv6, train)

        predict = lambda name: nn.Conv(2, (3, 3), padding=1, use_bias=True,
                                       dtype=dt, name=name)
        upflow = lambda name: nn.ConvTranspose(2, (4, 4), strides=(2, 2),
                                               padding="SAME",
                                               transpose_kernel=True,
                                               dtype=dt, name=name)

        flow6 = predict("predict_flow6")(out_conv6)
        flow6_up = upflow("upsampled_flow6_to_5")(flow6)
        out_deconv5 = _Deconv(512, dt, name="deconv5")(out_conv6)

        concat5 = jnp.concatenate([out_conv5, out_deconv5, flow6_up], axis=-1)
        out_interconv5 = _IConv(512, bn, dt, name="inter_conv5")(concat5, train)
        flow5 = predict("predict_flow5")(out_interconv5)
        flow5_up = upflow("upsampled_flow5_to_4")(flow5)
        out_deconv4 = _Deconv(256, dt, name="deconv4")(concat5)

        concat4 = jnp.concatenate([out_conv4, out_deconv4, flow5_up], axis=-1)
        out_interconv4 = _IConv(256, bn, dt, name="inter_conv4")(concat4, train)
        flow4 = predict("predict_flow4")(out_interconv4)
        flow4_up = upflow("upsampled_flow4_to_3")(flow4)
        out_deconv3 = _Deconv(128, dt, name="deconv3")(concat4)

        concat3 = jnp.concatenate([out_conv3, out_deconv3, flow4_up], axis=-1)
        out_interconv3 = _IConv(128, bn, dt, name="inter_conv3")(concat3, train)
        flow3 = predict("predict_flow3")(out_interconv3)
        flow3_up = upflow("upsampled_flow3_to_2")(flow3)
        out_deconv2 = _Deconv(64, dt, name="deconv2")(concat3)

        concat2 = jnp.concatenate([out_conv2, out_deconv2, flow3_up], axis=-1)
        out_interconv2 = _IConv(64, bn, dt, name="inter_conv2")(concat2, train)
        flow2 = predict("predict_flow2")(out_interconv2)

        if train:
            return flow2, flow3, flow4, flow5, flow6
        return flow2


class FlowNet2SD(nn.Module):
    """FlowNet2-SD wrapper (models.py:9-59): mean-subtract, /255, pair concat,
    x4 bilinear upsample of flow2 * div_flow at inference.

    Input: (b, h, w, 3, 2) uint8-range float frames (two RGB frames stacked
    on the last axis, mirroring the torch (b, 3, 2, h, w) layout transposed
    to NHWC-first).
    """

    batch_norm: bool = False
    div_flow: float = 20.0
    rgb_max: float = 255.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, frames: jax.Array, train: bool = False) -> jax.Array:
        f = frames.astype(jnp.float32)
        # Per-image, per-channel mean over (h, w) and both frames
        # (models.py:17: mean over the flattened (c,) trailing view).
        rgb_mean = jnp.mean(f, axis=(1, 2, 4), keepdims=True)
        x = (f - rgb_mean) / self.rgb_max
        x = jnp.concatenate([x[..., 0], x[..., 1]], axis=-1)  # (b,h,w,6)
        flow2 = FlowNetSD(self.batch_norm, self.dtype, name="net")(
            x.astype(self.dtype), train)
        if train:
            return flow2
        flow2 = flow2.astype(jnp.float32) * self.div_flow
        b, h, w, _ = flow2.shape
        # torch nn.Upsample(scale_factor=4, bilinear, align_corners=False)
        # == jax.image.resize 'bilinear' (half-pixel centers).
        return jax.image.resize(flow2, (b, h * 4, w * 4, 2), method="bilinear")
