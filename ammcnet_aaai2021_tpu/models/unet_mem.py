"""Memory-augmented UNet streams and the two-stream AMMC generator.

Rebuild of the released model family (``Code/models/unet.py``):

* :class:`UNetMemStream` == ``UNetMem_v7`` (unet.py:908-938): 4-level UNet
  with a residual top-k memory block at the 512-channel bottleneck
  (``residual_memory=False`` is OUR extension — a single non-residual block —
  not a reference variant).
* :class:`UNetMemV4` == ``UNetMem_v4`` (unet.py:393-430): TWO residual
  memory blocks, at the 256-ch (down2) and 512-ch (down3) levels, summed
  commit diff (stage-1-era variant; factory-unreachable in the reference,
  whose get_unet_vq_topk_res has the v4 call commented out).
* :class:`AMFTBridge` == ``bridge`` (unet.py:956-964): additive cross-stream
  feature transfer, ``x = zx + O2F(zy); y = zy + F2O(zx)``.
* :class:`ConcatBridge` / :class:`AddBridge` == ``bridge_concat_dire`` /
  ``bridge_add_dire`` ablations (unet.py:1010-1028) — both collapse the two
  bottlenecks into one shared code.
* :class:`TwoStreamUNetMem` == ``twostream`` (unet.py:967-1007): the released
  AMMCNet generator — twin streams for RGB (12->3 ch) and optical flow
  (6->2 ch) with the AMFT bridge between the quantized bottlenecks.

All modules are NHWC; inputs are channel-stacked clips ``(b, h, w, t*c)``
and outputs are tanh frames plus per-stream commit losses and
straight-through codes.  Streams are ``setup()``-style modules so the
two-stream generator can interleave their encode / memory / decode phases
around the bridge, mirroring the reference's explicit forward.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import DoubleConv, Down, Up, conv_init
from .memory_module import EncQuanDecResTopK, EncQuanDecTopK


class UNetMemStream(nn.Module):
    """UNetMem_v7: residual memory at the 512-ch bottleneck (unet.py:908-938).

    ``residual_memory=False`` gives UNetMem_v4 (non-residual memory,
    unet.py:393-430).
    """

    out_channels: int = 3
    embed_dim: int = 64
    n_embed: int = 512
    k: int = 1
    dtype: Any = jnp.bfloat16
    axis_name: Optional[str] = None
    use_pallas: bool = False
    per_sample_diff: bool = False
    residual_memory: bool = True

    def setup(self):
        self.inc = DoubleConv(64, self.dtype)
        self.down1 = Down(128, self.dtype)
        self.down2 = Down(256, self.dtype)
        self.down3 = Down(512, self.dtype)
        mem_cls = EncQuanDecResTopK if self.residual_memory else EncQuanDecTopK
        self.vq_down3 = mem_cls(512, self.embed_dim, self.n_embed, self.k,
                                dtype=self.dtype, axis_name=self.axis_name,
                                use_pallas=self.use_pallas,
                                per_sample_diff=self.per_sample_diff)
        self.up1 = Up(256, self.dtype)
        self.up2 = Up(128, self.dtype)
        self.up3 = Up(64, self.dtype)
        self.outc = nn.Conv(self.out_channels, (3, 3), padding=1,
                            dtype=self.dtype, kernel_init=conv_init)

    def encode(self, x: jax.Array, train: bool = False):
        x1 = self.inc(x, train)
        x2 = self.down1(x1, train)
        x3 = self.down2(x2, train)
        x4 = self.down3(x3, train)
        return x1, x2, x3, x4

    def memory(self, x4: jax.Array, train: bool = False):
        return self.vq_down3(x4, train)

    def decode(self, x4: jax.Array, skips, train: bool = False) -> jax.Array:
        x1, x2, x3 = skips
        y = self.up1(x4, x3, train)
        y = self.up2(y, x2, train)
        y = self.up3(y, x1, train)
        y = self.outc(y)
        return jnp.tanh(y.astype(jnp.float32))

    def __call__(self, x: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        x1, x2, x3, x4 = self.encode(x, train)
        x4, diff, q_st = self.memory(x4, train)
        out = self.decode(x4, (x1, x2, x3), train)
        return out, diff, q_st


class UNetMemV4(nn.Module):
    """UNetMem_v4 (unet.py:393-430): residual memory at BOTH the 256-ch and
    512-ch levels; returns (tanh out, diff_256 + diff_512, (code_256,
    code_512))."""

    out_channels: int = 3
    embed_dim: int = 64
    n_embed: int = 512
    k: int = 1
    dtype: Any = jnp.bfloat16
    axis_name: Optional[str] = None
    use_pallas: bool = False
    per_sample_diff: bool = False

    def setup(self):
        self.inc = DoubleConv(64, self.dtype)
        self.down1 = Down(128, self.dtype)
        self.down2 = Down(256, self.dtype)
        self.down3 = Down(512, self.dtype)
        mem = lambda feats: EncQuanDecResTopK(
            feats, self.embed_dim, self.n_embed, self.k, dtype=self.dtype,
            axis_name=self.axis_name, use_pallas=self.use_pallas,
            per_sample_diff=self.per_sample_diff)
        self.vq_down2 = mem(256)
        self.vq_down3 = mem(512)
        self.up1 = Up(256, self.dtype)
        self.up2 = Up(128, self.dtype)
        self.up3 = Up(64, self.dtype)
        self.outc = nn.Conv(self.out_channels, (3, 3), padding=1,
                            dtype=self.dtype, kernel_init=conv_init)

    def __call__(self, x: jax.Array, train: bool = False):
        x1 = self.inc(x, train)
        x2 = self.down1(x1, train)
        x3 = self.down2(x2, train)
        x3, diff_3, code_3 = self.vq_down2(x3, train)
        x4 = self.down3(x3, train)
        x4, diff_4, code_4 = self.vq_down3(x4, train)
        y = self.up1(x4, x3, train)
        y = self.up2(y, x2, train)
        y = self.up3(y, x1, train)
        y = self.outc(y)
        return jnp.tanh(y.astype(jnp.float32)), diff_3 + diff_4, (code_3, code_4)


class AMFTBridge(nn.Module):
    """Additive appearance-motion feature transfer (unet.py:956-964)."""

    features: int = 512
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, zx: jax.Array, zy: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
        o2f = DoubleConv(self.features, self.dtype, name="O2F")(zy, train)
        f2o = DoubleConv(self.features, self.dtype, name="F2O")(zx, train)
        return zx + o2f, zy + f2o


class ConcatBridge(nn.Module):
    """Ablation: concat + 1x1, shared code for both streams (unet.py:1010-1018)."""

    features: int = 512
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, zx: jax.Array, zy: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
        z = jnp.concatenate([zx, zy], axis=-1)
        z = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                    kernel_init=conv_init, name="dec")(z)
        return z, z


class AddBridge(nn.Module):
    """Ablation: plain add, shared code for both streams (unet.py:1021-1028)."""

    features: int = 512
    dtype: Any = jnp.bfloat16

    def __call__(self, zx: jax.Array, zy: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
        z = zx + zy
        return z, z


_BRIDGES = {"amft": AMFTBridge, "concat_dire": ConcatBridge,
            "add_dire": AddBridge}


class TwoStreamUNetMem(nn.Module):
    """The released AMMCNet generator (reference twostream, unet.py:967-1007).

    Returns ``(rgb_pred, op_pred, (rgb_diff, op_diff), (rgb_code, op_code))``
    mirroring the reference's 4-tuple; per-stream commit diffs are kept
    separate (the test helper consumes them element-wise,
    test_helper.py:443-444) and summed by the stage-2 loss.
    """

    rgb_out: int = 3
    op_out: int = 2
    embed_dim: int = 64
    n_embed: int = 512
    k: int = 1
    bridge_kind: str = "amft"
    dtype: Any = jnp.bfloat16
    axis_name: Optional[str] = None
    use_pallas: bool = False
    per_sample_diff: bool = False

    def setup(self):
        self.rgb = UNetMemStream(self.rgb_out, self.embed_dim, self.n_embed,
                                 self.k, self.dtype, self.axis_name,
                                 self.use_pallas, self.per_sample_diff)
        self.op = UNetMemStream(self.op_out, self.embed_dim, self.n_embed,
                                self.k, self.dtype, self.axis_name,
                                self.use_pallas, self.per_sample_diff)
        self.bridge = _BRIDGES[self.bridge_kind](512, self.dtype)

    def __call__(self, rgb_x: jax.Array, op_x: jax.Array, train: bool = False):
        r1, r2, r3, r4 = self.rgb.encode(rgb_x, train)
        r4, rgb_diff, rgb_code = self.rgb.memory(r4, train)
        o1, o2, o3, o4 = self.op.encode(op_x, train)
        o4, op_diff, op_code = self.op.memory(o4, train)
        r4, o4 = self.bridge(r4, o4, train)
        rgb_pred = self.rgb.decode(r4, (r1, r2, r3), train)
        op_pred = self.op.decode(o4, (o1, o2, o3), train)
        return rgb_pred, op_pred, (rgb_diff, op_diff), (rgb_code, op_code)
