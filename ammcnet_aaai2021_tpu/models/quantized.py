"""int8 two-stream inference forward (the PERF.md int8 lever, built).

``tools/dtype_bench`` measured int8 convs at ~2x bf16 on every UNet level
of the released geometry (up to 373.7 TOP/s = 95% of the v5e's int8 peak),
so unlike the folded-stream lever the dtype lever survives this model's
MXU underfill.  This module executes the released two-stream generator's
inference forward (reference ``Code/models/unet.py:967-1007``) with every
conv and transpose-conv on the int8 MXU path:

* **BatchNorm folding**: at inference BN is a per-channel affine over
  running statistics, so each ``conv(no bias) -> BN`` pair folds into one
  biased conv: ``W'[..,c] = W[..,c] * g[c]/sqrt(v[c]+eps)``,
  ``b'[c] = beta[c] - g[c]*mu[c]/sqrt(v[c]+eps)`` — exact, done once at
  weight-prep time (:func:`quantize_twostream_variables`).
* **Per-output-channel symmetric weight quant**: ``scale_w[c] =
  max|W'[..,c]| / 127``, int8 weights.
* **Dynamic per-tensor activation quant**: ``scale_x = max|x| / 127``
  computed on device per conv input — no calibration set, no baked
  activation ranges; robust to distribution shift between datasets.
* int32 accumulation (``preferred_element_type``), dequantize to bf16,
  bias + ReLU in bf16.

The memory lookup, its 1x1 codec convs, and the final tanh stay on the
float path (together <2% of window FLOPs, reference count
``unet.py:1268-1275``); the AMFT bridge's two 512-ch DoubleConvs are
quantized like every other conv pair.

Inference only — training keeps full bf16/f32 (the EMA codebook and GAN
losses are not quantization targets).  Wire into the fused scorer via
``make_multi_video_scorer(apply_fn=...)`` exactly like the folded variant;
``tools/device_bench --int8`` measures it, ``tests/test_quantized.py``
pins numerics (exact BN-fold, output agreement vs the float forward).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .unet_mem import _BRIDGES, UNetMemStream

_DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                 ("NHWC", "HWIO", "NHWC"))
_BN_EPS = 1e-5


def _quant_weight(w: jax.Array, out_axis: int) -> Dict[str, jax.Array]:
    """Symmetric per-output-channel int8 quantization of a conv kernel."""
    reduce_axes = tuple(i for i in range(w.ndim) if i != out_axis)
    amax = jnp.max(jnp.abs(w), axis=reduce_axes)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    shape = [1] * w.ndim
    shape[out_axis] = -1
    wq = jnp.clip(jnp.round(w / scale.reshape(shape)), -127, 127
                  ).astype(jnp.int8)
    return {"w": wq, "scale": scale.astype(jnp.float32)}


def _fold_bn(kernel: jax.Array, bn_params: Dict, bn_stats: Dict
             ) -> Tuple[jax.Array, jax.Array]:
    """Fold inference BatchNorm into the preceding (bias-free) conv."""
    g, b = bn_params["scale"], bn_params["bias"]
    mu, var = bn_stats["mean"], bn_stats["var"]
    f = g / jnp.sqrt(var + _BN_EPS)
    return kernel * f, b - mu * f


def _q_double_conv(params: Dict, stats: Dict) -> Dict:
    out = {}
    for i in range(2):
        k, bias = _fold_bn(params[f"conv{i}"]["kernel"],
                           params[f"bn{i}"], stats[f"bn{i}"])
        q = _quant_weight(k, out_axis=3)
        q["bias"] = bias.astype(jnp.float32)
        out[f"conv{i}"] = q
    return out


def quantize_twostream_variables(variables: Dict) -> Dict:
    """Prepare the int8 weight tree from a ``TwoStreamUNetMem`` variable
    tree (BN folded, weights int8 + per-channel scales).  The returned tree
    also carries the ORIGINAL per-stream variables (for the float memory
    block) under ``"mem"``."""
    params, stats = variables["params"], variables["batch_stats"]
    q: Dict = {"streams": {}, "bridge": {}, "mem": {}}
    for s in ("rgb", "op"):
        p, st = params[s], stats[s]
        sq: Dict = {"inc": _q_double_conv(p["inc"], st["inc"])}
        for lvl in ("down1", "down2", "down3"):
            sq[lvl] = _q_double_conv(p[lvl]["conv"], st[lvl]["conv"])
        for lvl in ("up1", "up2", "up3"):
            up = _quant_weight(p[lvl]["up"]["kernel"], out_axis=2)
            up["bias"] = p[lvl]["up"]["bias"].astype(jnp.float32)
            sq[lvl] = {"up": up,
                       "conv": _q_double_conv(p[lvl]["conv"],
                                              st[lvl]["conv"])}
        outc = _quant_weight(p["outc"]["kernel"], out_axis=3)
        outc["bias"] = p["outc"]["bias"].astype(jnp.float32)
        sq["outc"] = outc
        q["streams"][s] = sq
        # full original stream tree: the float memory block reads vq_down3
        q["mem"][s] = {col: tree[s] for col, tree in variables.items()
                       if s in tree}
    for side in ("O2F", "F2O"):
        q["bridge"][side] = _q_double_conv(
            params["bridge"][side],
            variables["batch_stats"]["bridge"][side])
    return q


def _quant_act(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    sx = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127
                  ).astype(jnp.int8)
    return xq, sx


def _qconv(x: jax.Array, q: Dict, relu: bool) -> jax.Array:
    xq, sx = _quant_act(x)
    acc = lax.conv_general_dilated(xq, q["w"], (1, 1), "SAME",
                                   dimension_numbers=_DN,
                                   preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * q["scale"]) + q["bias"]
    y = y.astype(jnp.bfloat16)
    return jax.nn.relu(y) if relu else y


def _qconv_transpose(x: jax.Array, q: Dict) -> jax.Array:
    xq, sx = _quant_act(x)
    acc = lax.conv_transpose(xq, q["w"], (2, 2), "SAME",
                             dimension_numbers=("NHWC", "HWIO", "NHWC"),
                             transpose_kernel=True,
                             preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * q["scale"]) + q["bias"]
    return y.astype(jnp.bfloat16)


def _q_double(x: jax.Array, q: Dict) -> jax.Array:
    x = _qconv(x, q["conv0"], relu=True)
    return _qconv(x, q["conv1"], relu=True)


def _q_down(x: jax.Array, q: Dict) -> jax.Array:
    b, h, w, c = x.shape
    x = jnp.max(x.reshape(b, h // 2, 2, w // 2, 2, c), axis=(2, 4))
    return _q_double(x, q)


def _q_up(x1: jax.Array, skip: jax.Array, q: Dict) -> jax.Array:
    x1 = _qconv_transpose(x1, q["up"])
    x = jnp.concatenate([skip, x1], axis=-1)
    return _q_double(x, q["conv"])


def make_quantized_forward(embed_dim: int = 64, n_embed: int = 256,
                           k: int = 2, bridge_kind: str = "amft",
                           per_sample_diff: bool = False,
                           use_pallas: bool = False):
    """Builds ``forward(qvars, rgb_x, op_x)`` returning the same
    ``(rgb_pred, op_pred, (rgb_diff, op_diff), None)`` contract as
    ``TwoStreamUNetMem.apply(..., train=False)`` with every conv int8.
    ``qvars`` comes from :func:`quantize_twostream_variables`.
    """
    stream = UNetMemStream(embed_dim=embed_dim, n_embed=n_embed, k=k,
                           dtype=jnp.bfloat16, use_pallas=use_pallas,
                           per_sample_diff=per_sample_diff)
    if bridge_kind != "amft":
        raise NotImplementedError(
            "quantized forward covers the released amft bridge; "
            f"got {bridge_kind!r}")

    def memory(mem_vars: Dict, z: jax.Array):
        return stream.apply(mem_vars, z, False,
                            method=UNetMemStream.memory)

    def stream_encode(sq: Dict, x: jax.Array):
        x1 = _q_double(x, sq["inc"])
        x2 = _q_down(x1, sq["down1"])
        x3 = _q_down(x2, sq["down2"])
        x4 = _q_down(x3, sq["down3"])
        return x1, x2, x3, x4

    def stream_decode(sq: Dict, x4: jax.Array, skips):
        x1, x2, x3 = skips
        y = _q_up(x4, x3, sq["up1"])
        y = _q_up(y, x2, sq["up2"])
        y = _q_up(y, x1, sq["up3"])
        y = _qconv(y, sq["outc"], relu=False)
        return jnp.tanh(y.astype(jnp.float32))

    def forward(qvars: Dict, rgb_x: jax.Array, op_x: jax.Array):
        sq_r, sq_o = qvars["streams"]["rgb"], qvars["streams"]["op"]
        r1, r2, r3, r4 = stream_encode(sq_r, rgb_x)
        o1, o2, o3, o4 = stream_encode(sq_o, op_x)
        r4m, rgb_diff, _ = memory(qvars["mem"]["rgb"], r4)
        o4m, op_diff, _ = memory(qvars["mem"]["op"], o4)
        # AMFT bridge (unet.py:956-964): x = zx + O2F(zy); y = zy + F2O(zx)
        r4b = r4m + _q_double(o4m, qvars["bridge"]["O2F"])
        o4b = o4m + _q_double(r4m, qvars["bridge"]["F2O"])
        rgb_pred = stream_decode(sq_r, r4b, (r1, r2, r3))
        op_pred = stream_decode(sq_o, o4b, (o1, o2, o3))
        return rgb_pred, op_pred, (rgb_diff, op_diff), None

    return forward
