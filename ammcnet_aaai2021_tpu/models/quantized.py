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
* **Activation quant, two modes**: dynamic per-tensor (``scale_x =
  max|x| / 127`` computed on device per conv input — no calibration set,
  robust, but the max is an unfusable reduction pass that costs the whole
  int8 win: 688 vs 744.9 bf16 windows/s on chip) and CALIBRATED static
  scales (:func:`calibrate_act_scales` — the round/clip fuses into the
  producer; measured 945 windows/s = 1.27x bf16, PERF.md).
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

from typing import Any, Dict, Optional, Tuple

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


def _quant_in(x: jax.Array, q: Dict, record: Optional[Dict], site: str
              ) -> Tuple[jax.Array, jax.Array]:
    """Quantize a conv input: static scale if the site is calibrated
    (``act_scale`` in the weight dict — no reduction pass, the round/clip
    fuses into the producer), else dynamic per-tensor.  ``record`` (eager
    calibration mode) accumulates the site's running max|x|."""
    if x.dtype == jnp.int8:
        # int8 residency: the producer conv already quantized to THIS
        # site's calibrated scale in its epilogue (see ``_qconv``'s
        # ``out_scale``) — the activation travelled HBM as 1 byte/elem
        # and no quantize pass runs here.
        assert record is None, "record pass cannot consume int8 inputs"
        return x, q["act_scale"]
    if record is not None:
        m = jnp.max(jnp.abs(x.astype(jnp.float32)))
        prev = record.get(site)
        record[site] = m if prev is None else jnp.maximum(prev, m)
    sx = q.get("act_scale")
    if sx is None:
        return _quant_act(x)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127
                  ).astype(jnp.int8)
    return xq, sx


def _qconv(x: jax.Array, q: Dict, relu: bool,
           record: Optional[Dict] = None, site: str = "",
           out_scale: Optional[jax.Array] = None) -> jax.Array:
    xq, sx = _quant_in(x, q, record, site)
    acc = lax.conv_general_dilated(xq, q["w"], (1, 1), "SAME",
                                   dimension_numbers=_DN,
                                   preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * q["scale"]) + q["bias"]
    y = y.astype(jnp.bfloat16)
    if out_scale is not None:
        # int8 residency: quantize to the CONSUMER conv's calibrated scale
        # right in this conv's epilogue, so the activation is stored/read
        # as int8 (half the HBM bytes of bf16) and the consumer skips its
        # quantize pass.  The bf16 cast above is kept so the int8 value
        # equals the non-resident path's next-site quantization
        # BIT-FOR-BIT (tests/test_quantized.py), and ReLU commutes with
        # the monotone round/clip for a symmetric positive scale:
        # relu(clip(round(y/s))) == clip(round(relu(y)/s)).
        q8 = jnp.clip(jnp.round(y.astype(jnp.float32) / out_scale),
                      -127, 127).astype(jnp.int8)
        return jnp.maximum(q8, jnp.int8(0)) if relu else q8
    return jax.nn.relu(y) if relu else y


def _qconv_transpose(x: jax.Array, q: Dict,
                     record: Optional[Dict] = None, site: str = ""
                     ) -> jax.Array:
    xq, sx = _quant_in(x, q, record, site)
    acc = lax.conv_transpose(xq, q["w"], (2, 2), "SAME",
                             dimension_numbers=("NHWC", "HWIO", "NHWC"),
                             transpose_kernel=True,
                             preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * q["scale"]) + q["bias"]
    return y.astype(jnp.bfloat16)


def _q_double(x: jax.Array, q: Dict,
              record: Optional[Dict] = None, site: str = "",
              resident: bool = True) -> jax.Array:
    # conv0 -> conv1 is the one producer/consumer pair with a single
    # consumer at every site, so it carries int8 residency whenever
    # conv1's scale is calibrated (never during a record pass).
    nxt = q["conv1"].get("act_scale") if (resident and record is None) \
        else None
    x = _qconv(x, q["conv0"], True, record, f"{site}/conv0", out_scale=nxt)
    return _qconv(x, q["conv1"], True, record, f"{site}/conv1")


def _q_down(x: jax.Array, q: Dict,
            record: Optional[Dict] = None, site: str = "",
            resident: bool = True) -> jax.Array:
    b, h, w, c = x.shape
    x = jnp.max(x.reshape(b, h // 2, 2, w // 2, 2, c), axis=(2, 4))
    return _q_double(x, q, record, site, resident)


def _q_up(x1: jax.Array, skip: jax.Array, q: Dict,
          record: Optional[Dict] = None, site: str = "",
          resident: bool = True) -> jax.Array:
    x1 = _qconv_transpose(x1, q["up"], record, f"{site}/up")
    x = jnp.concatenate([skip, x1], axis=-1)
    return _q_double(x, q["conv"], record, f"{site}/conv", resident)


def make_quantized_forward(embed_dim: int = 64, n_embed: int = 256,
                           k: int = 2, bridge_kind: str = "amft",
                           per_sample_diff: bool = False,
                           use_pallas: bool = False,
                           resident: bool = True):
    """Builds ``forward(qvars, rgb_x, op_x)`` returning the same
    ``(rgb_pred, op_pred, (rgb_diff, op_diff), None)`` contract as
    ``TwoStreamUNetMem.apply(..., train=False)`` with every conv int8.
    ``qvars`` comes from :func:`quantize_twostream_variables`.

    ``resident=True`` (default) keeps each DoubleConv's conv0->conv1
    activation in int8 end to end once scales are calibrated — bit-exact
    vs the non-resident path, half the HBM bytes on the widest tensors
    (``--no_resident`` in ``tools/device_bench`` A/Bs it on chip).  It is
    a no-op for uncalibrated (dynamic-scale) trees and record passes.
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

    def stream_encode(sq: Dict, x: jax.Array, rec, base: str):
        x1 = _q_double(x, sq["inc"], rec, f"{base}/inc", resident)
        x2 = _q_down(x1, sq["down1"], rec, f"{base}/down1", resident)
        x3 = _q_down(x2, sq["down2"], rec, f"{base}/down2", resident)
        x4 = _q_down(x3, sq["down3"], rec, f"{base}/down3", resident)
        return x1, x2, x3, x4

    def stream_decode(sq: Dict, x4: jax.Array, skips, rec, base: str):
        x1, x2, x3 = skips
        y = _q_up(x4, x3, sq["up1"], rec, f"{base}/up1", resident)
        y = _q_up(y, x2, sq["up2"], rec, f"{base}/up2", resident)
        y = _q_up(y, x1, sq["up3"], rec, f"{base}/up3", resident)
        y = _qconv(y, sq["outc"], False, rec, f"{base}/outc")
        return jnp.tanh(y.astype(jnp.float32))

    def forward(qvars: Dict, rgb_x: jax.Array, op_x: jax.Array,
                record: Optional[Dict] = None):
        sq_r, sq_o = qvars["streams"]["rgb"], qvars["streams"]["op"]
        r1, r2, r3, r4 = stream_encode(sq_r, rgb_x, record, "streams/rgb")
        o1, o2, o3, o4 = stream_encode(sq_o, op_x, record, "streams/op")
        r4m, rgb_diff, _ = memory(qvars["mem"]["rgb"], r4)
        o4m, op_diff, _ = memory(qvars["mem"]["op"], o4)
        # AMFT bridge (unet.py:956-964): x = zx + O2F(zy); y = zy + F2O(zx)
        r4b = r4m + _q_double(o4m, qvars["bridge"]["O2F"], record,
                              "bridge/O2F", resident)
        o4b = o4m + _q_double(r4m, qvars["bridge"]["F2O"], record,
                              "bridge/F2O", resident)
        rgb_pred = stream_decode(sq_r, r4b, (r1, r2, r3), record,
                                 "streams/rgb")
        op_pred = stream_decode(sq_o, o4b, (o1, o2, o3), record,
                                "streams/op")
        return rgb_pred, op_pred, (rgb_diff, op_diff), None

    return forward


def calibrate_act_scales(forward, qvars: Dict, batches,
                         headroom: float = 1.0) -> Dict:
    """Calibrate static activation scales: run the (dynamic) quantized
    forward over ``batches`` of ``(rgb_x, op_x)`` windows, record each conv
    input's running max|x|, and return a new qvars tree with ``act_scale``
    set at every conv site.  The record pass is JITTED and all 40 sites'
    maxima come back in ONE fetch per batch — an eager pass paid 40
    blocking device->host fetches per batch, seconds each over a degraded
    tunnel (PERF.md "tunnel-health methodology").

    Why: the dynamic path's per-call max|x| is a full reduction pass over
    every conv input that XLA cannot fuse into the conv — measured on chip
    it costs the entire int8 win (688 windows/s dynamic vs 945 static vs
    744.9 bf16, PERF.md).  With static scales the round/clip/cast fuses
    into the producer epilogue.  Out-of-range activations at serving time
    saturate at ±127 (standard symmetric-quant behavior); ``headroom``
    scales the calibrated maxima for extra margin.

    Calibration-set choice follows the reference's protocol of per-dataset
    models (no cross-dataset serving): a few hundred windows of the target
    dataset's training split.
    """
    def _record_pass(qv, rgb_x, op_x):
        rec: Dict[str, jax.Array] = {}
        forward(qv, rgb_x, op_x, record=rec)
        return rec

    rec_jit = jax.jit(_record_pass)
    record: Dict[str, float] = {}
    for rgb_x, op_x in batches:
        got = jax.device_get(rec_jit(qvars, jnp.asarray(rgb_x),
                                     jnp.asarray(op_x)))
        for site, m in got.items():
            record[site] = max(record.get(site, 0.0), float(m))

    def apply_scales(tree: Dict, base: str) -> Dict:
        out = {}
        for k, v in tree.items():
            path = f"{base}/{k}" if base else k
            if isinstance(v, dict):
                if path in record:  # a quantized conv's weight dict
                    # f32 arithmetic throughout: the dynamic path computes
                    # max(|x|,1e-12)/127 in f32 on device, and a float64
                    # round-trip here would differ by 1 ulp — enough to
                    # flip quantization boundaries (the exactness test)
                    import numpy as np

                    m = np.maximum(np.float32(record[path]),
                                   np.float32(1e-12))
                    s = np.float32(m * np.float32(headroom)
                                   ) / np.float32(127.0)
                    v = dict(v, act_scale=jnp.float32(s))
                else:
                    v = apply_scales(v, path)
            out[k] = v
        return out

    qcal = dict(qvars)
    qcal["streams"] = apply_scales(qvars["streams"], "streams")
    qcal["bridge"] = apply_scales(qvars["bridge"], "bridge")
    n_sites = len(record)
    if n_sites != 40:  # 18 per stream + 2 bridges x 2 convs
        raise RuntimeError(f"calibration recorded {n_sites} sites, "
                           "expected 40 — forward structure drifted")
    return qcal


def calibrated_int8_from_dataset(net_cfg, variables, data_dir: str,
                                 dataset_name: str, image_size: int,
                                 calib_batches: int = 4,
                                 calib_batch_size: int = 8):
    """One-stop int8 serving prep shared by ``run_test --int8`` and
    ``export_model --int8``: quantize the float variable tree, then
    calibrate activation scales on clips sampled from the dataset's
    TRAINING split (the reference's per-dataset-model protocol).

    Returns ``(apply_fn, qvars)`` — pass both to a scorer
    (``apply_fn=``/``variables=``) or to ``export_scorer``.
    """
    import os

    from ..data import get_dataset

    fwd = make_quantized_forward(
        embed_dim=net_cfg.embed_dim, n_embed=net_cfg.n_embed, k=net_cfg.k,
        per_sample_diff=True, use_pallas=net_cfg.use_pallas_memory)
    qvars = quantize_twostream_variables(variables)
    train_root = os.path.join(data_dir, dataset_name, "training")
    sampler = get_dataset("rgb_op", "training",
                          rgb_root=os.path.join(train_root, "frames"),
                          op_root=os.path.join(train_root, "flows"),
                          image_size=image_size)
    n_rgb_in, n_op_in = net_cfg.in_channel
    batches = []
    for _ in range(calib_batches):
        b = sampler.batch(calib_batch_size)
        batches.append((jnp.asarray(b["rgb"][..., :n_rgb_in]),
                        jnp.asarray(b["op"][..., :n_op_in])))
    return fwd, calibrate_act_scales(fwd, qvars, batches)
