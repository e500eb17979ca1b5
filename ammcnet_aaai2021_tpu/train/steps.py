"""Jitted GAN train steps (stage 1 single-stream, stage 2 two-stream).

Rebuild of the reference training loops (``Code/run_helper/train_helper.py``:
``train_from_multi_pretain`` :217-427 for stage 2; ``train_base`` +
``inference_v3/v4`` closures :1323-1837 for stage 1), restructured as ONE
jitted step per recipe:

* a single generator forward shared by the G loss and (detached) the D loss
  — the torch version runs D twice + G once per step; same math, one less
  D forward here because d_gen for the G loss is computed against the
  pre-update D exactly like the reference (:318-339);
* FlowNet teacher outputs are ``stop_gradient``'d — faithful to
  ``.detach()`` at train_helper.py:315-316, which makes the flow term purely
  observational in the released trainer (no gradient to G);  the reference's
  "last input frame" for flow pairs is actually the *target* frame
  (rgb[:, -1] at :299, despite the variable name) — reproduced;
* BatchNorm batch-stats and EMA codebook updates happen inside the same step
  (mutable collections threaded through :class:`AMMCTrainState`);
* under pjit with a batch sharded over the mesh's ``data`` axis, XLA inserts
  the gradient all-reduces; nothing NCCL-like appears in user code.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..configs import LossConfig
from ..losses.primitives import discriminate_loss
from ..losses.zoo import LOSS_TAGS
from .state import AMMCTrainState

MUTABLE = ("batch_stats", "codebook")


def _to_model_range(x):
    """Accept clips in any of the batch layouts the data layer emits:

    * pre-normalized (b, h, w, t*c) float — the parity path;
    * raw uint8 — the fast-transfer path (3x fewer PCIe bytes), with the
      identical (x/255 - .5)/.5 normalization fused into the step;
    * frame-packed (b, t, h, w, c) — hosts emit contiguous per-frame copies
      (the strided channel interleave cost ~2.5 ms/clip on the host) and the
      interleave happens here as an XLA transpose, effectively free on TPU.
    """
    if x.dtype == jnp.uint8:
        x = (x.astype(jnp.float32) / 255.0 - 0.5) / 0.5
    elif x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    if x.ndim == 5:  # (b, t, h, w, c) -> (b, h, w, t*c)
        b, t, h, w, c = x.shape
        x = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b, h, w, t * c)
    return x


def _flow_pair(flownet, flow_vars, last_frame, frame):
    """FlowNet2-SD on a ([-1,1] range) frame pair, reference scaling
    (train_helper.py:309-316): to [0,255], net, /255, detach."""
    pair = jnp.stack([(last_frame * 0.5 + 0.5) * 255.0,
                      (frame * 0.5 + 0.5) * 255.0], axis=-1)
    flow = flownet.apply(flow_vars, pair) / 255.0
    return jax.lax.stop_gradient(flow)


def make_twostream_train_step(
    generator,
    discriminator,
    flownet,
    loss_cfg: LossConfig,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    rgb_channels: int = 3,
    op_channels: int = 2,
    remat: bool = False,
    freeze_codebook: bool = False,
) -> Callable:
    """Stage-2 step: joint two-stream training with the twostream(_vq) loss.

    ``remat=True`` rematerializes the generator forward in the backward pass
    (jax.checkpoint): trades ~1 extra forward of FLOPs for not holding the
    UNet activations of both streams in HBM — enables much larger per-chip
    batches at 256x256.

    ``freeze_codebook=True`` discards the EMA codebook update each step, so
    the memory stays pinned to the grafted stage-1 codebook while encoder/
    decoder keep training (the commit gradient still pulls encoder features
    toward the frozen codes).  Measured outcome (PERF.md round 4 2x2
    ablation on appearance toydata): this flag ALONE does NOT preserve the
    memory channel's anomaly signal — precisely because the commit gradient
    keeps adapting the encoder onto the frozen codes, fea-only AUC collapses
    0.70 -> 0.36 -> 0.25 over 200/400/2000 steps, statistically the same
    decay as with a live EMA.  Preserving the channel requires freezing the
    encoder too (``fix_branches``); the two flags together pin the memory
    path up to BatchNorm running stats, which stay live here exactly as in
    the reference's ``requires_grad``-only freeze (``vqvae.py:634-643``) —
    measured fea-record drift ~1e-4 across a 2000-step finetune, and a
    wash (<=0.009 AUC) vs ``fix_branches`` alone (PERF.md session-2
    rerun).  The reference has no EMA control (its buffers
    always update, ``unet.py:330-338``) — opt-in extension, not a parity
    deviation.
    """
    g_loss_fn = LOSS_TAGS[loss_cfg.loss_tag]

    def gen_apply(variables, rgb_input, op_input):
        return generator.apply(variables, rgb_input, op_input, True,
                               mutable=list(MUTABLE))

    if remat:
        gen_apply = jax.checkpoint(gen_apply)

    def train_step(state: AMMCTrainState, batch: Dict, flow_vars
                   ) -> Tuple[AMMCTrainState, Dict]:
        rgb = _to_model_range(batch["rgb"])  # (b, h, w, t*c) incl target
        op = _to_model_range(batch["op"])
        rgb_input, rgb_target = rgb[..., :-rgb_channels], rgb[..., -rgb_channels:]
        op_input, op_target = op[..., :-op_channels], op[..., -op_channels:]

        def g_loss(g_params):
            variables = {"params": g_params, **state.g_state}
            (rgb_pred, op_pred, diffs, _), new_state = gen_apply(
                variables, rgb_input, op_input)
            flow_pred = _flow_pair(flownet, flow_vars, rgb_target, rgb_pred)
            flow_gt = _flow_pair(flownet, flow_vars, rgb_target, rgb_target)
            d_gen = discriminator.apply({"params": state.d_params}, rgb_pred)
            loss, comps = g_loss_fn({
                "rgb_pred": rgb_pred, "rgb_target": rgb_target,
                "op_pred": op_pred, "op_target": op_target,
                "d_gen": d_gen, "flow_pred": flow_pred, "flow_gt": flow_gt,
                "latent_diff": diffs,
            }, loss_cfg)
            return loss, (new_state, rgb_pred, comps)

        (g_l, (new_g_state, rgb_pred, comps)), g_grads = jax.value_and_grad(
            g_loss, has_aux=True)(state.g_params)
        if freeze_codebook and "codebook" in new_g_state:
            new_g_state = dict(new_g_state)
            new_g_state["codebook"] = state.g_state["codebook"]

        def d_loss(d_params):
            d_real = discriminator.apply({"params": d_params}, rgb_target)
            d_fake = discriminator.apply(
                {"params": d_params}, jax.lax.stop_gradient(rgb_pred))
            return discriminate_loss(d_real, d_fake)

        d_l, d_grads = jax.value_and_grad(d_loss)(state.d_params)

        d_updates, d_opt_state = d_tx.update(d_grads, state.d_opt_state,
                                             state.d_params)
        g_updates, g_opt_state = g_tx.update(g_grads, state.g_opt_state,
                                             state.g_params)
        metrics = {"g_loss": g_l, "d_loss": d_l, **comps}
        return AMMCTrainState(
            step=state.step + 1,
            g_params=optax.apply_updates(state.g_params, g_updates),
            g_state=new_g_state,
            g_opt_state=g_opt_state,
            d_params=optax.apply_updates(state.d_params, d_updates),
            d_opt_state=d_opt_state,
        ), metrics

    return train_step


def make_single_stream_train_step(
    generator,
    discriminator,
    flownet,
    loss_cfg: LossConfig,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    data_type: str = "rgb",
    channels: Optional[int] = None,
    freeze_codebook: bool = False,
) -> Callable:
    """Stage-1 step (reference inference_v1..v4 closures, train_helper.py:
    1408-1827): one modality; the rgb recipes use FlowNet + GDL, the op
    recipes only intensity + adversarial (+ commit for the _vq tags).
    ``freeze_codebook`` as in :func:`make_twostream_train_step` (meaningful
    when finetuning FROM a checkpoint; a frozen random-init codebook is a
    fixed random projection)."""
    g_loss_fn = LOSS_TAGS[loss_cfg.loss_tag]
    c = channels if channels is not None else (3 if data_type == "rgb" else 2)
    uses_flow = "flow" in loss_cfg.loss_tag

    def train_step(state: AMMCTrainState, batch: jax.Array, flow_vars
                   ) -> Tuple[AMMCTrainState, Dict]:
        clip = _to_model_range(batch)  # (b, h, w, t*c)
        x_input, x_target = clip[..., :-c], clip[..., -c:]

        def g_loss(g_params):
            variables = {"params": g_params, **state.g_state}
            (pred, diff, _), new_state = generator.apply(
                variables, x_input, True, mutable=list(MUTABLE))
            d_gen = discriminator.apply({"params": state.d_params}, pred)
            loss_batch = {
                "rgb_pred": pred, "rgb_target": x_target,
                "op_pred": pred, "op_target": x_target,
                "d_gen": d_gen, "latent_diff": diff,
            }
            if uses_flow:
                loss_batch["flow_pred"] = _flow_pair(
                    flownet, flow_vars, x_target, pred)
                loss_batch["flow_gt"] = _flow_pair(
                    flownet, flow_vars, x_target, x_target)
            loss, comps = g_loss_fn(loss_batch, loss_cfg)
            return loss, (new_state, pred, comps)

        (g_l, (new_g_state, pred, comps)), g_grads = jax.value_and_grad(
            g_loss, has_aux=True)(state.g_params)
        if freeze_codebook and "codebook" in new_g_state:
            new_g_state = dict(new_g_state)
            new_g_state["codebook"] = state.g_state["codebook"]

        def d_loss(d_params):
            d_real = discriminator.apply({"params": d_params}, x_target)
            d_fake = discriminator.apply(
                {"params": d_params}, jax.lax.stop_gradient(pred))
            return discriminate_loss(d_real, d_fake)

        d_l, d_grads = jax.value_and_grad(d_loss)(state.d_params)
        d_updates, d_opt_state = d_tx.update(d_grads, state.d_opt_state,
                                             state.d_params)
        g_updates, g_opt_state = g_tx.update(g_grads, state.g_opt_state,
                                             state.g_params)
        return AMMCTrainState(
            step=state.step + 1,
            g_params=optax.apply_updates(state.g_params, g_updates),
            g_state=new_g_state,
            g_opt_state=g_opt_state,
            d_params=optax.apply_updates(state.d_params, d_updates),
            d_opt_state=d_opt_state,
        ), {"g_loss": g_l, "d_loss": d_l, **comps}

    return train_step
