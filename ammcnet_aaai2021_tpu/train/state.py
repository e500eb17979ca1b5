"""Training state: one pytree carrying everything a step mutates.

The torch reference scatters mutable state across module buffers (BatchNorm
running stats, EMA codebook), two optimizers, and a global step counter; here
it is one explicit :class:`AMMCTrainState` pytree threaded through the jitted
step — which is what makes the step pjit-shardable and orbax-checkpointable
as a unit.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class AMMCTrainState:
    step: jax.Array  # int32 scalar
    g_params: Any
    g_state: Dict[str, Any]  # {'batch_stats': ..., 'codebook': ...}
    g_opt_state: optax.OptState
    d_params: Optional[Any] = None
    d_opt_state: Optional[optax.OptState] = None


def create_train_state(generator, discriminator, g_tx, d_tx, rng,
                       rgb_shape, op_shape=None,
                       d_input_channels: int = 3) -> AMMCTrainState:
    """Initialize all params/state.  ``op_shape=None`` -> single-stream."""
    inputs = [jnp.zeros(rgb_shape)]
    if op_shape is not None:
        inputs.append(jnp.zeros(op_shape))
    g_vars = generator.init({"params": rng}, *inputs, True)
    g_params = g_vars["params"]
    g_state = {k: v for k, v in g_vars.items() if k != "params"}
    d_params = d_opt_state = None
    if discriminator is not None:
        d_rng = jax.random.fold_in(rng, 1)
        d_shape = rgb_shape[:-1] + (d_input_channels,)
        d_params = discriminator.init({"params": d_rng},
                                      jnp.zeros(d_shape))["params"]
        d_opt_state = d_tx.init(d_params)
    return AMMCTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        g_state=g_state,
        g_opt_state=g_tx.init(g_params),
        d_params=d_params,
        d_opt_state=d_opt_state,
    )


def graft_branches(twostream_params, rgb_params, op_params):
    """Stage-1 -> stage-2 branch grafting.

    Rebuild of ``loader_rgb_op_branch`` (utils.py:236-263): pretrained
    single-stream parameter trees are mounted under the two-stream model's
    ``rgb`` / ``op`` subtrees; the bridge keeps its fresh initialization.
    Works on any variable collection (params, batch_stats, codebook).
    """
    out = dict(twostream_params)
    out["rgb"] = rgb_params
    out["op"] = op_params
    return out
