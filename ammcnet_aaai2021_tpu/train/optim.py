"""Optimizer factory.

Rebuild of ``Code/models/optimizer/__init__.py:29-63``: Adam for G and Adam
for D, each under a MultiStepLR-equivalent schedule (gamma=0.5 at the
configured milestones), with optional requires_grad-style masking for the
fixed-branch finetune (reference filters params by requires_grad,
optimizer/__init__.py:40-42 — in optax that's a zero-update mask).
"""

from __future__ import annotations

from typing import Tuple

import optax

from ..configs import OptimConfig


def multistep_schedule(base_lr: float, milestones, gamma: float = 0.5):
    """torch MultiStepLR equivalent (stepped per iteration, like the
    reference's per-step scheduler.step())."""
    boundaries = {int(m): gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizers(cfg: OptimConfig,
                    g_mask=None) -> Tuple[optax.GradientTransformation,
                                          optax.GradientTransformation]:
    g_tx = optax.adam(multistep_schedule(cfg.lr_g, cfg.lr_milestones,
                                         cfg.lr_gamma))
    if g_mask is not None:
        # trainable subset only (reference fixed_rgb_op_branch finetune).
        # NOTE: optax.masked alone does NOT freeze the masked-out params —
        # it passes their raw gradients through as updates (i.e. gradient
        # ASCENT); the complementary set_to_zero is what freezes them.
        import jax

        inverse = jax.tree.map(lambda m: not m, g_mask)
        g_tx = optax.chain(
            optax.masked(g_tx, g_mask),
            optax.masked(optax.set_to_zero(), inverse),
        )
    d_tx = optax.adam(multistep_schedule(cfg.lr_d, cfg.lr_milestones,
                                         cfg.lr_gamma))
    return g_tx, d_tx
