"""Loss primitives.

Rebuild of ``Code/models/losses/losses_utils.py``: flow L1, intensity
(l_num 1/2), gradient-difference (GDL), LSGAN adversarial/discriminator
pairs.  All functions take NHWC float arrays and return float32 scalars; all
compute in float32 regardless of input dtype so bfloat16 activations don't
erode loss precision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _f32(x: jax.Array) -> jax.Array:
    return x.astype(jnp.float32)


def flow_loss(gen_flows: jax.Array, gt_flows: jax.Array) -> jax.Array:
    """Mean absolute error between flows (losses_utils.py:10-15)."""
    return jnp.mean(jnp.abs(_f32(gen_flows) - _f32(gt_flows)))


def intensity_loss(gen: jax.Array, gt: jax.Array, l_num: int = 2) -> jax.Array:
    """l_num=1: mean |x-y|;  l_num=2: mean over pixels of the channel-axis
    L2 norm — reference L2 is ``torch.norm(x-y, p=2, dim=1).mean()``
    (losses_utils.py:117-129), i.e. NOT plain MSE.
    """
    d = _f32(gen) - _f32(gt)
    if l_num == 1:
        return jnp.mean(jnp.abs(d))
    if l_num == 2:
        return jnp.mean(jnp.sqrt(jnp.sum(jnp.square(d), axis=-1) + 1e-20))
    raise ValueError(f"l_num must be 1 or 2, got {l_num}")


def gradient_loss(gen: jax.Array, gt: jax.Array, alpha: int = 1) -> jax.Array:
    """Gradient-difference loss (losses_utils.py:30-61).

    The reference convolves with a channel-summing [-1, 1] filter after
    left/top zero-padding: the conv weight (1, C, 1, 2) sums the finite
    difference across channels.  Expressed here as a channel-sum followed by
    a padded difference (identical math, no conv needed).
    """
    def channel_sum_grads(x):
        s = jnp.sum(_f32(x), axis=-1)  # (b, h, w)
        # pad left / top with zero then difference == reference's F.pad+conv
        dx = s - jnp.pad(s, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
        dy = s - jnp.pad(s, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
        return dx, dy

    gen_dx, gen_dy = channel_sum_grads(gen)
    gt_dx, gt_dy = channel_sum_grads(gt)
    grad_diff_x = jnp.abs(gt_dx - gen_dx)
    grad_diff_y = jnp.abs(gt_dy - gen_dy)
    return jnp.mean(grad_diff_x ** alpha + grad_diff_y ** alpha)


def adversarial_loss(fake_outputs: jax.Array) -> jax.Array:
    """Generator-side LSGAN term: mean((D(G)-1)^2 / 2) (losses_utils.py:100-104)."""
    return jnp.mean(jnp.square(_f32(fake_outputs) - 1.0) / 2.0)


def discriminate_loss(real_outputs: jax.Array,
                      fake_outputs: jax.Array) -> jax.Array:
    """Discriminator-side LSGAN: mean((D(x)-1)^2/2) + mean(D(G)^2/2)
    (losses_utils.py:106-110)."""
    return (jnp.mean(jnp.square(_f32(real_outputs) - 1.0) / 2.0)
            + jnp.mean(jnp.square(_f32(fake_outputs)) / 2.0))
