"""Image/flow quality metrics, batched and jit-fusable.

Rebuilds ``Code/utils/utils.py:97-152`` (psnr_error / mse_error / ssim_error /
epe_error) and ``Code/utils/pytorch_ssim.py``.  Unlike the reference — which
computes PSNR one frame at a time in a Python loop with a GPU->host sync per
frame (test_helper.py:445-464, the single biggest throughput sin) — these are
vectorized over the batch axis and return per-frame vectors, so scoring fuses
into the same XLA program as the model forward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr_per_frame(gen: jax.Array, gt: jax.Array) -> jax.Array:
    """Per-frame PSNR on [-1, 1] images mapped to [0, 1] (utils.py:130-148).

    Args:
      gen, gt: (b, h, w, c) in [-1, 1].
    Returns:
      (b,) float32 PSNR values.
    """
    gen = (gen.astype(jnp.float32) + 1.0) / 2.0
    gt = (gt.astype(jnp.float32) + 1.0) / 2.0
    mse = jnp.mean(jnp.square(gt - gen), axis=(1, 2, 3))
    return 10.0 * jnp.log10(1.0 / mse)


def psnr_error(gen: jax.Array, gt: jax.Array) -> jax.Array:
    """Batch-mean PSNR (the reference's scalar psnr_error)."""
    return jnp.mean(psnr_per_frame(gen, gt))


def mse_per_frame(gen: jax.Array, gt: jax.Array) -> jax.Array:
    """Per-frame MSE x 256 (reference utils.py:97-111 scales by 16*16)."""
    d = gt.astype(jnp.float32) - gen.astype(jnp.float32)
    return jnp.mean(jnp.square(d), axis=(1, 2, 3)) * 256.0


def mse_error(gen: jax.Array, gt: jax.Array) -> jax.Array:
    """MSE x 256 (reference utils.py:97-111 scales by 16*16)."""
    return jnp.mean(jnp.square(gt.astype(jnp.float32) - gen.astype(jnp.float32))) * 256.0


def epe_per_frame(gen_flow: jax.Array, gt_flow: jax.Array) -> jax.Array:
    """Per-frame mean endpoint error over (b, h, w, 2) flows — the
    flow-native op-stream quality metric (reference utils.py:151-152
    vectorized over the batch axis)."""
    d = gt_flow.astype(jnp.float32) - gen_flow.astype(jnp.float32)
    return jnp.mean(jnp.sqrt(jnp.sum(jnp.square(d), axis=-1) + 1e-20),
                    axis=(1, 2))


def epe_error(gen_flow: jax.Array, gt_flow: jax.Array) -> jax.Array:
    """Mean endpoint error over (b, h, w, 2) flows (utils.py:151-152)."""
    return jnp.mean(epe_per_frame(gen_flow, gt_flow))


def _gaussian_window(size: int, sigma: float) -> jax.Array:
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(gen: jax.Array, gt: jax.Array, window_size: int = 11,
         sigma: float = 1.5) -> jax.Array:
    """Gaussian-window SSIM (reference pytorch_ssim.py), NHWC, per-channel
    depthwise convolution, mean over batch/space/channels."""
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    img1 = gen.astype(jnp.float32)
    img2 = gt.astype(jnp.float32)
    channels = img1.shape[-1]
    w = _gaussian_window(window_size, sigma)
    # Depthwise kernel: (kh, kw, 1, channels) with feature_group_count.
    kernel = jnp.tile(w[:, :, None, None], (1, 1, 1, channels))
    dn = jax.lax.conv_dimension_numbers(img1.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    pad = window_size // 2

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=dn, feature_group_count=channels)

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = filt(img1 * img1) - mu1_sq
    sigma2_sq = filt(img2 * img2) - mu2_sq
    sigma12 = filt(img1 * img2) - mu12
    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map)


def ssim_error(gen: jax.Array, gt: jax.Array) -> jax.Array:
    return ssim(gen, gt)


def ssim_per_frame(gen: jax.Array, gt: jax.Array, window_size: int = 11,
                   sigma: float = 1.5) -> jax.Array:
    """Per-frame SSIM (batched mean over each frame's map)."""
    per = jax.vmap(lambda a, b: ssim(a[None], b[None], window_size, sigma))
    return per(gen, gt)


# scoring-metric registry (reference loss_func_mapp, test_helper.py:397-401)
PER_FRAME_METRICS = {
    "psnr": psnr_per_frame,
    "mse": mse_per_frame,
    "ssim": ssim_per_frame,
}

# op-stream-only metrics: EPE is flow-native (2-channel displacement
# fields), so it is selectable only for the motion stream (run_test
# --op_metric epe); the rgb stream keeps the reference's psnr/mse/ssim map
OP_PER_FRAME_METRICS = {**PER_FRAME_METRICS, "epe": epe_per_frame}


def gray_diff(gen: jax.Array, gt: jax.Array) -> jax.Array:
    """Abs grayscale difference (reference diff_mask/bgr_gray path)."""
    weights = jnp.array([0.299, 0.587, 0.114], jnp.float32)
    g1 = jnp.tensordot(gen.astype(jnp.float32), weights, axes=[[-1], [0]])
    g2 = jnp.tensordot(gt.astype(jnp.float32), weights, axes=[[-1], [0]])
    return jnp.abs(g1 - g2)
