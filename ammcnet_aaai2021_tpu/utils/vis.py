"""Flow visualization: Middlebury color-wheel rendering.

Rebuild of ``Code/utils/flowlib.py:249-341,489-583`` (flow_to_image /
batch_flow_to_image / compute_color / make_color_wheel), vectorized in NumPy
(the reference loops per-pixel per color channel).  Used for training-summary
image grids of predicted vs ground-truth flow (train_helper.py:388-411 via
utils.get_vis_tensor).
"""

from __future__ import annotations

import numpy as np

UNKNOWN_FLOW_THRESH = 1e7


def make_color_wheel() -> np.ndarray:
    """Standard 55-entry Middlebury color wheel (flowlib.py:533-583)."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[0:RY, 0] = 255
    wheel[0:RY, 1] = np.floor(255 * np.arange(RY) / RY)
    col += RY
    wheel[col:col + YG, 0] = 255 - np.floor(255 * np.arange(YG) / YG)
    wheel[col:col + YG, 1] = 255
    col += YG
    wheel[col:col + GC, 1] = 255
    wheel[col:col + GC, 2] = np.floor(255 * np.arange(GC) / GC)
    col += GC
    wheel[col:col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    wheel[col:col + CB, 2] = 255
    col += CB
    wheel[col:col + BM, 2] = 255
    wheel[col:col + BM, 0] = np.floor(255 * np.arange(BM) / BM)
    col += BM
    wheel[col:col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    wheel[col:col + MR, 0] = 255
    return wheel


_WHEEL = make_color_wheel()


def compute_color(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """(h, w) u/v -> (h, w, 3) uint8 (flowlib.py:489-530), vectorized."""
    nan_idx = np.isnan(u) | np.isnan(v)
    u = np.where(nan_idx, 0.0, u)
    v = np.where(nan_idx, 0.0, v)
    ncols = _WHEEL.shape[0]
    rad = np.sqrt(u ** 2 + v ** 2)
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1.0) / 2.0 * (ncols - 1) + 1.0
    k0 = np.floor(fk).astype(int)
    k1 = np.where(k0 + 1 == ncols + 1, 1, k0 + 1)
    f = fk - k0
    img = np.zeros(u.shape + (3,), np.uint8)
    for i in range(3):
        col0 = _WHEEL[k0 - 1, i] / 255.0
        col1 = _WHEEL[k1 - 1, i] / 255.0
        col = (1 - f) * col0 + f * col1
        in_range = rad <= 1
        col = np.where(in_range, 1 - rad * (1 - col), col * 0.75)
        img[..., i] = np.floor(255.0 * col * (~nan_idx)).astype(np.uint8)
    return img


def flow_to_image(flow: np.ndarray) -> np.ndarray:
    """(h, w, 2) -> (h, w, 3) uint8 (flowlib.py:249-288)."""
    u = flow[..., 0].astype(np.float64).copy()
    v = flow[..., 1].astype(np.float64).copy()
    unknown = (np.abs(u) > UNKNOWN_FLOW_THRESH) | (np.abs(v) > UNKNOWN_FLOW_THRESH)
    u[unknown] = 0.0
    v[unknown] = 0.0
    rad = np.sqrt(u ** 2 + v ** 2)
    maxrad = max(-1.0, float(rad.max()))
    eps = np.finfo(float).eps
    u = u / (maxrad + eps)
    v = v / (maxrad + eps)
    img = compute_color(u, v)
    img[unknown] = 0
    return img


def batch_flow_to_image(flows: np.ndarray) -> np.ndarray:
    """(b, h, w, 2) -> (b, h, w, 3) uint8 (flowlib.py:291-341)."""
    return np.stack([flow_to_image(f) for f in flows])
