"""Synthetic toy dataset generator.

The reference's eval layer has a 'toydata' hook (eval_metric.py:50-51,163-179:
json GT ``{video: {length, gt: [[s, e], ...]}}``) but no generator was
released.  This builds a complete miniature dataset in the reference's
directory layout so the full train/test path can be driven end-to-end with
no real surveillance data:

    <root>/toydata/{training,testing}/frames/<video>/NNN.jpg
    <root>/toydata/{training,testing}/flows/<video>/NNN.flo
    <root>/toydata/toydata.json

"Normal" motion is a square gliding at constant velocity; anomalous spans
teleport the square randomly (large unpredictable motion), so a future-frame
predictor trained on normal clips scores them poorly.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Tuple

import numpy as np

from ..data.flo import write_flo


def _draw_frame(size: int, x: float, y: float, sq: int,
                color: Tuple[int, int, int]) -> np.ndarray:
    img = np.full((size, size, 3), 32, np.uint8)
    xi, yi = int(x) % (size - sq), int(y) % (size - sq)
    img[yi : yi + sq, xi : xi + sq] = color
    return img


def make_toydata(
    root: str,
    num_train_videos: int = 2,
    num_test_videos: int = 2,
    frames_per_video: int = 24,
    image_size: int = 64,
    anomaly_span: Tuple[int, int] = (10, 16),
    seed: int = 7,
) -> str:
    """Writes the dataset; returns the toydata root dir."""
    import cv2

    rng = np.random.default_rng(seed)
    base = os.path.join(root, "toydata")
    gt_json: Dict[str, Dict] = {}

    for split, num_videos in (("training", num_train_videos),
                              ("testing", num_test_videos)):
        for v in range(num_videos):
            name = f"{v + 1:02d}"
            fdir = os.path.join(base, split, "frames", name)
            odir = os.path.join(base, split, "flows", name)
            os.makedirs(fdir, exist_ok=True)
            os.makedirs(odir, exist_ok=True)
            sq = 12 if image_size >= 64 else 4
            x, y = rng.uniform(0, image_size - sq, 2)
            vx, vy = rng.uniform(1.0, 2.5, 2)
            color = tuple(int(c) for c in rng.integers(128, 256, 3))
            positions: List[Tuple[float, float]] = []
            for t in range(frames_per_video):
                anomalous = (split == "testing"
                             and anomaly_span[0] <= t < anomaly_span[1])
                if anomalous:
                    x, y = rng.uniform(0, image_size - sq, 2)
                else:
                    x, y = x + vx, y + vy
                positions.append((x % (image_size - sq), y % (image_size - sq)))
                frame = _draw_frame(image_size, x, y, sq, color)
                cv2.imwrite(os.path.join(fdir, f"{t:03d}.jpg"),
                            cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
            # flows between consecutive frames: constant (vx, vy) on normal
            # steps, the teleport delta on anomalous ones
            for t in range(frames_per_video - 1):
                dx = positions[t + 1][0] - positions[t][0]
                dy = positions[t + 1][1] - positions[t][1]
                flow = np.zeros((image_size, image_size, 2), np.float32)
                flow[..., 0] = dx
                flow[..., 1] = dy
                write_flo(os.path.join(odir, f"{t:03d}.flo"), flow)
            if split == "testing":
                gt_json[name] = {
                    "length": frames_per_video,
                    "gt": [[anomaly_span[0], anomaly_span[1] - 1]],
                }

    with open(os.path.join(base, "toydata.json"), "w") as fh:
        json.dump(gt_json, fh, indent=2)
    return base


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", required=True)
    p.add_argument("--frames", type=int, default=24)
    p.add_argument("--size", type=int, default=64)
    args = p.parse_args()
    out = make_toydata(args.root, frames_per_video=args.frames,
                       image_size=args.size)
    print(f"toydata written to {out}")
