"""Generate per-video normalized-score pins from the released golden pickles.

Avenue's and ShanghaiTech's headline AUCs (0.866 / 0.737, README.md:54,56)
cannot be asserted offline — their public ground-truth annotation files are
not in this environment and writing annotations from memory would fabricate
the test.  What CAN be asserted offline is everything up to the GT join:
per-video min-max normalization, global normalization, fusion, smoothing.
This tool pins that pipeline per video: for each dataset it records each
video's frame count and the mean of its fused+smoothed scores (the exact
values `img_pred_fea_comm_single_auc` would hand to roc_curve,
eval_metric.py:405-427), so any regression in record handling or
normalization order is localized to the video that moved.

Run from the repo root (reads the reference's released pickles):

    python -m ammcnet_aaai2021_tpu.tools.gen_eval_pins \
        > tests/fixtures/golden_pervideo_pins.json
"""

from __future__ import annotations

import json
import pickle
import sys

import numpy as np

GOLDEN_ROOT = ("/root/reference/Code/ammcnet_os/model_result_save/{d}/"
               "img_pred_fea_comm_rgb_auc/save_pickle/{d}")
DATASETS = ("ped2", "avenue", "shanghaitech")


def per_video_pins(records: dict, lam: tuple) -> dict:
    from ..configs import DECIDABLE_IDX
    from ..eval.scoring import fuse_and_smooth, normalize_records

    img = normalize_records(records["rgb_img_pred_records"], DECIDABLE_IDX)
    fea = normalize_records(records["rgb_fea_comm_records"], DECIDABLE_IDX)
    fused = fuse_and_smooth(img, fea, lam[0], lam[1])
    lengths = [len(a) - DECIDABLE_IDX
               for a in records["rgb_img_pred_records"]]
    assert sum(lengths) == len(fused)
    out, start = [], 0
    for n in lengths:
        seg = fused[start:start + n]
        out.append({"frames": int(n),
                    "mean": round(float(np.mean(seg)), 12)})
        start += n
    return {"videos": out}


def main() -> None:
    from ..configs import FUSION_LAMBDAS

    pins = {}
    for d in DATASETS:
        with open(GOLDEN_ROOT.format(d=d), "rb") as fh:
            records = pickle.load(fh)
        pins[d] = per_video_pins(records, FUSION_LAMBDAS[d])
    json.dump(pins, sys.stdout, indent=1)
    sys.stdout.write("\n")


if __name__ == "__main__":
    main()
