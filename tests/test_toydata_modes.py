"""Toydata anomaly-mode invariants (tools/make_toydata.py).

The three modes carve the anomaly along different axes:
  teleport   — position jumps (easy PSNR signal)
  direction  — drunk-walk heading at normal speed (hard PSNR signal)
  appearance — normal motion, novel glyph (memory/fea_comm channel probe;
               the toy analogue of ped2's bikes among pedestrians)

Invariants: the training split must be identical for direction and
appearance (same rng stream, no anomalies in training), appearance's
testing anomaly must change ONLY the anomalous frames' bytes, and the GT
json must be mode-independent.
"""

import hashlib
import json
import os

import numpy as np
import pytest

from ammcnet_aaai2021_tpu.tools.make_toydata import make_toydata


def _tree_hash(root: str, sub: str = "") -> str:
    h = hashlib.sha256()
    for dirpath, dirnames, filenames in sorted(os.walk(os.path.join(root, sub))):
        dirnames.sort()
        for f in sorted(filenames):
            p = os.path.join(dirpath, f)
            h.update(os.path.relpath(p, root).encode())
            with open(p, "rb") as fh:
                h.update(fh.read())
    return h.hexdigest()


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    base = tmp_path_factory.mktemp("toymodes")
    out = {}
    for mode in ("teleport", "direction", "appearance"):
        out[mode] = make_toydata(
            str(base / mode), frames_per_video=24, image_size=64,
            anomaly=mode)
    return out


def test_hard_flag_is_direction_alias(tmp_path):
    a = make_toydata(str(tmp_path / "a"), frames_per_video=12,
                     image_size=32, hard=True)
    b = make_toydata(str(tmp_path / "b"), frames_per_video=12,
                     image_size=32, anomaly="direction")
    assert _tree_hash(a) == _tree_hash(b)


def test_unknown_mode_raises(tmp_path):
    with pytest.raises(ValueError, match="unknown anomaly mode"):
        make_toydata(str(tmp_path / "x"), anomaly="nope")


def test_training_split_shared_by_direction_and_appearance(roots):
    assert (_tree_hash(roots["direction"], "training")
            == _tree_hash(roots["appearance"], "training"))


def test_appearance_changes_only_anomalous_test_frames(roots):
    import cv2

    span = (10, 16)  # default anomaly_span
    # cross-mode byte comparison is only valid for the FIRST testing
    # video: direction mode consumes extra rng draws (headings) during
    # video 01's anomalous span, so video 02's init parameters diverge
    for video in ("01",):
        for t in range(24):
            pd = os.path.join(roots["direction"], "testing", "frames",
                              video, f"{t:03d}.jpg")
            pa = os.path.join(roots["appearance"], "testing", "frames",
                              video, f"{t:03d}.jpg")
            same = open(pd, "rb").read() == open(pa, "rb").read()
            if t < span[0]:
                assert same, f"pre-anomaly frame {t} diverged"
            elif span[0] <= t < span[1]:
                assert not same, f"anomalous frame {t} identical"
                # the hollow glyph: anomalous frame has background-valued
                # pixels strictly inside the object's bounding box
                # (tolerances absorb JPEG ringing: object pixels are
                # >=128 by construction, background is 32)
                img = cv2.imread(pa).astype(np.int32)
                mask = (img > 96).any(axis=2)
                ys, xs = np.where(mask)
                inner = img[ys.min() + 4 : ys.max() - 3,
                            xs.min() + 4 : xs.max() - 3]
                assert inner.size and (inner < 96).all(axis=2).any(), \
                    f"frame {t} glyph not hollow"
            # post-span frames may differ between modes (direction's drunk
            # walk displaces the square permanently; appearance returns to
            # the normal trajectory) — no assertion


def test_appearance_motion_is_normal_through_anomaly(roots):
    """The appearance anomaly must NOT perturb the trajectory: the flow
    files (constant-velocity deltas) are identical to what the normal
    trajectory produces, i.e. every flow in the appearance testing split
    is bounce-consistent constant speed, never a teleport."""
    from ammcnet_aaai2021_tpu.data.flo import read_flo

    for video in ("01", "02"):
        odir = os.path.join(roots["appearance"], "testing", "flows", video)
        speeds = []
        for t in range(23):
            flow = read_flo(os.path.join(odir, f"{t:03d}.flo"))
            speeds.append(float(np.hypot(flow[0, 0, 0], flow[0, 0, 1])))
        speeds = np.asarray(speeds)
        # constant speed except bounce frames (sign flip keeps magnitude)
        # and the wrap-free bounce keeps |v| constant too
        assert speeds.max() < 4.0, "teleport-scale motion leaked in"
        assert speeds.std() < 1.0, "speed not approximately constant"


def test_gt_json_identical_across_modes(roots):
    gts = []
    for mode in ("teleport", "direction", "appearance"):
        with open(os.path.join(roots[mode], "toydata.json")) as fh:
            gts.append(json.load(fh))
    assert gts[0] == gts[1] == gts[2]
