"""File-tree clip datasets: frame-folder scanning, clip assembly, two-stream
pairing.

Rebuild of ``Code/dataset/two_stream_dataset.py`` (clip_Train_DS /
TwoStream_Train_DS / test_dataset) without torch DataLoader: plain-Python
iterators producing NHWC numpy batches, wrapped by the prefetching device
feeder in :mod:`ammcnet_aaai2021_tpu.data.pipeline`.

Preprocessing parity (two_stream_dataset.py:72-98):
  RGB: decode (BGR) -> BGR2RGB -> cv2.resize to 256x256 (uint8, INTER_LINEAR)
       -> float/255 -> (x-0.5)/0.5 into [-1, 1]
  Flow: read .flo -> cv2.resize -> normalize.  The reference overwrites the
       v channel (ch0 = u/h, then ch1 = ch0/w = u/(h*w)) — reproduced behind
       ``reproduce_flow_channel_bug`` (checkpoint parity); the fixed loader
       uses (u/w, v/h).

Two-stream training: the reference draws *independent* random (video, offset)
for rgb and op (two_stream_dataset.py:466-470), so streams are not frame-
aligned; ``aligned=True`` (our default) samples once and slices both.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .flo import read_flo

_RGB_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff")
_FLO_EXTS = (".flo",)
_NPY_EXTS = (".npy",)


def _decode_rgb(path: str, size: Tuple[int, int]) -> np.ndarray:
    """uint8 RGB (h, w, 3) resized; cv2 for parity with the reference."""
    if path.endswith(".npy"):
        img = np.load(path)
    else:
        import cv2

        img = cv2.imread(path)  # BGR uint8 (turbojpeg-equivalent decode)
        if img is None:
            raise FileNotFoundError(path)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if img.shape[:2] != size:
        import cv2

        img = cv2.resize(img, (size[1], size[0]))
    return img


def rgb_to_tensor(img: np.ndarray) -> np.ndarray:
    """uint8 -> [-1, 1] float32 (ToTensor + Normalize(.5,.5))."""
    return (img.astype(np.float32) / 255.0 - 0.5) / 0.5


def load_flow(path: str, size: Tuple[int, int],
              reproduce_bug: bool = True) -> np.ndarray:
    """(h, w, 2) float32 normalized flow field."""
    if path.endswith(".npy"):
        flow = np.load(path).astype(np.float32)
    else:
        flow = read_flo(path)
    if flow.shape[:2] != size:
        import cv2

        flow = cv2.resize(flow, (size[1], size[0]))
    h, w = size
    out = np.empty_like(flow)
    if reproduce_bug:
        # two_stream_dataset.py:94-95 — ch0 = u/h, ch1 = ch0/w = u/(h*w).
        out[:, :, 0] = flow[:, :, 0] / h
        out[:, :, 1] = out[:, :, 0] / w
    else:
        out[:, :, 0] = flow[:, :, 0] / w
        out[:, :, 1] = flow[:, :, 1] / h
    return out


@dataclass
class VideoIndex:
    """Scan of one frames-root: videos[name] = sorted absolute frame paths.

    Mirrors the reference's ``videos[sub]['frame'/'length']`` dict
    (two_stream_dataset.py setup loops).
    """

    root: str
    exts: Sequence[str] = _RGB_EXTS + _FLO_EXTS + _NPY_EXTS
    videos: Dict[str, List[str]] = field(default_factory=dict)

    def __post_init__(self):
        for sub in sorted(os.listdir(self.root)):
            folder = os.path.join(self.root, sub)
            if not os.path.isdir(folder):
                continue
            frames = sorted(
                os.path.join(folder, f) for f in os.listdir(folder)
                if f.lower().endswith(tuple(self.exts))
            )
            if frames:
                self.videos[sub] = frames

    @property
    def names(self) -> List[str]:
        return sorted(self.videos)

    def length(self, name: str) -> int:
        return len(self.videos[name])


class ClipLoader:
    """Assembles channel-stacked NHWC clips from frame paths."""

    def __init__(self, data_type: str, image_size: int = 256,
                 reproduce_flow_bug: bool = True):
        assert data_type in ("rgb", "op")
        self.data_type = data_type
        self.size = (image_size, image_size)
        self.reproduce_flow_bug = reproduce_flow_bug

    def load_clip(self, paths: Sequence[str]) -> np.ndarray:
        """paths (t,) -> (h, w, t*c) float32."""
        if self.data_type == "rgb":
            frames = [rgb_to_tensor(_decode_rgb(p, self.size)) for p in paths]
        else:
            frames = [load_flow(p, self.size, self.reproduce_flow_bug)
                      for p in paths]
        return np.concatenate(frames, axis=-1)


class TestClipDataset:
    """Sequential sliding-window clips over one sub-video
    (reference test_dataset, two_stream_dataset.py:491-537):
    ``len == frames - clip_length + 1``; clip i covers frames [i, i+t)."""

    def __init__(self, frame_paths: Sequence[str], clip_length: int,
                 loader: ClipLoader):
        self.paths = list(frame_paths)
        self.clip_length = clip_length
        self.loader = loader

    def __len__(self) -> int:
        return max(0, len(self.paths) - self.clip_length + 1)

    def __getitem__(self, idx: int) -> np.ndarray:
        return self.loader.load_clip(self.paths[idx: idx + self.clip_length])

    def batches(self, batch_size: int) -> Iterator[Tuple[np.ndarray, int]]:
        """Yields (batch (b, h, w, t*c), actual_count); the final batch is
        padded to batch_size by repeating the last clip so every device step
        sees a static shape (XLA-friendly), with actual_count marking pads."""
        n = len(self)
        for start in range(0, n, batch_size):
            idxs = list(range(start, min(start + batch_size, n)))
            actual = len(idxs)
            while len(idxs) < batch_size:
                idxs.append(n - 1)
            yield np.stack([self[i] for i in idxs]), actual


class TwoStreamTrainSampler:
    """Random clip pairs for stage-2 training.

    ``aligned=True`` draws one (video, offset) and slices both modalities
    (the flow sequence for a T-frame video has T-1 fields; offset o pairs
    rgb frames [o, o+t_rgb) with flows [o, o+t_op)).  ``aligned=False``
    reproduces the reference's independent sampling
    (two_stream_dataset.py:466-470).
    """

    def __init__(self, rgb_index: VideoIndex, op_index: VideoIndex,
                 clip_len_rgb: int = 5, clip_len_op: int = 4,
                 loader_rgb: Optional[ClipLoader] = None,
                 loader_op: Optional[ClipLoader] = None,
                 aligned: bool = True, seed: int = 2017,
                 image_size: int = 256, reproduce_flow_bug: bool = True):
        self.rgb_index, self.op_index = rgb_index, op_index
        self.clip_len_rgb, self.clip_len_op = clip_len_rgb, clip_len_op
        self.loader_rgb = loader_rgb or ClipLoader("rgb", image_size)
        self.loader_op = loader_op or ClipLoader(
            "op", image_size, reproduce_flow_bug)
        self.aligned = aligned
        # reference uses a shared module-level RandomState(2017)
        # (two_stream_dataset.py:31); ours is per-sampler.
        self.rng = np.random.default_rng(seed)
        self.names = [n for n in rgb_index.names if n in op_index.videos]
        assert self.names, "no common sub-videos between rgb and op roots"

    def _sample_one(self, index: VideoIndex, clip_len: int,
                    loader: ClipLoader) -> np.ndarray:
        name = self.names[self.rng.integers(len(self.names))]
        offset = self.rng.integers(index.length(name) - clip_len + 1)
        return loader.load_clip(index.videos[name][offset: offset + clip_len])

    def sample(self) -> Dict[str, np.ndarray]:
        if not self.aligned:
            return {
                "rgb": self._sample_one(self.rgb_index, self.clip_len_rgb,
                                        self.loader_rgb),
                "op": self._sample_one(self.op_index, self.clip_len_op,
                                       self.loader_op),
            }
        name = self.names[self.rng.integers(len(self.names))]
        max_off = min(
            self.rgb_index.length(name) - self.clip_len_rgb,
            self.op_index.length(name) - self.clip_len_op,
        )
        offset = int(self.rng.integers(max_off + 1))
        rgb = self.loader_rgb.load_clip(
            self.rgb_index.videos[name][offset: offset + self.clip_len_rgb])
        op = self.loader_op.load_clip(
            self.op_index.videos[name][offset: offset + self.clip_len_op])
        return {"rgb": rgb, "op": op}

    def batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        samples = [self.sample() for _ in range(batch_size)]
        return {k: np.stack([s[k] for s in samples]) for k in ("rgb", "op")}


class SingleStreamTrainSampler:
    """Stage-1 random clips for one modality (reference clip_Train_DS)."""

    def __init__(self, index: VideoIndex, clip_length: int, loader: ClipLoader,
                 seed: int = 2017):
        self.index = index
        self.clip_length = clip_length
        self.loader = loader
        self.rng = np.random.default_rng(seed)

    def sample(self) -> np.ndarray:
        names = self.index.names
        name = names[self.rng.integers(len(names))]
        offset = int(self.rng.integers(
            self.index.length(name) - self.clip_length + 1))
        return self.loader.load_clip(
            self.index.videos[name][offset: offset + self.clip_length])

    def batch(self, batch_size: int) -> np.ndarray:
        return np.stack([self.sample() for _ in range(batch_size)])
