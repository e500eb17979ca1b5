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


class FrameCache:
    """Thread-safe byte-capped LRU of decoded (resized) frames.

    Training revisits every frame ``clip_len x epochs`` times; on the
    file-tree backend each visit re-decodes the JPEG / re-parses the .flo,
    which leaves the chip ~20x idle (PERF.md).  Caching frames *after*
    decode+resize (uint8 rgb / float32 flow) turns steady-state clip
    assembly into memcpy + normalize.  Whole decoded training sets are
    small (ped2 ~0.5 GB, avenue ~3 GB at 256^2 uint8); the byte cap evicts
    LRU beyond it.  Entries are frozen (writeable=False) so a cache hit can
    be shared across loader threads safely.
    """

    def __init__(self, capacity_bytes: int = 2 << 30):
        import threading
        from collections import OrderedDict

        self._d: "OrderedDict[object, np.ndarray]" = OrderedDict()
        self._lock = threading.Lock()
        self._bytes = 0
        self.capacity = int(capacity_bytes)
        self.hits = 0
        self.misses = 0

    def get(self, key, load):
        with self._lock:
            arr = self._d.get(key)
            if arr is not None:
                self._d.move_to_end(key)
                self.hits += 1
                return arr
        arr = load()  # decode outside the lock (a rare concurrent miss
        arr.flags.writeable = False  # just duplicates one decode)
        with self._lock:
            self.misses += 1
            if key not in self._d:
                self._d[key] = arr
                self._bytes += arr.nbytes
                while self._bytes > self.capacity and self._d:
                    _, old = self._d.popitem(last=False)
                    self._bytes -= old.nbytes
        return arr


class ClipLoader:
    """Assembles channel-stacked NHWC clips from frame paths.

    ``cache``: optional :class:`FrameCache` shared across loaders/threads;
    decoded frames are cached post-resize, pre-normalize.

    ``normalize_rgb=False`` returns rgb clips as raw uint8 — the
    fast-transfer path: 4x fewer interleave/PCIe bytes, with the identical
    (x/255 - .5)/.5 normalization fused into the jitted train step
    (train.steps._to_model_range) exactly like the framepack backend.

    ``packed=True`` emits clips as (t, h, w, c) frame stacks instead of the
    torch-style (h, w, t*c) channel interleave: host assembly becomes
    contiguous per-frame memcpys (the strided interleave costs ~2.5 ms/clip
    on the host) and the interleave runs inside the jitted step as an XLA
    transpose — effectively free on TPU.
    """

    def __init__(self, data_type: str, image_size: int = 256,
                 reproduce_flow_bug: bool = True,
                 cache: Optional[FrameCache] = None,
                 normalize_rgb: bool = True,
                 packed: bool = False):
        assert data_type in ("rgb", "op")
        self.data_type = data_type
        self.size = (image_size, image_size)
        self.reproduce_flow_bug = reproduce_flow_bug
        self.cache = cache
        self.normalize_rgb = normalize_rgb
        self.packed = packed

    @property
    def channels(self) -> int:
        return 3 if self.data_type == "rgb" else 2

    def clip_dtype(self):
        if self.data_type == "rgb" and not self.normalize_rgb:
            return np.uint8
        return np.float32

    def _frame(self, path: str) -> np.ndarray:
        if self.data_type == "rgb":
            if self.cache is None:
                return _decode_rgb(path, self.size)
            return self.cache.get((path, self.size),
                                  lambda: _decode_rgb(path, self.size))
        if self.cache is None:
            return load_flow(path, self.size, self.reproduce_flow_bug)
        return self.cache.get(
            (path, self.size, self.reproduce_flow_bug),
            lambda: load_flow(path, self.size, self.reproduce_flow_bug))

    def clip_shape(self, t: int) -> Tuple[int, ...]:
        h, w = self.size
        if self.packed:
            return (t, h, w, self.channels)
        return (h, w, t * self.channels)

    def load_clip_into(self, paths: Sequence[str], out: np.ndarray) -> None:
        """Assemble the clip directly into ``out`` (:meth:`clip_shape`).

        The channel interleave (non-packed layout) runs in the frames'
        storage dtype (uint8 for rgb) and the float conversion happens once
        on the interleaved result — the float32-per-frame concatenate this
        replaces dominated cached batch assembly 2:1.
        """
        if self.packed:
            if self.data_type == "rgb" and self.normalize_rgb:
                for i, p in enumerate(paths):
                    np.divide(self._frame(p), 255.0, out=out[i])
                out -= 0.5
                out /= 0.5
                return
            for i, p in enumerate(paths):
                out[i] = self._frame(p)
            return
        c = self.channels
        h, w = self.size
        if self.data_type == "rgb" and self.normalize_rgb:
            tmp = np.empty((h, w, len(paths) * c), np.uint8)
            for i, p in enumerate(paths):
                tmp[..., i * c:(i + 1) * c] = self._frame(p)
            # same op order as rgb_to_tensor (x/255 - .5)/.5 for bit parity
            np.divide(tmp, 255.0, out=out)
            out -= 0.5
            out /= 0.5
            return
        for i, p in enumerate(paths):
            out[..., i * c:(i + 1) * c] = self._frame(p)

    def load_clip(self, paths: Sequence[str]) -> np.ndarray:
        """paths (t,) -> clip_shape(t) array (float32, or uint8 for
        fast-transfer rgb)."""
        out = np.empty(self.clip_shape(len(paths)), self.clip_dtype())
        self.load_clip_into(paths, out)
        return out


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
                 image_size: int = 256, reproduce_flow_bug: bool = True,
                 cache_bytes: int = 2 << 30, normalize_rgb: bool = True,
                 packed: bool = False):
        self.rgb_index, self.op_index = rgb_index, op_index
        self.clip_len_rgb, self.clip_len_op = clip_len_rgb, clip_len_op
        cache = FrameCache(cache_bytes) if cache_bytes else None
        self.loader_rgb = loader_rgb or ClipLoader(
            "rgb", image_size, cache=cache, normalize_rgb=normalize_rgb,
            packed=packed)
        self.loader_op = loader_op or ClipLoader(
            "op", image_size, reproduce_flow_bug, cache=cache,
            packed=packed)
        self.aligned = aligned
        # reference uses a shared module-level RandomState(2017)
        # (two_stream_dataset.py:31); ours is per-sampler.
        self.rng = np.random.default_rng(seed)
        self.names = [n for n in rgb_index.names if n in op_index.videos]
        assert self.names, "no common sub-videos between rgb and op roots"

    def _draw_one(self, index: VideoIndex, clip_len: int):
        name = self.names[self.rng.integers(len(self.names))]
        offset = int(self.rng.integers(index.length(name) - clip_len + 1))
        return name, offset

    def draw(self):
        """Draw one sample's (video, offset) coordinates — rng-sequential so
        a seed reproduces the same clips regardless of how many loader
        threads assemble them (:func:`parallel_batches`)."""
        if not self.aligned:
            return (self._draw_one(self.rgb_index, self.clip_len_rgb),
                    self._draw_one(self.op_index, self.clip_len_op))
        name = self.names[self.rng.integers(len(self.names))]
        max_off = min(
            self.rgb_index.length(name) - self.clip_len_rgb,
            self.op_index.length(name) - self.clip_len_op,
        )
        return name, int(self.rng.integers(max_off + 1))

    def _paths(self, coord):
        if not self.aligned:
            (rgb_name, rgb_off), (op_name, op_off) = coord
        else:
            rgb_name = op_name = coord[0]
            rgb_off = op_off = coord[1]
        return (self.rgb_index.videos[rgb_name]
                [rgb_off: rgb_off + self.clip_len_rgb],
                self.op_index.videos[op_name]
                [op_off: op_off + self.clip_len_op])

    def alloc_batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        return {
            "rgb": np.empty(
                (batch_size, *self.loader_rgb.clip_shape(self.clip_len_rgb)),
                self.loader_rgb.clip_dtype()),
            "op": np.empty(
                (batch_size, *self.loader_op.clip_shape(self.clip_len_op)),
                np.float32),
        }

    def load_into(self, coord, out: Dict[str, np.ndarray], i: int) -> None:
        """Assemble one drawn sample into batch row ``i`` (thread-safe)."""
        rgb_paths, op_paths = self._paths(coord)
        self.loader_rgb.load_clip_into(rgb_paths, out["rgb"][i])
        self.loader_op.load_clip_into(op_paths, out["op"][i])

    def load(self, coord) -> Dict[str, np.ndarray]:
        rgb_paths, op_paths = self._paths(coord)
        return {"rgb": self.loader_rgb.load_clip(rgb_paths),
                "op": self.loader_op.load_clip(op_paths)}

    def sample(self) -> Dict[str, np.ndarray]:
        return self.load(self.draw())

    def batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        out = self.alloc_batch(batch_size)
        for i in range(batch_size):
            self.load_into(self.draw(), out, i)
        return out


class SingleStreamTrainSampler:
    """Stage-1 random clips for one modality (reference clip_Train_DS)."""

    def __init__(self, index: VideoIndex, clip_length: int, loader: ClipLoader,
                 seed: int = 2017):
        self.index = index
        self.clip_length = clip_length
        self.loader = loader
        self.rng = np.random.default_rng(seed)

    def draw(self):
        names = self.index.names
        name = names[self.rng.integers(len(names))]
        offset = int(self.rng.integers(
            self.index.length(name) - self.clip_length + 1))
        return name, offset

    def load(self, coord) -> np.ndarray:
        name, offset = coord
        return self.loader.load_clip(
            self.index.videos[name][offset: offset + self.clip_length])

    def alloc_batch(self, batch_size: int) -> np.ndarray:
        return np.empty(
            (batch_size, *self.loader.clip_shape(self.clip_length)),
            self.loader.clip_dtype())

    def load_into(self, coord, out: np.ndarray, i: int) -> None:
        name, offset = coord
        self.loader.load_clip_into(
            self.index.videos[name][offset: offset + self.clip_length],
            out[i])

    def sample(self) -> np.ndarray:
        return self.load(self.draw())

    def batch(self, batch_size: int) -> np.ndarray:
        out = self.alloc_batch(batch_size)
        for i in range(batch_size):
            self.load_into(self.draw(), out, i)
        return out


def parallel_batches(sampler, batch_size: int, num_workers: int = 8,
                     depth: int = 4) -> Iterator:
    """Infinite training-batch iterator with parallel clip assembly.

    Coordinates are drawn rng-sequentially on the calling thread (so a seed
    reproduces the exact clip sequence), the JPEG/.flo decoding fans out on a
    thread pool (cv2/np release the GIL), and ``depth`` whole batches stay in
    flight — the thread-based replacement for the reference's
    ``DataLoader(num_workers=16)`` worker processes
    (``Code/run_helper/train_helper.py:230-232``).  Requires a sampler with
    ``draw()``/``load()`` (both train sampler classes here).
    """
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=num_workers)

    def submit():
        out = sampler.alloc_batch(batch_size)
        futures = [pool.submit(sampler.load_into, sampler.draw(), out, i)
                   for i in range(batch_size)]
        return out, futures

    inflight = deque(submit() for _ in range(max(1, depth)))
    while True:
        out, futures = inflight.popleft()
        for f in futures:
            f.result()
        inflight.append(submit())
        yield out
