"""LMDB-backed clip datasets.

Rebuild of ``Code/dataset/lmdb_dataset.py`` (LMDBDataset_clip_base /
_clip_train / _clip_test / _twostream_train / _twostream_test): frames live
in an LMDB under keys ``f"{sub_video}-{frame_id:06d}"`` as npz-encoded
arrays; clip loads gather ``clip_length`` consecutive keys in one read
transaction; the test variant preloads a whole sub-video into RAM.

py-lmdb is not part of this image's baked dependencies, so everything here
is gated on ``import lmdb`` with a clear error; the drop-in no-dependency
alternative is :mod:`ammcnet_aaai2021_tpu.data.framepack` (memory-mapped
packed frames — faster than LMDB for this strictly-sequential read
pattern and the recommended path on TPU hosts).
"""

from __future__ import annotations

import io
from typing import Dict, Optional

import numpy as np


def _require_lmdb():
    try:
        import lmdb  # noqa: F401

        return lmdb
    except ImportError as exc:  # pragma: no cover - environment dependent
        raise ImportError(
            "py-lmdb is not installed; install `lmdb` to use the LMDB "
            "datasets, or convert your data with "
            "ammcnet_aaai2021_tpu.data.framepack (no native deps)"
        ) from exc


def _decode_value(buf: bytes) -> np.ndarray:
    """npz-encoded single-array value (reference stores np.savez buffers)."""
    with np.load(io.BytesIO(buf)) as z:
        return z[z.files[0]]


def frame_key(sub_video: str, frame_id: int) -> bytes:
    return f"{sub_video}-{frame_id:06d}".encode()


class LMDBClipDatasetBase:
    """Shared plumbing (reference LMDBDataset_clip_base, lmdb_dataset.py:23).

    ``videos``: {sub_video: n_frames} — the key manifest, stored by the
    packer under the ``__meta__`` key as JSON (falling back to a caller-
    provided dict for reference-written LMDBs without a manifest).
    """

    def __init__(self, lmdb_path: str, clip_length: int,
                 videos: Optional[Dict[str, int]] = None):
        lmdb = _require_lmdb()
        self.env = lmdb.open(lmdb_path, readonly=True, lock=False,
                             readahead=False, meminit=False)
        self.clip_length = clip_length
        if videos is None:
            import json

            with self.env.begin() as txn:
                raw = txn.get(b"__meta__")
            if raw is None:
                raise ValueError(
                    f"{lmdb_path}: no __meta__ manifest; pass videos=")
            videos = json.loads(raw)
        self.videos = dict(videos)
        self.names = sorted(self.videos)

    def load_clip(self, sub_video: str, start: int) -> np.ndarray:
        """clip_length consecutive frames in ONE read txn
        (reference load_sample)."""
        with self.env.begin() as txn:
            frames = [
                _decode_value(txn.get(frame_key(sub_video, start + i)))
                for i in range(self.clip_length)
            ]
        return np.concatenate(frames, axis=-1)

    def load_video(self, sub_video: str) -> np.ndarray:
        """Whole sub-video preload (reference test variant)."""
        n = self.videos[sub_video]
        with self.env.begin() as txn:
            return np.stack([
                _decode_value(txn.get(frame_key(sub_video, i)))
                for i in range(n)
            ])


class LMDBClipTrain(LMDBClipDatasetBase):
    """Random (video, offset) clip sampling (reference _clip_train)."""

    def __init__(self, lmdb_path: str, clip_length: int,
                 videos: Optional[Dict[str, int]] = None, seed: int = 2017):
        super().__init__(lmdb_path, clip_length, videos)
        self.rng = np.random.default_rng(seed)

    def sample(self) -> np.ndarray:
        name = self.names[self.rng.integers(len(self.names))]
        start = int(self.rng.integers(
            self.videos[name] - self.clip_length + 1))
        return self.load_clip(name, start)

    def batch(self, batch_size: int) -> np.ndarray:
        return np.stack([self.sample() for _ in range(batch_size)])


class LMDBClipTest(LMDBClipDatasetBase):
    """Sequential windows over a preloaded sub-video (reference _clip_test)."""

    def windows(self, sub_video: str) -> np.ndarray:
        return self.load_video(sub_video)


class LMDBTwoStreamTrain:
    """Paired rgb/op sampling over two LMDBs (reference _twostream_train),
    frame-aligned by default (the reference samples independently)."""

    def __init__(self, rgb_path: str, op_path: str, clip_len_rgb: int = 5,
                 clip_len_op: int = 4, aligned: bool = True, seed: int = 2017):
        self.rgb = LMDBClipTrain(rgb_path, clip_len_rgb, seed=seed)
        self.op = LMDBClipTrain(op_path, clip_len_op, seed=seed + 1)
        self.aligned = aligned
        self.rng = np.random.default_rng(seed)
        self.names = [n for n in self.rgb.names if n in self.op.videos]

    def sample(self) -> Dict[str, np.ndarray]:
        if not self.aligned:
            return {"rgb": self.rgb.sample(), "op": self.op.sample()}
        name = self.names[self.rng.integers(len(self.names))]
        max_off = min(self.rgb.videos[name] - self.rgb.clip_length,
                      self.op.videos[name] - self.op.clip_length)
        off = int(self.rng.integers(max_off + 1))
        return {"rgb": self.rgb.load_clip(name, off),
                "op": self.op.load_clip(name, off)}

    def batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        samples = [self.sample() for _ in range(batch_size)]
        return {k: np.stack([s[k] for s in samples]) for k in ("rgb", "op")}


def pack_video_tree_to_lmdb(frames_root: str, lmdb_path: str,
                            image_size: int = 256,
                            data_type: str = "rgb",
                            map_size: int = 1 << 40) -> Dict[str, int]:
    """Build an LMDB from a frame-folder tree (packer counterpart of the
    reference's offline LMDB prep)."""
    import json

    lmdb = _require_lmdb()
    from .datasets import ClipLoader, VideoIndex

    loader = ClipLoader(data_type, image_size)
    index = VideoIndex(frames_root)
    env = lmdb.open(lmdb_path, map_size=map_size)
    videos: Dict[str, int] = {}
    with env.begin(write=True) as txn:
        for name in index.names:
            paths = index.videos[name]
            videos[name] = len(paths)
            for i, path in enumerate(paths):
                arr = loader.load_clip([path])
                buf = io.BytesIO()
                np.savez(buf, arr)
                txn.put(frame_key(name, i), buf.getvalue())
        txn.put(b"__meta__", json.dumps(videos).encode())
    env.close()
    return videos
