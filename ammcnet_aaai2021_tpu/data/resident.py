"""Device-resident training data: upload the split ONCE, gather on device.

TPU-native answer to the reference's per-step host DataLoader
(``Code/run_helper/train_helper.py:217-427`` feeds each batch through a
torch DataLoader -> ``.cuda()`` copy every iteration): a video-surveillance
training split is small next to HBM (ped2-scale at 256x256: ~0.3 GB u8
frames + bf16 flows vs 16 GB), so the whole split lives on device and each
step's "data loading" is a (b,) int32 coordinate upload plus one XLA gather
— zero per-step pixel traffic on the host<->device link.  This is what lets
the 80k-iteration released recipe run at the chip's step rate on a remote
device whose sustained H2D bandwidth is 2-45 MB/s (PERF.md): the per-step
batch upload it replaces costs more than the GAN step itself.

Sampling semantics are EXACTLY :class:`..data.datasets.TwoStreamTrainSampler`
(aligned mode): the same ``default_rng(seed)`` draw sequence produces the
same (video, offset) coordinates, and the gathered pixels equal the host
sampler's packed clips (parity-tested in tests/test_data_backends.py).

Videos pad to the max length along a FLAT frame axis (V*Tmax, h, w, c);
a clip gather is ``flat[v*Tmax + off + arange(t)]`` — one gather op,
static shapes, MXU-friendly downstream.  Padding frames are never indexed
because offsets are drawn against each video's true length.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .datasets import VideoIndex, _decode_rgb, load_flow


def _load_video_rgb(paths: List[str], size: int) -> np.ndarray:
    return np.stack([_decode_rgb(p, (size, size)) for p in paths])


def _load_video_flow(paths: List[str], size: int,
                     reproduce_bug: bool) -> np.ndarray:
    return np.stack([load_flow(p, (size, size), reproduce_bug)
                     for p in paths])


class DeviceResidentTwoStream:
    """Whole-split-on-device clip sampler for stage-2 (rgb+op) training.

    Emits the fast-transfer batch format the jitted step already accepts
    (``train/steps.py _to_model_range``): frame-packed uint8 rgb
    (b, t_rgb, h, w, 3) and bf16 flows (b, t_op, h, w, 2), both as DEVICE
    arrays — the normalize + interleave runs inside the train step.
    """

    def __init__(self, rgb_index: VideoIndex, op_index: VideoIndex,
                 clip_len_rgb: int = 5, clip_len_op: int = 4,
                 image_size: int = 256, aligned: bool = True,
                 reproduce_flow_bug: bool = True, seed: int = 2017,
                 device=None):
        assert aligned, (
            "device-resident sampling implements the aligned mode; the "
            "reference's independent-draw quirk (two_stream_dataset.py:"
            "466-470) stays on the host backends")
        import jax
        import jax.numpy as jnp
        import ml_dtypes

        self.clip_len_rgb, self.clip_len_op = clip_len_rgb, clip_len_op
        self.rng = np.random.default_rng(seed)
        self.names = [n for n in rgb_index.names if n in op_index.videos]
        assert self.names, "no common sub-videos between rgb and op roots"
        self._len_rgb = np.array([rgb_index.length(n) for n in self.names])
        self._len_op = np.array([op_index.length(n) for n in self.names])
        self._max_off = np.minimum(self._len_rgb - clip_len_rgb,
                                   self._len_op - clip_len_op)
        assert (self._max_off >= 0).all(), "a video is shorter than the clip"

        t_rgb = int(self._len_rgb.max())
        t_op = int(self._len_op.max())
        h = w = image_size
        rgb = np.zeros((len(self.names), t_rgb, h, w, 3), np.uint8)
        op = np.zeros((len(self.names), t_op, h, w, 2), ml_dtypes.bfloat16)
        for i, n in enumerate(self.names):
            rgb[i, : self._len_rgb[i]] = _load_video_rgb(
                rgb_index.videos[n], image_size)
            op[i, : self._len_op[i]] = _load_video_flow(
                op_index.videos[n], image_size, reproduce_flow_bug)
        self._t_rgb_max, self._t_op_max = t_rgb, t_op
        dev = device or jax.devices()[0]
        # flat frame axis: clip gather = flat[v*Tmax + off + arange(t)]
        self._rgb_flat = jax.device_put(
            rgb.reshape(-1, h, w, 3), dev)
        self._op_flat = jax.device_put(op.reshape(-1, h, w, 2), dev)
        self.resident_bytes = (self._rgb_flat.nbytes + self._op_flat.nbytes)

        @jax.jit
        def gather(rgb_flat, op_flat, vid, off):
            r0 = vid * t_rgb + off
            o0 = vid * t_op + off
            ridx = r0[:, None] + jnp.arange(clip_len_rgb)[None, :]
            oidx = o0[:, None] + jnp.arange(clip_len_op)[None, :]
            return {"rgb": rgb_flat[ridx], "op": op_flat[oidx]}

        self._gather = gather

    def draw(self):
        """Same rng call sequence as TwoStreamTrainSampler.draw (aligned)."""
        i = int(self.rng.integers(len(self.names)))
        return i, int(self.rng.integers(self._max_off[i] + 1))

    def batch(self, batch_size: int) -> Dict:
        coords = [self.draw() for _ in range(batch_size)]
        vid = np.array([c[0] for c in coords], np.int32)
        off = np.array([c[1] for c in coords], np.int32)
        return self._gather(self._rgb_flat, self._op_flat, vid, off)


class DeviceResidentSingleStream:
    """Single-modality (stage-1) variant; same design, one stream."""

    def __init__(self, index: VideoIndex, data_type: str,
                 clip_length: int, image_size: int = 256,
                 reproduce_flow_bug: bool = True, seed: int = 2017,
                 device=None):
        import jax
        import jax.numpy as jnp
        import ml_dtypes

        self.clip_length = clip_length
        self.rng = np.random.default_rng(seed)
        self.names = index.names
        self._lens = np.array([index.length(n) for n in self.names])
        self._max_off = self._lens - clip_length
        assert (self._max_off >= 0).all(), "a video is shorter than the clip"
        tmax = int(self._lens.max())
        h = w = image_size
        if data_type == "rgb":
            data = np.zeros((len(self.names), tmax, h, w, 3), np.uint8)
            for i, n in enumerate(self.names):
                data[i, : self._lens[i]] = _load_video_rgb(
                    index.videos[n], image_size)
        else:
            data = np.zeros((len(self.names), tmax, h, w, 2),
                            ml_dtypes.bfloat16)
            for i, n in enumerate(self.names):
                data[i, : self._lens[i]] = _load_video_flow(
                    index.videos[n], image_size, reproduce_flow_bug)
        dev = device or jax.devices()[0]
        self._flat = jax.device_put(data.reshape(-1, *data.shape[2:]), dev)
        self.resident_bytes = self._flat.nbytes

        @jax.jit
        def gather(flat, vid, off):
            idx = (vid * tmax + off)[:, None] + jnp.arange(clip_length)
            return flat[idx]

        self._gather = gather

    def draw(self):
        i = int(self.rng.integers(len(self.names)))
        return i, int(self.rng.integers(self._max_off[i] + 1))

    def batch(self, batch_size: int):
        coords = [self.draw() for _ in range(batch_size)]
        vid = np.array([c[0] for c in coords], np.int32)
        off = np.array([c[1] for c in coords], np.int32)
        return self._gather(self._flat, vid, off)
