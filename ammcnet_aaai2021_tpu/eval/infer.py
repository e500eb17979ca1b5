"""Fused clip -> anomaly-score inference.

Replaces the reference's test loop (``Code/run_helper/test_helper.py:387-488``
``gen_loss_file_twostream_normal_all``): where the torch version runs the
model forward, then loops over the batch in Python computing one PSNR per
frame with a GPU->host sync each (test_helper.py:445-464), here encoder,
memory addressing, AMFT bridge, decoder, per-frame PSNR and per-frame commit
distance are ONE jit region; only the per-video score vectors return to host.

Record-assembly semantics preserved exactly (test_helper.py:455-476):
positions ``cnt + clip_len - 1`` hold scores, the leading ``clip_len - 1``
frames are back-filled with the first score, and the op arrays' final
position is copied from its predecessor.

Deliberate deviations (flagged):
* per-frame commit distance instead of the batch-mean scalar the reference
  replicates across the batch (test_helper.py:446: every frame in a batch of
  16 got the same fea_comm value) — strictly more informative, reduces to the
  reference under per-video min-max normalization of constant blocks;
* the op-stream PSNR target is the clip's last flow field (the reference
  compares the 2-channel prediction against the 3-field *input* stack via
  accidental broadcasting, test_helper.py:434-436 — shape-coherent garbage);
  op records don't enter the headline fused score either way.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import VideoIndex
from ..ops.metrics import psnr_per_frame


def make_twostream_scorer(generator, variables,
                          rgb_channels: int = 3, op_channels: int = 2,
                          donate: bool = False) -> Callable:
    """Builds the jitted ``(rgb_clip, op_clip) -> 4 per-frame vectors`` fn.

    rgb_clip: (b, h, w, t_rgb*3) with the last frame the prediction target;
    op_clip:  (b, h, w, t_op*2) likewise.
    """

    def score(rgb_clip: jax.Array, op_clip: jax.Array):
        rgb_input = rgb_clip[..., :-rgb_channels]
        rgb_target = rgb_clip[..., -rgb_channels:]
        op_input = op_clip[..., :-op_channels]
        op_target = op_clip[..., -op_channels:]
        rgb_pred, op_pred, diffs, _ = generator.apply(
            variables, rgb_input, op_input, False)
        rgb_diff, op_diff = diffs
        return (
            psnr_per_frame(rgb_pred, rgb_target),
            jnp.broadcast_to(rgb_diff, rgb_pred.shape[:1]).astype(jnp.float32),
            psnr_per_frame(op_pred, op_target),
            jnp.broadcast_to(op_diff, op_pred.shape[:1]).astype(jnp.float32),
        )

    return jax.jit(score)


def make_video_scorer(generator, variables,
                      clip_len_rgb: int = 5, clip_len_op: int = 4,
                      window_batch: int = 16,
                      rgb_channels: int = 3, op_channels: int = 2) -> Callable:
    """Video-resident scorer: the whole sub-video lives on device (uint8
    frames + float flows, uploaded ONCE); each call gathers a batch of
    sliding windows on-device, normalizes, channel-stacks, and scores —
    so no frame crosses PCIe more than once (the torch DataLoader decodes
    and ships every frame clip_len times).

    Returns ``score_windows(video_rgb_u8 (T,h,w,3), video_op (T-1,h,w,2),
    idx (b,)) -> (rgb_psnr, rgb_fea, op_psnr, op_fea)`` jitted; idx are
    window start frames.
    """

    def stack_windows(video: jax.Array, idx: jax.Array, t: int) -> jax.Array:
        widx = idx[:, None] + jnp.arange(t)[None, :]  # (b, t)
        frames = video[widx]  # (b, t, h, w, c)
        b, _, h, w, c = frames.shape
        # (b,t,h,w,c) -> (b,h,w,t*c): channel order [f0_c0..f0_cn, f1_c0..]
        return jnp.transpose(frames, (0, 2, 3, 1, 4)).reshape(b, h, w, t * c)

    def score_windows(video_rgb_u8: jax.Array, video_op: jax.Array,
                      idx: jax.Array):
        rgb = (video_rgb_u8.astype(jnp.float32) / 255.0 - 0.5) / 0.5
        rgb_clip = stack_windows(rgb, idx, clip_len_rgb)
        op_clip = stack_windows(video_op, idx, clip_len_op)
        rgb_input = rgb_clip[..., :-rgb_channels]
        rgb_target = rgb_clip[..., -rgb_channels:]
        op_input = op_clip[..., :-op_channels]
        op_target = op_clip[..., -op_channels:]
        rgb_pred, op_pred, diffs, _ = generator.apply(
            variables, rgb_input, op_input, False)
        rgb_diff, op_diff = diffs
        return (
            psnr_per_frame(rgb_pred, rgb_target),
            jnp.broadcast_to(rgb_diff, rgb_pred.shape[:1]).astype(jnp.float32),
            psnr_per_frame(op_pred, op_target),
            jnp.broadcast_to(op_diff, op_pred.shape[:1]).astype(jnp.float32),
        )

    return jax.jit(score_windows)


def upload_video(video_rgb_u8: np.ndarray, video_op: np.ndarray):
    """Async-dispatch the per-video device transfers.

    Frames travel as uint8 (their on-disk precision) and flows as bfloat16 —
    the model's first conv casts inputs to bf16 anyway, so this halves the
    PCIe bytes without changing what the network computes.  The bf16 cast
    happens on host via ml_dtypes (vectorized, ~30ms for a 180-frame video;
    ``jnp.asarray(..., dtype=bf16)`` is ~40x slower).  Returns device arrays
    immediately (transfers are async and overlap subsequent work).
    """
    import ml_dtypes

    return (jax.device_put(np.ascontiguousarray(video_rgb_u8)),
            jax.device_put(video_op.astype(ml_dtypes.bfloat16)))


def launch_video_scoring(scorer: Callable, v_rgb, v_op,
                         n_windows: int, window_batch: int):
    """Dispatch all window batches for one video WITHOUT blocking; returns
    (device_results, actual_counts) for :func:`gather_video_scores`."""
    results, counts = [], []
    for start in range(0, n_windows, window_batch):
        idx = np.arange(start, min(start + window_batch, n_windows))
        actual = len(idx)
        if actual < window_batch:
            idx = np.pad(idx, (0, window_batch - actual), mode="edge")
        results.append(scorer(v_rgb, v_op, jnp.asarray(idx)))
        counts.append(actual)
    return results, counts


def gather_video_scores(results, counts) -> Tuple[np.ndarray, ...]:
    """Collect one video's batch results with a SINGLE device->host fetch.

    Each per-batch result is 4 small vectors; pulling them individually costs
    one RPC round-trip apiece (dominant at remote-device latencies), so they
    are stacked on-device into one (n_batches, 4, batch) array first.
    """
    stacked = np.asarray(jnp.stack([jnp.stack(r) for r in results]))
    outs = [[], [], [], []]
    for bi, actual in enumerate(counts):
        for o, row in zip(outs, stacked[bi]):
            o.append(row[:actual])
    return tuple(np.concatenate(o) for o in outs)


def score_video_arrays(scorer: Callable, video_rgb_u8: np.ndarray,
                       video_op: np.ndarray, clip_len_rgb: int = 5,
                       window_batch: int = 16) -> Tuple[np.ndarray, ...]:
    """Host driver: pad the window-index range to static batches and run the
    jitted scorer; returns the 4 per-window score vectors (trimmed)."""
    n_windows = video_rgb_u8.shape[0] - clip_len_rgb + 1
    v_rgb, v_op = upload_video(video_rgb_u8, video_op)
    return gather_video_scores(
        *launch_video_scoring(scorer, v_rgb, v_op, n_windows, window_batch))


def _assemble_records(scores: np.ndarray, num_frame: int,
                      clip_len: int) -> np.ndarray:
    """Sliding-window scores -> per-frame array with reference boundary
    padding (test_helper.py:465-476)."""
    arr = np.empty((num_frame,), dtype=np.float32)
    arr[clip_len - 1 : clip_len - 1 + len(scores)] = scores
    arr[: clip_len - 1] = arr[clip_len - 1]
    # windows stop at num_frame - clip_len + 1; any tail frames (op stream is
    # one file shorter than rgb) copy their predecessor
    tail_start = clip_len - 1 + len(scores)
    for i in range(tail_start, num_frame):
        arr[i] = arr[i - 1]
    return arr


def score_dataset(
    generator,
    variables,
    rgb_root: str,
    op_root: str,
    dataset_name: str,
    clip_len_rgb: int = 5,
    clip_len_op: int = 4,
    batch_size: int = 16,
    image_size: int = 256,
    reproduce_flow_bug: bool = True,
    logger=None,
) -> Tuple[Dict, float]:
    """Per-video batched scoring over a test set.

    Returns (result_dict in the reference's golden-pickle schema, fps).
    """
    from concurrent.futures import ThreadPoolExecutor

    from ..data.datasets import _decode_rgb, load_flow

    scorer = make_video_scorer(generator, variables, clip_len_rgb,
                               clip_len_op, window_batch=batch_size)
    rgb_index = VideoIndex(rgb_root)
    op_index = VideoIndex(op_root)
    size = (image_size, image_size)
    pool = ThreadPoolExecutor(max_workers=8)

    def decode_video(name):
        frames = list(pool.map(lambda p: _decode_rgb(p, size),
                               rgb_index.videos[name]))
        flows = list(pool.map(
            lambda p: load_flow(p, size, reproduce_flow_bug),
            op_index.videos[name]))
        return np.stack(frames), np.stack(flows)

    result: Dict = {
        "dataset": dataset_name,
        "rgb_img_pred_records": [], "rgb_fea_comm_records": [],
        "op_img_pred_records": [], "op_fea_comm_records": [],
    }
    t0 = time.time()
    total_frames = 0
    names = rgb_index.names
    # three-stage pipeline: decode(i+1) on host threads || upload(i+1) to
    # device || compute(i) on chip — all async-dispatched so the PCIe
    # transfers and the TPU program overlap
    next_decoded = pool.submit(decode_video, names[0])
    v_rgb, v_op = upload_video(*next_decoded.result())
    if len(names) > 1:
        next_decoded = pool.submit(decode_video, names[1])
    for vi, name in enumerate(names):
        num_frame = int(v_rgb.shape[0])
        n_windows = num_frame - clip_len_rgb + 1
        launched = launch_video_scoring(scorer, v_rgb, v_op, n_windows,
                                        batch_size)
        if vi + 1 < len(names):
            v_rgb, v_op = upload_video(*next_decoded.result())
            if vi + 2 < len(names):
                next_decoded = pool.submit(decode_video, names[vi + 2])
        rgb_psnr, rgb_fea, op_psnr, op_fea = gather_video_scores(*launched)
        total_frames += len(rgb_psnr)
        result["rgb_img_pred_records"].append(
            _assemble_records(rgb_psnr, num_frame, clip_len_rgb))
        result["rgb_fea_comm_records"].append(
            _assemble_records(rgb_fea, num_frame, clip_len_rgb))
        result["op_img_pred_records"].append(
            _assemble_records(op_psnr, num_frame, clip_len_op))
        result["op_fea_comm_records"].append(
            _assemble_records(op_fea, num_frame, clip_len_op))
        if logger:
            logger.info("finish test video set %s", name)
    used = time.time() - t0
    fps = total_frames / used if used > 0 else 0.0
    if logger:
        logger.info("total time = %s, fps = %s", used, fps)
    return result, fps
