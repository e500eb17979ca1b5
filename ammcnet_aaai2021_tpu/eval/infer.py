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
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import VideoIndex
from ..ops.metrics import OP_PER_FRAME_METRICS, PER_FRAME_METRICS

# Every scorer factory below passes the model weights into the jitted
# program as PARAMETERS, not baked-in HLO constants: the traced module
# stays small (MBs, not 100+ MB), the remote compile service turns it
# around faster, and the persistent-cache key is stable across processes
# regardless of the weights' values.


def _resolve_op_metric(metric: str, op_metric: Optional[str]):
    """Op-stream metric fn: ``op_metric`` overrides (flow-native 'epe'
    allowed); None inherits the rgb-stream metric, reference behavior."""
    return OP_PER_FRAME_METRICS[op_metric or metric]


def _stack_windows(video: jax.Array, idx: jax.Array, t: int) -> jax.Array:
    """Gather ``len(idx)`` sliding windows of ``t`` frames and fold time into
    channels: (T,h,w,c) + (b,) starts -> (b,h,w,t*c), channel order
    [f0_c0..f0_cn, f1_c0..] (the reference's ``view(b,-1,h,w)`` fold,
    train_helper.py:302-305, in NHWC)."""
    widx = idx[:, None] + jnp.arange(t)[None, :]  # (b, t)
    frames = video[widx]  # (b, t, h, w, c)
    b, _, h, w, c = frames.shape
    return jnp.transpose(frames, (0, 2, 3, 1, 4)).reshape(b, h, w, t * c)


def _make_score_batch(generator, clip_len_rgb: int, clip_len_op: int,
                      rgb_channels: int, op_channels: int,
                      metric: str, op_metric: Optional[str],
                      reproduce_op_psnr_bug: bool,
                      apply_fn: Optional[Callable]) -> Callable:
    """The ONE scoring kernel every scorer factory wraps.

    ``score_batch(vars_, video_rgb_u8, video_op, idx) -> tuple of 4 (b,)
    vectors`` (rgb_psnr, rgb_fea, op_psnr, op_fea): gathers uint8 windows
    on-device, normalizes only the gathered clip, runs the generator (or the
    ``apply_fn`` override — folded / int8 forwards), and computes the
    per-frame metrics.  Shared by make_video_scorer (tuple, optionally
    sharded), make_full_video_scorer and make_multi_video_scorer (stacked
    inside lax.map) so the metric surface cannot diverge between them
    (it had: the bench/export path once hard-coded psnr, VERDICT r3)."""
    metric_fn = PER_FRAME_METRICS[metric]
    op_metric_fn = _resolve_op_metric(metric, op_metric)
    if apply_fn is None:
        def apply_fn(vars_, rgb_input, op_input):
            return generator.apply(vars_, rgb_input, op_input, False)

    def score_batch(vars_, video_rgb, video_op, idx):
        # gather uint8 windows FIRST, then normalize only the (b,h,w,t*c)
        # clip — normalizing the whole video would redo full-video work in
        # every per-batch call
        rgb_clip = _stack_windows(video_rgb, idx, clip_len_rgb)
        op_clip = _stack_windows(video_op, idx, clip_len_op)
        rgb = (rgb_clip.astype(jnp.float32) / 255.0 - 0.5) / 0.5
        rgb_input, rgb_target = rgb[..., :-rgb_channels], rgb[..., -rgb_channels:]
        op_input, op_target = op_clip[..., :-op_channels], op_clip[..., -op_channels:]
        rgb_pred, op_pred, diffs, _ = apply_fn(vars_, rgb_input, op_input)
        rgb_diff, op_diff = diffs
        if reproduce_op_psnr_bug:
            op_score = op_psnr_reference_bug(op_pred, op_input)
        else:
            op_score = op_metric_fn(op_pred, op_target.astype(jnp.float32))
        return (
            metric_fn(rgb_pred, rgb_target),
            jnp.broadcast_to(rgb_diff, rgb_pred.shape[:1]).astype(jnp.float32),
            op_score,
            jnp.broadcast_to(op_diff, op_pred.shape[:1]).astype(jnp.float32),
        )

    return score_batch


def make_video_scorer(generator, variables,
                      clip_len_rgb: int = 5, clip_len_op: int = 4,
                      window_batch: int = 16,
                      rgb_channels: int = 3, op_channels: int = 2,
                      mesh=None, metric: str = "psnr",
                      op_metric: Optional[str] = None,
                      reproduce_op_psnr_bug: bool = False,
                      apply_fn: Optional[Callable] = None) -> Callable:
    """Video-resident scorer: the whole sub-video lives on device (uint8
    frames + float flows, uploaded ONCE); each call gathers a batch of
    sliding windows on-device, normalizes, channel-stacks, and scores —
    so no frame crosses PCIe more than once (the torch DataLoader decodes
    and ships every frame clip_len times).

    ``mesh``: a jax.sharding.Mesh with a 'data' axis for multi-chip serving —
    the window batch shards over 'data' (each chip scores its slice of the
    sliding windows; the video replicates), so window_batch must be a
    multiple of the axis size.  This is the workload's only sequence-scaling
    dimension (SURVEY.md 5.7).

    Returns ``score_windows(video_rgb_u8 (T,h,w,3), video_op (T-1,h,w,2),
    idx (b,)) -> (rgb_psnr, rgb_fea, op_psnr, op_fea)`` jitted; idx are
    window start frames.
    """

    score_windows = _make_score_batch(
        generator, clip_len_rgb, clip_len_op, rgb_channels, op_channels,
        metric, op_metric, reproduce_op_psnr_bug, apply_fn)

    if mesh is None:
        jitted = jax.jit(score_windows)

        def run(v_rgb, v_op, idx):
            return jitted(variables, v_rgb, v_op, idx)

        run.jitted, run.variables = jitted, variables  # AOT warm-up hook
        return run
    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    jitted = jax.jit(
        score_windows,
        in_shardings=(replicated, replicated, replicated, batch_sh),
        out_shardings=(batch_sh,) * 4)

    def run(v_rgb, v_op, idx):
        return jitted(variables, v_rgb, v_op, idx)

    run.jitted, run.variables = jitted, variables  # AOT warm-up hook
    return run


def make_full_video_scorer(generator, variables,
                           clip_len_rgb: int = 5, clip_len_op: int = 4,
                           window_batch: int = 32,
                           rgb_channels: int = 3, op_channels: int = 2,
                           metric: str = "psnr",
                           op_metric: Optional[str] = None,
                           reproduce_op_psnr_bug: bool = False,
                           apply_fn: Optional[Callable] = None
                           ) -> Callable:
    """Whole-video scorer: ONE jit call scores every sliding window of a
    sub-video (lax.map over window batches inside the program), so a video
    costs exactly one dispatch and one result fetch regardless of length —
    at remote-device RPC latencies the per-call overhead otherwise dominates
    compute 2:1.

    The jitted fn is shape-specialized per (padded) video length; callers
    bucket video lengths (:func:`pad_video_to_bucket`) so a dataset of
    variably-long videos compiles only a handful of programs.

    Returns ``score_video(video_rgb_u8 (T,h,w,3), video_op (T-1,h,w,2))
    -> (4, n_windows_padded) f32`` (padded windows trimmed by the caller).
    """

    score_tuple = _make_score_batch(
        generator, clip_len_rgb, clip_len_op, rgb_channels, op_channels,
        metric, op_metric, reproduce_op_psnr_bug, apply_fn)

    def score_batch(vars_, video_rgb, video_op, idx):
        return jnp.stack(score_tuple(vars_, video_rgb, video_op, idx))

    @jax.jit
    def score_video(vars_, video_rgb_u8: jax.Array,
                    video_op: jax.Array) -> jax.Array:
        n_windows = video_rgb_u8.shape[0] - clip_len_rgb + 1
        # clamp to the traced video's window count (shapes are static per
        # trace): window_batch=192 on a 64-frame bucket would otherwise
        # run a 192-window batch that is ~3x duplicate forwards
        wb = min(window_batch, n_windows)
        n_batches = -(-n_windows // wb)
        # window starts padded by clamping into range (duplicates trimmed host-side)
        starts = jnp.minimum(jnp.arange(n_batches * wb),
                             n_windows - 1).reshape(n_batches, wb)
        out = jax.lax.map(
            lambda idx: score_batch(vars_, video_rgb_u8, video_op, idx),
            starts)
        # (n_batches, 4, wb) -> (4, n_batches*wb)
        return jnp.transpose(out, (1, 0, 2)).reshape(4, -1)

    # weights as program parameters, not HLO constants (module note above)
    def run(v_rgb, v_op):
        return score_video(variables, v_rgb, v_op)

    run.jitted, run.variables = score_video, variables  # AOT warm-up hook
    return run


def make_multi_video_scorer(generator, variables,
                            clip_len_rgb: int = 5, clip_len_op: int = 4,
                            window_batch: int = 32,
                            rgb_channels: int = 3, op_channels: int = 2,
                            metric: str = "psnr",
                            op_metric: Optional[str] = None,
                            reproduce_op_psnr_bug: bool = False,
                            apply_fn: Optional[Callable] = None
                            ) -> Callable:
    """Multi-video scorer: ONE jit call scores every sliding window of a
    whole CHUNK of (equal-length, bucket-padded) videos.

    At remote-device RPC latencies even the per-video dispatch of
    :func:`make_full_video_scorer` dominates (measured: 12 async whole-video
    dispatches ran at 72 fps where the device-resident compute ceiling is
    ~565 fps) — so the video loop moves inside the program too: the chunk's
    videos stack on-device and a single flattened ``lax.map`` walks the
    (video x window-batch) grid.  A full ped2-shaped pass is then 2 dispatches
    + 1 result fetch instead of 12 + 12.

    Replaces the reference's per-frame-synced test loop
    (``Code/run_helper/test_helper.py:387-488``) at the other extreme of
    batching granularity.

    Returns ``score_chunk(rgbs: tuple[(T,h,w,3) u8], ops: tuple[(T-1,h,w,2)])
    -> (n_videos, 4, n_windows_padded) f32`` jitted; all videos in a call
    must share one padded length (:func:`pad_video_to_bucket`).

    ``apply_fn(vars_, rgb_input, op_input) -> (rgb_pred, op_pred, diffs, _)``
    overrides the generator forward — e.g. the folded two-stream stack
    (``models.folded``), whose ``vars_`` is a (stream_vars, bridge_vars)
    pair; pass those as ``variables`` then.
    """
    score_tuple = _make_score_batch(
        generator, clip_len_rgb, clip_len_op, rgb_channels, op_channels,
        metric, op_metric, reproduce_op_psnr_bug, apply_fn)

    def score_batch(vars_, video_rgb, video_op, idx):
        return jnp.stack(score_tuple(vars_, video_rgb, video_op, idx))

    @jax.jit
    def score_chunk(vars_, rgbs, ops) -> jax.Array:
        video_rgb = jnp.stack(rgbs)  # (n, T, h, w, 3) u8
        video_op = jnp.stack(ops)    # (n, T-1, h, w, 2)
        n = video_rgb.shape[0]
        n_windows = video_rgb.shape[1] - clip_len_rgb + 1
        n_batches = -(-n_windows // window_batch)
        starts = jnp.minimum(jnp.arange(n_batches * window_batch),
                             n_windows - 1).reshape(n_batches, window_batch)

        # nested lax.map (scan-in-scan): the outer map feeds each step its
        # own video by native scan operand slicing — a dynamic-index gather
        # of the whole stacked tensor inside the loop body instead sent this
        # environment's remote XLA service into a >1h compile
        def per_video(args):
            vr, vo = args
            return jax.lax.map(lambda idx: score_batch(vars_, vr, vo, idx),
                               starts)  # (nb, 4, wb)

        out = jax.lax.map(per_video, (video_rgb, video_op))  # (n, nb, 4, wb)
        return jnp.transpose(out, (0, 2, 1, 3)).reshape(n, 4, -1)

    # weights as program parameters, not HLO constants (module note above)
    def run(rgbs, ops):
        return score_chunk(variables, rgbs, ops)

    run.jitted, run.variables = score_chunk, variables  # AOT warm-up hook
    return run


def make_otf_flow_extractor(flow_net, flow_vars,
                            reproduce_flow_bug: bool = True,
                            chunk: int = 16,
                            pad_to: Optional[int] = None,
                            gray: bool = False) -> Callable:
    """On-the-fly optical-flow extraction, fully on-device.

    For datasets without precomputed .flo files (BASELINE config: avenue
    inference with on-the-fly FlowNet extraction): FlowNet2-SD runs on
    consecutive frame pairs inside jit and the result is normalized exactly
    like the .flo loader (including the reference's channel-overwrite when
    ``reproduce_flow_bug``), so the downstream scorer is oblivious to the
    flow source.

    Returns ``extract(video_rgb_u8 (T,h,w,3)) -> (T-1,h,w,2) bf16``.

    ``pad_to``: edge-pad the video to this frame count ON DEVICE (same
    repeat-last-frame semantics as :func:`pad_video_to_bucket`) and return
    ``(rgb_padded (pad_to,h,w,3) u8, flows (pad_to-1,h,w,2) bf16)`` — the
    caller then uploads only the true frames and the bucket-shaped scorer
    consumes the padded pair (bench.py: 6% fewer uploaded bytes over a
    bandwidth-bound tunnel).

    ``gray``: the input is ``(T,h,w,1)`` u8 and the first device op
    broadcasts it to 3 identical channels.  For grayscale datasets (ped2 is
    grayscale: cv2's color decode of its JPEGs yields 3 identical channels,
    reference ``Dataset/readme`` + ``img_dataset.py``'s cv.imread) this is
    bit-identical to uploading the decoded 3-channel video while shipping
    1/3 of the bytes over the host->device link — the end-to-end bottleneck
    in this environment (PERF.md).  Downstream programs are unchanged: the
    broadcast happens inside this program, and because the caller no longer
    holds a 3-channel device copy, gray mode ALWAYS returns the
    ``(rgb_3ch, flows)`` pair (padded iff ``pad_to``) for the scorer to
    consume.
    """

    returns_pair = gray or pad_to is not None

    @jax.jit
    def extract(vars_, video_rgb_u8: jax.Array):
        if gray:
            assert video_rgb_u8.shape[-1] == 1, video_rgb_u8.shape
            video_rgb_u8 = jnp.broadcast_to(
                video_rgb_u8, (*video_rgb_u8.shape[:-1], 3))
        if pad_to is not None and pad_to > video_rgb_u8.shape[0]:
            video_rgb_u8 = jnp.concatenate(
                [video_rgb_u8,
                 jnp.broadcast_to(
                     video_rgb_u8[-1:],
                     (pad_to - video_rgb_u8.shape[0],
                      *video_rgb_u8.shape[1:]))], axis=0)
        f = video_rgb_u8.astype(jnp.float32)  # FlowNet2SD wants [0,255]
        pairs = jnp.stack([f[:-1], f[1:]], axis=-1)  # (T-1, h, w, 3, 2)
        n = pairs.shape[0]
        n_chunks = -(-n // chunk)
        pad = n_chunks * chunk - n
        pairs = jnp.pad(pairs, ((0, pad), (0, 0), (0, 0), (0, 0), (0, 0)))
        pairs = pairs.reshape(n_chunks, chunk, *pairs.shape[1:])
        flows = jax.lax.map(lambda p: flow_net.apply(vars_, p), pairs)
        flows = flows.reshape(-1, *flows.shape[2:])[:n]  # (T-1, h, w, 2)
        h, w = flows.shape[1:3]
        if reproduce_flow_bug:
            u = flows[..., 0] / h
            flows = jnp.stack([u, u / w], axis=-1)
        else:
            flows = jnp.stack([flows[..., 0] / w, flows[..., 1] / h], axis=-1)
        flows = flows.astype(jnp.bfloat16)
        return (video_rgb_u8, flows) if returns_pair else flows

    # FlowNet weights (~45M params) as program parameters, not 180MB of
    # baked-in HLO constants (module note above)
    def run(video_rgb_u8):
        return extract(flow_vars, video_rgb_u8)

    run.jitted, run.variables = extract, flow_vars  # AOT warm-up hook
    run.gray, run.returns_pair = gray, returns_pair
    return run


def pad_video_to_bucket(video_rgb_u8: np.ndarray, video_op: np.ndarray,
                        bucket: int = 64):
    """Edge-pad a video's frame count up to the next bucket multiple so the
    whole-video scorer compiles one program per bucket, not per length.
    Returns (rgb, op, true_n_frames)."""
    t = video_rgb_u8.shape[0]
    t_pad = -(-t // bucket) * bucket
    if t_pad != t:
        video_rgb_u8 = np.concatenate(
            [video_rgb_u8,
             np.repeat(video_rgb_u8[-1:], t_pad - t, axis=0)], axis=0)
        video_op = np.concatenate(
            [video_op, np.repeat(video_op[-1:], t_pad - t, axis=0)], axis=0)
    return video_rgb_u8, video_op, t


def upload_video(video_rgb_u8: np.ndarray, video_op: np.ndarray,
                 flow_dtype=None):
    """Async-dispatch the per-video device transfers.

    Frames travel as uint8 (their on-disk precision) and flows as bfloat16
    by default — a bf16-computing model's first conv casts inputs to bf16
    anyway, so the host-side cast halves the PCIe bytes without changing
    what the network computes.  The cast runs via ml_dtypes (vectorized,
    ~30ms for a 180-frame video; ``jnp.asarray(..., dtype=bf16)`` is ~40x
    slower).  Pass ``flow_dtype=np.float32`` for f32-configured models.
    Returns device arrays immediately (transfers are async).
    """
    if flow_dtype is None:
        import ml_dtypes

        flow_dtype = ml_dtypes.bfloat16
    return (jax.device_put(np.ascontiguousarray(video_rgb_u8)),
            jax.device_put(video_op.astype(flow_dtype)))


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


def op_psnr_reference_bug(op_pred: jax.Array, op_input: jax.Array
                          ) -> jax.Array:
    """Reference-exact op-stream 'PSNR': the torch test loop compares the
    (1,2,h,w) prediction against the (1,3,2,h,w) INPUT stack via accidental
    broadcasting (test_helper.py:434-436 with utils.psnr_error:130-148):
    num_pixels = 2*h*w, the squared diff sums over (field, uv, h) leaving a
    per-column vector, log10, then mean.  Shape-coherent garbage, reproduced
    bit-for-bit for golden-pickle parity of the op records.

    Args: op_pred (b,h,w,2); op_input (b,h,w,6) channel-stacked 3 fields.
    """
    b, h, w, _ = op_pred.shape
    fields = op_input.astype(jnp.float32).reshape(b, h, w, 3, 2)
    pred = op_pred.astype(jnp.float32)
    gt = (fields + 1.0) / 2.0
    gen = (pred + 1.0) / 2.0
    sq = jnp.square(gt - gen[:, :, :, None, :])  # (b,h,w,3,2)
    # torch sums dims (field, uv, h) of (b,3,2,h,w) -> (b,w)
    col = jnp.sum(sq, axis=(1, 3, 4))  # (b, w)
    num_pixels = 2 * h * w
    return jnp.mean(10.0 * jnp.log10(num_pixels / col), axis=1)


def blockwise_mean(values: np.ndarray, block: int) -> np.ndarray:
    """Replace each length-`block` chunk (last chunk partial) with its mean —
    the reference's batch-replicated fea_comm (one DataLoader batch = one
    value), with partial final batches averaged over REAL members only."""
    out = np.empty_like(values)
    for start in range(0, len(values), block):
        chunk = values[start : start + block]
        out[start : start + block] = chunk.mean()
    return out


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


def _compiles_via_remote_service(variables) -> Tuple[bool, str]:
    """(verdict, what-was-sniffed) — True when programs for ``variables``'
    device compile through a remote service (the experimental 'axon' TPU
    tunnel).  Probe order: env override AMMCNET_REMOTE_COMPILE, the
    jax_default_device pin (decides jit placement; read without initializing
    any backend), device-committed leaves of ``variables``, and only as a
    last resort the default backend (which does initialize it — the backend
    the scorer is about to use anyway).  The source string is logged by
    ``score_dataset`` so a mis-detection (scorer_mode=auto silently picking
    the slower per-batch scorer on some future backend string) is diagnosable
    from the run log."""
    import os

    env = os.environ.get("AMMCNET_REMOTE_COMPILE")
    if env is not None:
        verdict = env.strip().lower() not in ("", "0", "false", "no")
        return verdict, f"env AMMCNET_REMOTE_COMPILE={env!r}"
    # a jax_default_device pin decides placement for everything jit runs
    # (and is how CPU work is pinned in this environment, where
    # JAX_PLATFORMS=cpu is inert) — read it WITHOUT initializing any
    # backend; the pinned Device object's client already exists
    try:
        pinned = jax.config.jax_default_device
    except Exception:
        pinned = None
    if pinned is not None:
        if isinstance(pinned, str):  # platform name form of the pin
            return "axon" in pinned, f"jax_default_device pin {pinned!r}"
        try:
            pv = pinned.client.platform_version
            return "axon" in pv, f"jax_default_device pin ({pv!r})"
        except Exception:
            return False, f"jax_default_device pin {pinned!r} (no client)"
    for leaf in jax.tree_util.tree_leaves(variables):
        if isinstance(leaf, jax.Array):
            try:
                dev = next(iter(leaf.devices()))
                pv = dev.client.platform_version
                return "axon" in pv, f"variables on {dev} ({pv!r})"
            except Exception:
                return False, "variables leaf device unreadable"
    # No pin and no device-committed leaf (checkpoint restores hand back
    # numpy arrays): probe the default backend the scorer is about to run
    # on anyway — jax.devices() initializes only that backend, not every
    # registered one (the trap the old xla_bridge.backends() probe had).
    try:
        dev = jax.devices()[0]
        pv = dev.client.platform_version
        return "axon" in pv, f"default backend {dev} ({pv!r})"
    except Exception as e:
        return False, f"default backend unavailable ({e!r})"


def score_dataset(
    generator,
    variables,
    rgb_root: str,
    op_root: str,
    dataset_name: str,
    clip_len_rgb: int = 5,
    clip_len_op: int = 4,
    batch_size: int = 16,
    window_batch: Optional[int] = None,
    image_size: int = 256,
    reproduce_flow_bug: bool = True,
    logger=None,
    flow_extractor: Optional[Callable] = None,
    metric: str = "psnr",
    op_metric: Optional[str] = None,
    batch_commit: bool = False,
    reproduce_op_psnr_bug: bool = False,
    use_native_loader: bool = False,
    shard_dir: Optional[str] = None,
    scorer_mode: str = "auto",
    apply_fn: Optional[Callable] = None,
) -> Tuple[Dict, float]:
    """Per-video batched scoring over a test set.

    ``flow_extractor`` (from :func:`make_otf_flow_extractor`) switches the
    motion stream to on-device FlowNet extraction; ``op_root`` is then
    ignored and no .flo files are read.

    Multi-host (``jax.process_count() > 1``): sub-videos are dealt
    round-robin across hosts (each host scores only its share), record
    shards merge through ``shard_dir`` (a path every host can reach), and
    rank 0 returns the records in global video order — other ranks return
    their local shard (callers should pickle/evaluate on rank 0 only).

    Returns (result_dict in the reference's golden-pickle schema, fps).
    """
    from concurrent.futures import ThreadPoolExecutor

    from ..data.datasets import _decode_rgb, load_flow

    if scorer_mode == "auto":
        # whole-video scoring (1 dispatch + 1 fetch per video) is the right
        # default on co-located hardware; fall back to the small per-batch
        # program when compiles go through a remote service (the 'axon'
        # tunnel in this environment), where the larger lax.map program can
        # take arbitrarily long to compile.  Probed from the
        # jax_default_device pin or the device the model variables already
        # live on (public APIs, initialize no backend; only the
        # no-pin-no-device-leaf last resort touches the default backend —
        # calling xla_bridge.backends() here would force-create the tunnel
        # client on every rank even for CPU-only evaluation).
        remote, sniffed = _compiles_via_remote_service(variables)
        scorer_mode = "batch" if remote else "video"
        if logger:
            logger.info("scorer_mode auto -> %r (remote-compile probe: %s)",
                        scorer_mode, sniffed)
    # window_batch is the per-dispatch performance knob, decoupled from
    # batch_size (the reference's DataLoader/record-granularity semantic,
    # still used by batch_commit): a whole bucket of windows per batch is
    # 27% faster device-resident (745 vs 584 windows/s, PERF.md) and the
    # scores are independent of batching.  None -> one bucket per batch
    # for the whole-video scorer; batch_size for the per-batch scorer
    # (whose dispatch count is the point of its small program).
    if window_batch is None:
        window_batch = 192 if scorer_mode == "video" else batch_size
    if scorer_mode == "video":
        scorer = make_full_video_scorer(
            generator, variables, clip_len_rgb, clip_len_op,
            window_batch=window_batch, metric=metric, op_metric=op_metric,
            reproduce_op_psnr_bug=reproduce_op_psnr_bug, apply_fn=apply_fn)
    elif scorer_mode == "batch":
        scorer = make_video_scorer(
            generator, variables, clip_len_rgb, clip_len_op,
            window_batch=window_batch, metric=metric, op_metric=op_metric,
            reproduce_op_psnr_bug=reproduce_op_psnr_bug, apply_fn=apply_fn)
    else:
        raise ValueError(f"unknown scorer_mode {scorer_mode!r} "
                         "(batch | video | auto)")
    rgb_index = VideoIndex(rgb_root)
    op_index = VideoIndex(op_root) if flow_extractor is None else None
    size = (image_size, image_size)
    pool = ThreadPoolExecutor(max_workers=8)

    native = None
    if use_native_loader:
        from ..data import native as native_mod

        native = native_mod if native_mod.available() else None

    def decode_video(name):
        if native is not None:
            frames = native.decode_video(rgb_index.videos[name], size)
        else:
            frames = np.stack(list(pool.map(lambda p: _decode_rgb(p, size),
                                            rgb_index.videos[name])))
        if flow_extractor is not None:
            # flows come from the on-device extractor; nothing to load/upload
            flows = np.zeros((1, *size, 2), np.float32)
        elif native is not None:
            flows = native.load_flow_video(op_index.videos[name], size,
                                           reproduce_flow_bug)
        else:
            flows = np.stack(list(pool.map(
                lambda p: load_flow(p, size, reproduce_flow_bug),
                op_index.videos[name])))
        return pad_video_to_bucket(frames, flows)

    result: Dict = {
        "dataset": dataset_name,
        "rgb_img_pred_records": [], "rgb_fea_comm_records": [],
        "op_img_pred_records": [], "op_fea_comm_records": [],
    }
    t0 = time.time()
    total_frames = 0
    names = rgb_index.names
    all_names = names
    multihost = jax.process_count() > 1
    if multihost:
        import os as _os

        from ..parallel.multihost import agree_on_run_token, host_shard

        if not shard_dir:
            raise ValueError(
                "multi-host evaluation needs shard_dir (a directory every "
                "host can reach) to merge the ragged per-video records")
        # fresh per-run subdirectory (token agreed while ranks are still
        # start-aligned): a rerun into the same save_dir — fewer hosts,
        # different checkpoint — can never merge another run's stale shards
        shard_dir = _os.path.join(shard_dir, f"run_{agree_on_run_token()}")
        names = host_shard(names)
        if logger:
            logger.info("host %d/%d scoring %d of %d videos",
                        jax.process_index(), jax.process_count(),
                        len(names), len(all_names))
    # three-stage pipeline: decode(i+1) on host threads || upload(i+1) to
    # device || compute(i) on chip — one jit dispatch and one result fetch
    # per video, all async so transfers and the TPU program overlap
    # flows travel at the model's compute precision (bf16 default; f32 for
    # float32-configured models so nothing is silently truncated)
    flow_dtype = (None if getattr(generator, "dtype", jnp.bfloat16)
                  == jnp.bfloat16 else np.float32)

    def upload_next(decoded):
        rgb_h, op_h, true_frames = decoded
        if flow_extractor is not None:
            if getattr(flow_extractor, "gray", False):
                # grayscale dataset: ship ONE u8 channel per frame; the
                # extract program broadcasts to the 3 identical channels a
                # color decode produces and hands back the (rgb, flows)
                # pair.  Guarded: a color video here would be scored on
                # its blue channel only, silently.
                if not np.array_equal(rgb_h[0, ..., 0], rgb_h[0, ..., -1]):
                    raise ValueError(
                        "gray_upload/on-the-fly gray extractor on a video "
                        "whose decoded channels differ — this dataset is "
                        "not grayscale; drop --gray_upload")
                v_rgb1 = jax.device_put(np.ascontiguousarray(rgb_h[..., :1]))
                v_rgb, v_op = flow_extractor(v_rgb1)
                return v_rgb, v_op, true_frames
            v_rgb = jax.device_put(np.ascontiguousarray(rgb_h))
            return v_rgb, flow_extractor(v_rgb), true_frames
        v_rgb, v_op = upload_video(rgb_h, op_h, flow_dtype)
        return v_rgb, v_op, true_frames

    if names:
        next_decoded = pool.submit(decode_video, names[0])
        current = upload_next(next_decoded.result())
        if len(names) > 1:
            next_decoded = pool.submit(decode_video, names[1])
    for vi, name in enumerate(names):
        v_rgb, v_op, num_frame = current
        n_windows = num_frame - clip_len_rgb + 1
        if scorer_mode == "video":
            launched = scorer(v_rgb, v_op)  # ONE async dispatch
        else:
            launched = launch_video_scoring(scorer, v_rgb, v_op, n_windows,
                                            window_batch)  # async dispatches
        if vi + 1 < len(names):
            current = upload_next(next_decoded.result())
            if vi + 2 < len(names):
                next_decoded = pool.submit(decode_video, names[vi + 2])
        if scorer_mode == "video":
            rgb_psnr, rgb_fea, op_psnr, op_fea = \
                np.asarray(launched)[:, :n_windows]
        else:
            rgb_psnr, rgb_fea, op_psnr, op_fea = gather_video_scores(*launched)
        if batch_commit:
            # reference-exact commit records: one batch-mean value per
            # DataLoader batch (test_helper.py:446), partial final batch
            # averaged over its real members only
            rgb_fea = blockwise_mean(rgb_fea, batch_size)
            op_fea = blockwise_mean(op_fea, batch_size)
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
    if multihost:
        from ..parallel.multihost import (consume_shard_dir,
                                          merge_record_shards, wait_for_merge,
                                          wait_for_shards, write_record_shard)

        write_record_shard(shard_dir, result, names)
        # collective-free end-of-run rendezvous: rank 0 polls for the other
        # ranks' (atomically renamed) shard files — host-side collectives
        # deadline when ranks finish minutes apart
        if jax.process_index() == 0:
            wait_for_shards(shard_dir)
            result.update(merge_record_shards(shard_dir, all_names))
            # rename-then-delete: the rename doubles as the "merge done"
            # signal the other ranks poll for, and removing the consumed
            # run_<token> dir keeps recurring evals (per-checkpoint
            # watchers) from accumulating stale shard pickles
            consume_shard_dir(shard_dir)
        else:
            # align non-rank-0 exits to rank 0's merge: an early process
            # exit hangs jax.distributed's shutdown barrier, and a second
            # eval in this process would hit agree_on_run_token's broadcast
            # with ranks minutes apart
            wait_for_merge(shard_dir)
    used = time.time() - t0
    fps = total_frames / used if used > 0 else 0.0
    if logger:
        logger.info("total time = %s, fps = %s", used, fps)
    return result, fps
