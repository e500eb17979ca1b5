"""End-to-end inference benchmark: frames/sec/chip on a ped2-shaped test set.

Measures the BASELINE north-star — the full test-time path of
``run_test`` on one TPU chip: JPEG decode + resize + flow load on host
(threaded, overlapped with device work), one upload per video, on-device
window assembly + normalize + two-stream forward + memory addressing +
per-frame PSNR/commit scoring, and per-video record assembly.

Ped2-shaped: 12 videos x 180 frames of 256x256 GRAYSCALE (ped2 is a
grayscale dataset; synthesized, JPEG-encoded in RAM and *decoded in the
timed loop* like the reference's pipeline does from disk) + per-video flow
fields.  Reference baseline: 17.597 fps on the authors' GPU (img/ped2.png
via BASELINE.md), wall-clock including data loading and their per-frame
host PSNR loop.

Dispatch discipline (this environment talks to the chip over a tunnel where
every RPC can cost ~0.1-1 s): the 12 videos are scored in CHUNK-sized groups,
each group ONE jit dispatch (`make_multi_video_scorer` lax.maps the
video x window-batch grid inside the program); the whole pass does exactly
one device->host sync at the end.

Bandwidth discipline (BENCH_OTF_FLOW=1, default): optical flow is computed
ON DEVICE by FlowNet-SD (`make_otf_flow_extractor`) from the uploaded
frames instead of shipping precomputed flow fields — flows are 50 of the
87.7 MB each video would upload, and the tunnel's *sustained* H2D bandwidth
(2-45 MB/s at most hours, PERF.md) is the end-to-end bottleneck.  This is
strictly MORE work than the reference protocol: the reference reads .flo
files that FlowNet2 computed offline (outside its 17.597 fps measurement,
`test_helper.py:485-486`), while here flow inference is inside the timed
pass.  The extract program also edge-pads the video to the 192-frame
bucket on device, so only the 180 true frames travel, and (BENCH_GRAY=1,
default — ped2 is grayscale) only ONE u8 channel per frame travels, the
device broadcasting to the 3 identical channels a color decode would
produce: 142 MB/pass total, -86% vs host flows' 1.05 GB.  BENCH_OTF_FLOW=0
restores the precomputed-flow upload path; BENCH_INT8=1 (DEFAULT since
round 5; =0 restores bf16) serves the calibrated int8 forward — see the
INT8 flag; BENCH_GRAY=0 the 3-channel (color-dataset) shape.

Determinism discipline (CLAUDE.md): every program this file traces must
already be in the persistent compile cache (~/.cache/ammcnet_jax) — the
remote compile service takes 2 s-10 min for the SAME program depending on
the hour.  Three cached programs are touched: `jit(gen.init)`,
`jit_score_chunk`, and the per-batch `jit_score_windows` fallback.  If the
chunk program is not ready within BENCH_COMPILE_DEADLINE seconds the bench
degrades to the per-batch scorer (a slower number, never a timeout with no
output); a warm execute then moves the one-time device program load out of
the timed passes.  Heartbeats go to stderr so a killed run leaves a
diagnosable tail; the ONE json line
{"metric", "value", "unit", "vs_baseline"} goes to stdout — guaranteed by
a watchdog (budget: median/partial) and an executioner (hard deadline:
partial or an honest 0.0), whatever state the tunnel is in.

The reported value is the MEDIAN of as many full passes as fit inside the
wall budget (cap BENCH_PASSES, default 24; a healthy-hour pass is ~15-60 s)
— the pipeline must clear the target on a typical pass, not a lucky one.
Pass 1 is excluded whenever a later pass completed (see ``median_fps``):
it absorbs the once-per-process device program load, which would otherwise
drag short-budget runs; with a single completed pass it IS the measurement.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import threading
import time

import numpy as np

BASELINE_FPS = 17.597  # reference ped2 inference fps (BASELINE.md)
# Workload shape, env-overridable for the OTHER deployment shapes the
# reference walks through the same loop (test_helper.py:409-417): the
# default is ped2-shaped (12 x 180 grayscale); the avenue/color shape is
# BENCH_GRAY=0 BENCH_VIDEOS=6 BENCH_FRAMES=960 BENCH_CHUNK=3 (6 long
# 3-channel videos -> the 960-frame bucket program).
NUM_VIDEOS = int(os.environ.get("BENCH_VIDEOS", "12"))
FRAMES_PER_VIDEO = int(os.environ.get("BENCH_FRAMES", "180"))
SIZE = 256
# overridable: larger batches cut per-window overhead — device-resident
# sweep (tools/device_bench.py, fetch-barriered): 584 windows/s at 64,
# 612 at 128, 745 at 192 (= the whole padded video in ONE batch, no
# lax.map iteration).  Keep to shapes already in the persistent compile
# cache — this environment's remote compile service is high-variance
WINDOW_BATCH = int(os.environ.get("BENCH_WINDOW_BATCH", "192"))
# videos per jit dispatch: 6 -> a 12-video pass is 2 dispatches, and the
# second chunk's decode/upload overlaps the first chunk's compute
CHUNK = int(os.environ.get("BENCH_CHUNK", "6"))
# cap on timed passes: the bench runs as many FULL passes as fit in the
# wall budget (a pass at a healthy hour is ~15-20 s, so ~24 fit after
# warm-up and the median draws on many steady-state samples; a single
# pass can catch a transient 300 s tunnel stall) and reports the median
N_PASSES = max(1, int(os.environ.get("BENCH_PASSES", "24")))
# seconds to wait for the chunk program before degrading to the per-batch
# scorer; a cache hit takes seconds, only an (unexpected) fresh remote
# compile or a badly degraded tunnel can exceed this
COMPILE_DEADLINE = float(os.environ.get("BENCH_COMPILE_DEADLINE", "210"))
# on-device FlowNet-SD flow extraction (see module docstring): 57% fewer
# uploaded bytes per pass; falls back to host flows if the extract program
# misses the compile deadline
OTF_FLOW = os.environ.get("BENCH_OTF_FLOW", "1") == "1"
# ped2 is a GRAYSCALE dataset (reference Dataset/readme; cv2's color decode
# of its JPEGs yields 3 identical channels).  The bench synthesizes
# grayscale JPEGs accordingly, decodes them grayscale, and in OTF mode
# uploads (180,256,256,1) u8 per video — the extract program broadcasts to
# 3 channels on device (bit-identical to uploading the 3-channel decode,
# tested).  142 MB/pass instead of 425 MB over the tunnel whose sustained
# H2D bandwidth is the end-to-end bottleneck.  BENCH_GRAY=0 restores
# 3-channel synth + upload (the avenue/color-dataset shape).
GRAY = os.environ.get("BENCH_GRAY", "1") == "1"
# BENCH_INT8=1 (DEFAULT since round 5) serves the calibrated int8 forward
# (models/quantized: BN folded, per-channel int8 weights, static activation
# scales calibrated on 8 synthetic windows — ONE jitted record pass, one
# fetch) instead of bf16.  Flipped to default after the round-5
# measurements: back-to-back same-hour medians 458-466 fps int8 vs 305 bf16
# (the device-side 1.26x shows end-to-end whenever the bulk path is
# healthy), setup cost equalized by the /tmp calibrated-variables memo
# (~16 s vs 140 s), quality tracked within 4e-4 AUC across the lam grid
# (PERF.md).  BENCH_INT8=0 restores the bf16 production scorer.
INT8 = os.environ.get("BENCH_INT8", "1") == "1"
# total wall budget for the whole bench: whatever setup/warm-up consumed,
# the timed passes get the REMAINDER (min 60 s) and then the bench reports
# the median of completed passes or the real partial measurement so far —
# when the tunnel degrades (device<->host measured anywhere from 930 MB/s
# to 0.2 MB/s by hour) the JSON line still prints inside a ~600 s driver
# timeout instead of rc=124 with an empty tail
TOTAL_WALL_BUDGET = float(os.environ.get("BENCH_TOTAL_WALL_BUDGET", "480"))
# ZERO_GRACE after the budget, the executioner thread emits unconditionally
# (real partial rate, or 0.0 for a fully unresponsive tunnel) and exits 0;
# budget + grace must stay under the driver's timeout
ZERO_GRACE = float(os.environ.get("BENCH_ZERO_GRACE", "60"))
# when the one-time warm execute overruns its deadline (a degraded-hour
# program load, not a throughput cost), up to this many seconds of the
# overrun are credited back to the pass phase so the reported median rests
# on more steady-state samples (VERDICT r4 weak-4 / item 8)
WARM_CREDIT = float(os.environ.get("BENCH_WARM_CREDIT", "60"))

_T0 = time.perf_counter()


def heartbeat(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


# ---- output guarantee, process-wide ------------------------------------
# emit() prints the ONE json line exactly once across every thread (main,
# watchdog, executioner, early guard) and across the transient-retry path.
_EMIT_LOCK = threading.Lock()
_EMITTED: list = []
# main() parks its live (progress, micro_progress) pair here so the early
# guard can report real partial data even for a hang it didn't anticipate
_PROGRESS_REF: list = []


def median_fps(passes) -> float:
    """The reported statistic: median of completed passes EXCLUDING pass 1
    whenever at least one later pass completed.

    Pass 1 absorbs the one-time device program load (measured: a 3-minute
    warm execute tail landed in pass 1 at 31 fps where passes 2+ ran
    387-410, PERF.md 06:55 row) — on long runs the median discards it
    naturally, but a short-budget driver run with 2-3 passes would be
    dragged by a cost that is paid once per process, not per pass.  With
    only one completed pass it IS the measurement (load included — honest
    partial).  Rule recorded in PERF.md round-5 notes."""
    if len(passes) > 1:
        passes = passes[1:]
    return statistics.median(passes)


def emit(fps: float) -> None:
    # print INSIDE the lock: losing emitters (watchdog/executioner/early
    # guard) call os._exit right after their no-op emit, and that no-op
    # must not return until the winner's line has actually been flushed
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED.append(fps)
        print(json.dumps({
            "metric": "ped2_inference_frames_per_sec_per_chip",
            "value": round(fps, 2),
            "unit": "frames/sec/chip",
            "vs_baseline": round(fps / BASELINE_FPS, 2),
        }), flush=True)


def _early_guard() -> None:
    """Covers the window the in-main watchdog/executioner cannot: a tunnel
    hang during import/init/warm-up, BEFORE those threads exist (and during
    the transient retry's setup).  At the absolute deadline, emit the best
    real data available — or an honest 0.0 — and exit 0; the driver must
    never see rc=124 with no JSON line."""
    deadline = _T0 + TOTAL_WALL_BUDGET + ZERO_GRACE + 30.0
    while True:
        time.sleep(max(1.0, min(30.0, deadline - time.perf_counter())))
        if _EMITTED:
            return
        if time.perf_counter() < deadline:
            continue
        for prog in _PROGRESS_REF:
            passes, frames, elapsed = prog.snapshot()
            if passes:
                emit(median_fps(passes))
                os._exit(0)
            if frames and elapsed > 0:
                emit(frames / elapsed)
                os._exit(0)
        heartbeat("absolute deadline during setup/retry with no progress; "
                  "emitting 0.0")
        emit(0.0)
        os._exit(0)


def synth_ped2_shaped(seed: int = 0):
    """12 videos of JPEG bytes + flow arrays, ped2-shaped, in RAM.

    One video's JPEG bytes + one flow stack are synthesized and shared by
    all 12 videos: per-pass decode/upload/compute cost is identical either
    way (the pipeline is content-oblivious — every video is still decoded,
    cast, and uploaded separately in the timed loop), and one-time setup
    drops 12x (this host's CPU intermittently degrades with the tunnel;
    synth once measured 145 s — setup time must never eat the driver's
    run budget).  The JPEG bytes are additionally memoized to /tmp keyed by
    (seed, shape): the 180-encode loop alone measured 23 s at a degraded
    host moment, and re-synthesizing identical bytes every run only burns
    pass budget.  In OTF mode the flow stack is never read (flows come from
    FlowNet on device), so its synthesis is skipped."""
    import cv2

    rng = np.random.default_rng(seed)
    memo = (f"/tmp/ammcnet_bench_synth_s{seed}_{FRAMES_PER_VIDEO}x{SIZE}"
            f"{'_gray' if GRAY else ''}.npz")
    jpegs = None
    try:
        with np.load(memo, allow_pickle=False) as z:
            jpegs = [z[f"j{t}"].tobytes() for t in range(FRAMES_PER_VIDEO)]
    except Exception:  # missing/corrupt memo (BadZipFile, KeyError, OSError):
        jpegs = None   # re-synthesize; never let a stale /tmp file kill bench
    if jpegs is None:
        jpegs = []
        base = (rng.integers(0, 200, (SIZE, SIZE), np.uint8) if GRAY else
                rng.integers(0, 200, (SIZE, SIZE, 3), np.uint8))
        for t in range(FRAMES_PER_VIDEO):
            frame = np.roll(base, t, axis=1)
            ok, buf = cv2.imencode(".jpg", frame)
            assert ok
            jpegs.append(buf.tobytes())
        try:
            np.savez(memo + f".tmp{os.getpid()}",
                     **{f"j{t}": np.frombuffer(b, np.uint8)
                        for t, b in enumerate(jpegs)})
            os.replace(memo + f".tmp{os.getpid()}.npz", memo)
        except OSError:
            pass
    else:
        rng.integers(0, 200, (SIZE, SIZE) if GRAY else (SIZE, SIZE, 3),
                     np.uint8)  # keep rng stream aligned with the synth branch
    flows = (np.zeros((FRAMES_PER_VIDEO - 1, SIZE, SIZE, 2), np.float32)
             if OTF_FLOW else
             rng.normal(0, 0.02, (FRAMES_PER_VIDEO - 1, SIZE, SIZE, 2)
                        ).astype(np.float32))
    return [(jpegs, flows)] * NUM_VIDEOS


def _start_task(fn, label: str):
    """Run fn() on a daemon thread; returns (done_event, box).  A blocked
    remote compile/execute cannot be cancelled from Python; the daemon
    thread lets the process move on (and exit) without it, while the event
    lets a caller keep re-waiting on the SAME in-flight work."""
    box = {}
    done = threading.Event()

    def run():
        try:
            box["result"] = fn()
        except Exception as e:  # surfaced by the caller via box
            box["error"] = e
        done.set()

    threading.Thread(target=run, daemon=True, name=label).start()
    return done, box


def _wait_with_deadline(fn, deadline_s: float, label: str):
    """Run fn() on a daemon thread, return its result or None after
    deadline_s."""
    done, box = _start_task(fn, label)
    done.wait(timeout=deadline_s)
    if "error" in box:
        raise box["error"]
    return box.get("result")


def main() -> None:
    assert NUM_VIDEOS % CHUNK == 0, (
        f"BENCH_CHUNK={CHUNK} must divide NUM_VIDEOS={NUM_VIDEOS}: a ragged "
        "last chunk would index past the video list AND compile a second "
        "program shape")
    import cv2
    import jax
    import jax.numpy as jnp

    from ammcnet_aaai2021_tpu.utils.compile_cache import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    # pre-flight cache presence (ADVICE r2): a host reset can WIPE the
    # persistent cache (observed 2026-08-19) — say so up front, because a
    # cold cache turns the AOT warm-up into fresh remote compiles and the
    # eventual number/fallback is then about compile latency, not the
    # pipeline.  Diagnostic only: the deadline+fallback+watchdog chain
    # already guarantees the JSON line either way.
    try:
        progs = {f.split("-")[0] for f in os.listdir(cache_dir)
                 if f.endswith("-cache")}
        need = {"jit_init", "jit_score_chunk", "jit_score_windows"}
        if OTF_FLOW:
            need.add("jit_extract")
        missing = sorted(need - progs)
        # name-level check only: two programs of one kind (e.g. the
        # generator's and FlowNet's jit_init) share a prefix, so "present"
        # can be optimistic about exact hashes — the AOT warm-up below is
        # the authoritative per-hash hit/miss signal
        heartbeat(f"compile cache: {len(progs)} program kinds at {cache_dir}"
                  + (f"; COLD for {missing} — expect fresh remote compiles"
                     if missing else "; all bench program kinds present "
                     "(name-level check; warm-up timings are authoritative)"))
    except OSError as e:
        heartbeat(f"compile cache unreadable ({e}); proceeding")

    from ammcnet_aaai2021_tpu.configs import NetConfig
    from ammcnet_aaai2021_tpu.eval.infer import (
        _assemble_records, gather_video_scores, launch_video_scoring,
        make_multi_video_scorer, make_video_scorer, pad_video_to_bucket,
        upload_video)
    from ammcnet_aaai2021_tpu.models import build_generator

    heartbeat(f"synthesizing data ({NUM_VIDEOS} videos x {FRAMES_PER_VIDEO} "
              f"frames, {'gray' if GRAY else '3-channel'})")
    videos = synth_ped2_shaped(seed=0)

    heartbeat("init model (one jitted program)")
    cfg = NetConfig()  # released config: bf16 compute, Pallas memory kernel
    gen = build_generator(cfg, per_sample_diff=True)
    # jit the init: eager flax init dispatches every conv as its own program
    # through the remote compile service; jitted it is ONE cached program
    variables = jax.jit(gen.init)({"params": jax.random.PRNGKey(0)},
                                  jnp.zeros((1, SIZE, SIZE, 12)),
                                  jnp.zeros((1, SIZE, SIZE, 6)))
    jax.block_until_ready(variables)
    heartbeat("model ready")

    apply_fn = None
    if INT8:
        from ammcnet_aaai2021_tpu.models.quantized import (
            calibrate_act_scales, make_quantized_forward,
            quantize_twostream_variables)

        apply_fn = make_quantized_forward(
            embed_dim=cfg.embed_dim, n_embed=cfg.n_embed, k=cfg.k,
            per_sample_diff=True, use_pallas=cfg.use_pallas_memory)
        # the calibrated variables are DETERMINISTIC (gen.init PRNGKey(0) +
        # fixed synthetic calibration windows), and computing them fresh
        # measured 140 s per process even with every program cached (host
        # BN-fold/quantize on the 1-core CPU + record pass) — memoize them
        # to /tmp like the synth JPEG bytes, keyed by shape AND a source
        # hash of models/quantized.py so a code change can never serve a
        # stale quantization
        import hashlib
        import pickle

        from ammcnet_aaai2021_tpu.models import quantized as _qmod

        src_h = hashlib.sha256(
            open(_qmod.__file__, "rb").read()).hexdigest()[:12]
        memo = (f"/tmp/ammcnet_bench_int8vars_{SIZE}_{cfg.embed_dim}_"
                f"{cfg.n_embed}_{cfg.k}_{src_h}.pkl")
        host_vars = None
        try:
            with open(memo, "rb") as fh:
                host_vars = pickle.load(fh)
        except Exception:  # missing/corrupt memo: recompute, never crash
            host_vars = None
        if host_vars is not None:
            variables = jax.tree.map(jnp.asarray, host_vars)
            heartbeat("int8: calibrated variables from memo (BN-fold + "
                      "quantize + record pass skipped)")
        else:
            # heartbeat BEFORE the slow pieces: after a cache wipe the
            # record pass + quantized programs recompile remotely (observed
            # 2026-08-21: 555 silent seconds before the honest-0.0 deadline
            # — the wipe recovery re-lands only the default-env programs,
            # so the FIRST BENCH_INT8=1 run after a wipe pays the compiles)
            heartbeat("int8: folding BN + quantizing weights, then the "
                      "jitted calibration record pass (slow on a cold "
                      "cache)")
            qvars = quantize_twostream_variables(variables)
            # 8 calibration windows synthesized ON DEVICE (scales only need
            # the data distribution; the record pass is one jitted program
            # + one fetch — models/quantized.calibrate_act_scales)
            kr, kf = jax.random.split(jax.random.PRNGKey(2))
            rgb_w = (jax.random.randint(kr, (8, SIZE, SIZE, 15), 0, 255,
                                        jnp.uint8).astype(jnp.float32)
                     / 255.0 - 0.5) / 0.5
            op_w = jax.random.normal(kf, (8, SIZE, SIZE, 8),
                                     jnp.bfloat16) * 0.02
            variables = calibrate_act_scales(
                apply_fn, qvars, [(rgb_w[..., :12], op_w[..., :6])])
            heartbeat("int8: BN folded, weights quantized, 40 activation "
                      "scales calibrated (one jitted pass)")
            try:
                host = jax.tree.map(np.asarray, variables)
                tmp = memo + f".tmp{os.getpid()}"
                with open(tmp, "wb") as fh:
                    pickle.dump(host, fh, pickle.HIGHEST_PROTOCOL)
                os.replace(tmp, memo)
            except Exception as e:  # memo is an optimization, never fatal
                heartbeat(f"int8 memo write skipped ({e!r})")

    import ml_dtypes

    t_pad = -(-FRAMES_PER_VIDEO // 64) * 64  # whole-video bucket (192)
    extractor = None
    if OTF_FLOW:
        heartbeat("init FlowNet-SD on CPU; uploading bf16 weights "
                  "(~90 MB, one-time, outside the timed passes)")
        from ammcnet_aaai2021_tpu.eval.infer import make_otf_flow_extractor
        from ammcnet_aaai2021_tpu.models.flownet_sd import FlowNet2SD

        flownet = FlowNet2SD()
        with jax.default_device(jax.devices("cpu")[0]):
            # CPU compiles are LOCAL (only TPU programs go through the
            # remote service) and conv param shapes don't depend on spatial
            # dims, so a 64x64 init builds the full 45M-param tree fast
            flow_vars = jax.jit(flownet.init)(
                {"params": jax.random.PRNGKey(1)},
                jnp.zeros((1, 64, 64, 3, 2)))
        # bf16 on host BEFORE the put: halves the one-time upload and makes
        # the extract program's cache key param-dtype-stable
        flow_vars = jax.device_put(jax.tree.map(
            lambda a: (np.asarray(a).astype(ml_dtypes.bfloat16)
                       if np.asarray(a).dtype == np.float32
                       else np.asarray(a)), flow_vars))
        # pad_to: only the 180 true frames travel; the extract program
        # edge-pads to the 192-frame bucket on device (another 6% off the
        # pass's uploaded bytes) and hands the scorer the padded pair
        # gray=GRAY: ped2 is grayscale, so only ONE channel travels per
        # frame; the extract program broadcasts u8 (t,h,w,1)->(t,h,w,3) on
        # device before padding/FlowNet (bit-identical inputs, tested)
        extractor = make_otf_flow_extractor(flownet, flow_vars,
                                            pad_to=t_pad, gray=GRAY)

    from concurrent.futures import ThreadPoolExecutor

    # TWO pools: videos fan out on video_pool, frames decode on frame_pool.
    # One shared pool deadlocks — 12 submitted decode_video tasks occupy
    # every worker, then each blocks on frame decodes queued behind them
    # (observed live: a pass that runs in ~90 s stalled at 0 videos for
    # 580 s until the wall budget fired).  Pool sizes follow the host's
    # core count: on a 1-core host 12 threads trading the GIL around ~1 ms
    # cv2 calls convoy catastrophically (measured 219 s for decodes that
    # run in 2.4 s on one thread); decode parallelism only exists to use
    # real cores and to overlap the device phase — one thread does both
    # when one core is all there is.
    n_cpu = os.cpu_count() or 1
    video_pool = ThreadPoolExecutor(max_workers=1 if n_cpu <= 2 else 4)
    frame_pool = (None if n_cpu <= 2 else
                  ThreadPoolExecutor(max_workers=min(8, n_cpu)))

    def _decode_frame(b):
        if GRAY:
            # grayscale JPEG: one-channel decode; the device broadcasts to
            # the 3 identical channels a color decode would produce
            return cv2.imdecode(np.frombuffer(b, np.uint8),
                                cv2.IMREAD_GRAYSCALE)[..., None]
        return cv2.cvtColor(
            cv2.imdecode(np.frombuffer(b, np.uint8), cv2.IMREAD_COLOR),
            cv2.COLOR_BGR2RGB)

    def decode_video(video, with_flows=True):
        jpegs, flows = video
        frames = (list(map(_decode_frame, jpegs)) if frame_pool is None
                  else list(frame_pool.map(_decode_frame, jpegs)))
        if not with_flows:
            # OTF mode: upload the TRUE frames only — the extract program
            # edge-pads to the bucket on device and supplies the flows
            # (and, when GRAY, broadcasts the single uploaded channel to 3)
            return np.stack(frames), None
        rgb = np.stack(frames)
        if GRAY:  # host-flow fallback uploads the scorer's 3-channel shape
            rgb = np.broadcast_to(rgb, (*rgb.shape[:-1], 3))
        rgb, op, _ = pad_video_to_bucket(rgb, flows)
        return rgb, op

    n_windows = FRAMES_PER_VIDEO - 5 + 1

    # ---- warm-up: AOT-compile ALL scorer programs in parallel ------------
    # .lower().compile() is compile-only: no video decode, no uploads, no
    # chip execution — the deadline bounds exactly the remote compile.  The
    # chunk, per-batch, and flow-extract programs compile concurrently (the
    # remote service queues them), so a chunk miss falls back to an
    # already-compiling (or already-cached) per-batch program instead of
    # starting a second wait, and an extract miss falls back to host flows.
    # Pass 1 absorbs the one-time program load; the median discards it.
    heartbeat(f"AOT-compiling scorers (CHUNK={CHUNK}, wb={WINDOW_BATCH}, "
              f"otf={OTF_FLOW}, deadline {COMPILE_DEADLINE:.0f}s)")
    scorer = make_multi_video_scorer(gen, variables,
                                     window_batch=WINDOW_BATCH,
                                     apply_fn=apply_fn)
    batch_scorer = make_video_scorer(gen, variables,
                                     window_batch=WINDOW_BATCH,
                                     apply_fn=apply_fn)
    rgb_sds = jax.ShapeDtypeStruct((t_pad, SIZE, SIZE, 3), jnp.uint8)
    # the extract program's input is what actually travels: 1 channel for
    # grayscale datasets, 3 for color (its output to the scorer is always
    # the padded 3-channel device array, so the scorer programs are
    # GRAY-oblivious)
    rgb_exact_sds = jax.ShapeDtypeStruct(
        (FRAMES_PER_VIDEO, SIZE, SIZE, 1 if GRAY else 3), jnp.uint8)
    op_sds = jax.ShapeDtypeStruct((t_pad - 1, SIZE, SIZE, 2),
                                  ml_dtypes.bfloat16)

    def compile_chunk():
        return scorer.jitted.lower(variables, (rgb_sds,) * CHUNK,
                                   (op_sds,) * CHUNK).compile()

    def compile_batch():
        idx_sds = jax.ShapeDtypeStruct((WINDOW_BATCH,), jnp.int32)
        return batch_scorer.jitted.lower(variables, rgb_sds, op_sds,
                                         idx_sds).compile()

    def compile_extract():
        fv_sds = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
            extractor.variables)
        return extractor.jitted.lower(fv_sds, rgb_exact_sds).compile()

    batch_box = {}
    batch_thread = threading.Thread(
        target=lambda: batch_box.update(done=compile_batch()),
        daemon=True, name="compile-batch")
    batch_thread.start()
    extract_box = {}
    if extractor is not None:
        def _run_compile_extract():
            try:
                extract_box["done"] = compile_extract()
            except Exception as e:
                extract_box["error"] = e
                heartbeat(f"flow-extract compile failed: {e!r}")
        threading.Thread(target=_run_compile_extract, daemon=True,
                         name="compile-extract").start()
    mode = "chunk"
    t_aot = time.perf_counter()
    if _wait_with_deadline(compile_chunk, COMPILE_DEADLINE,
                           "compile-chunk") is None:
        heartbeat("chunk program missed the compile deadline -> per-batch "
                  "scorer")
        mode = "batch"
        scorer = batch_scorer
        batch_thread.join(timeout=max(30.0, COMPILE_DEADLINE / 2))
        if "done" not in batch_box:
            heartbeat("per-batch program still compiling; proceeding — "
                      "pass 1 will block on it")
    else:
        heartbeat(f"chunk program ready ({time.perf_counter() - t_aot:.1f}s)")
    otf = extractor is not None and mode == "chunk"
    if otf:
        t_wait = time.perf_counter()
        while ("done" not in extract_box and "error" not in extract_box
               and time.perf_counter() - t_wait < COMPILE_DEADLINE):
            time.sleep(1.0)
        if "done" not in extract_box:
            heartbeat("flow-extract program unavailable -> host flows")
            otf = False
        else:
            heartbeat("flow-extract program ready "
                      f"(+{time.perf_counter() - t_wait:.1f}s)")

    # One completed execute on zero inputs moves the one-time program load
    # onto the chip out of the timed passes (measured: first execute
    # 119-148 s vs ~10 s steady on a degraded tunnel).  The barrier MUST
    # be a result fetch — this environment's block_until_ready acks
    # without waiting for execution (or delivery), which is why earlier
    # "warm executes" finished in 1 s and pass 1 still paid the load.
    def warm_execute():
        # in OTF mode this also barriers the one-time FlowNet weight upload
        # and warms the extract(+pad) program on the chip.  The video comes
        # from a HOST array (device_put, not jnp.zeros): pass 1 was
        # consistently the slowest pass (29-48 fps vs 100+ steady) until the
        # warm also exercised a real host->device transfer of the video
        # shape, initializing the tunnel's bulk-transfer path
        if otf:
            z_rgb, z_op = extractor(jax.device_put(
                np.zeros((FRAMES_PER_VIDEO, SIZE, SIZE, 1 if GRAY else 3),
                         np.uint8)))
        else:
            z_rgb = jax.device_put(np.zeros((t_pad, SIZE, SIZE, 3),
                                            np.uint8))
            z_op = jnp.zeros((t_pad - 1, SIZE, SIZE, 2), jnp.bfloat16)
        if mode == "chunk":
            out = scorer((z_rgb,) * CHUNK, (z_op,) * CHUNK)
        else:
            out = scorer(z_rgb, z_op, jnp.arange(WINDOW_BATCH,
                                                 dtype=jnp.int32))
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # tiny fetch barrier
        return True

    t_warm = time.perf_counter()
    # reserve pass time: the three warm-up waits (chunk compile, extract,
    # warm execute) are serial — at full COMPILE_DEADLINE each they could
    # eat 3x210 s of a 480 s budget and leave ZERO passes.  The warm
    # execute's deadline shrinks to keep >=150 s of pass budget (a
    # cut-short warm just means pass 1 absorbs the remaining load).
    warm_deadline = max(30.0, min(
        COMPILE_DEADLINE,
        TOTAL_WALL_BUDGET - (time.perf_counter() - _T0) - 150.0))
    heartbeat("warm execute (one-time device program load + weight-upload "
              f"barrier; deadline {warm_deadline:.0f}s)")
    warm_done, warm_box = _start_task(warm_execute, "warm-execute")
    warm_overrun = 0.0
    if not warm_done.wait(timeout=warm_deadline):
        # BENCH_r04: the one-time load ran ~450 s at a degraded hour, pass 1
        # absorbed it (8.93 fps) and only 3 steady passes fit the budget.
        # Keep absorbing the load HERE instead — as long as >=90 s of pass
        # budget remains — so every timed pass is a steady-state sample,
        # and credit back up to BENCH_WARM_CREDIT seconds of the overrun to
        # the pass phase (the load is a one-time cost, not throughput).
        heartbeat("warm execute over deadline; keep absorbing the load so "
                  "pass 1 starts clean")
        while not warm_done.wait(timeout=10.0):
            remaining = TOTAL_WALL_BUDGET - (time.perf_counter() - _T0)
            if remaining <= 90.0:
                heartbeat("load still in flight with <=90s budget left; "
                          "pass 1 will absorb it")
                break
        warm_overrun = time.perf_counter() - t_warm - warm_deadline
        if warm_done.is_set():
            heartbeat(f"load absorbed {warm_overrun:.1f}s past the "
                      "deadline; passes start clean")
    else:
        heartbeat(f"warm execute done ({time.perf_counter() - t_warm:.1f}s)")
    if "error" in warm_box:
        raise warm_box["error"]
    heartbeat(f"warm-up done (mode={mode}, otf={otf}); "
              f"timing {N_PASSES} passes")

    class Progress:
        """Shared pass-progress so the main thread can report a REAL measured
        throughput even if the tunnel degrades mid-pass (device<->host has
        been observed anywhere from 930 MB/s to 0.2 MB/s by hour)."""

        def __init__(self):
            self.lock = threading.Lock()
            self.t0 = None
            self.frames = 0
            self.passes = []

        def start_pass(self):
            with self.lock:
                self.t0 = time.perf_counter()
                self.frames = 0

        def add(self, n):
            with self.lock:
                self.frames += n

        def end_pass(self):
            with self.lock:
                fps = self.frames / (time.perf_counter() - self.t0)
                self.passes.append(fps)
                return fps

        def snapshot(self):
            with self.lock:
                elapsed = (time.perf_counter() - self.t0) if self.t0 else 0.0
                return list(self.passes), self.frames, elapsed

    def consume(scores_4xN):
        rgb_psnr, rgb_fea, op_psnr, op_fea = scores_4xN
        _assemble_records(rgb_psnr, FRAMES_PER_VIDEO, 5)
        _assemble_records(rgb_fea, FRAMES_PER_VIDEO, 5)
        _assemble_records(op_psnr, FRAMES_PER_VIDEO, 4)
        _assemble_records(op_fea, FRAMES_PER_VIDEO, 4)
        return len(rgb_psnr)

    def run_pass_chunk(progress) -> float:
        progress.start_pass()
        # pipeline: decode on host threads || per-video async uploads ||
        # one dispatch per CHUNK videos (chunk 2's host work overlaps chunk
        # 1's compute).  One stacked fetch per chunk (small: 4 score vectors
        # per video) so progress is observable under tunnel degradation.
        # OTF mode: only the u8 frames travel; flows are FlowNet-SD outputs
        # computed (async-dispatched) on device.
        decoded = [video_pool.submit(decode_video, v, not otf)
                   for v in videos]
        launched = []
        for start in range(0, NUM_VIDEOS, CHUNK):
            if otf:
                # upload the true frames; extract returns the device-padded
                # (rgb, flows) pair the bucket-shaped scorer consumes
                chunk = [extractor(jax.device_put(decoded[i].result()[0]))
                         for i in range(start, start + CHUNK)]
            else:
                chunk = [upload_video(*decoded[i].result())
                         for i in range(start, start + CHUNK)]
            launched.append(scorer(tuple(r for r, _ in chunk),
                                   tuple(o for _, o in chunk)))
            heartbeat(f"  chunk {start // CHUNK + 1} dispatched")
            if len(launched) > 1:  # backpressure: fetch the oldest chunk
                for scores in np.asarray(launched.pop(0))[:, :, :n_windows]:
                    progress.add(consume(scores))
                heartbeat("  chunk fetched")
        for res in launched:
            for scores in np.asarray(res)[:, :, :n_windows]:
                progress.add(consume(scores))
            heartbeat("  chunk fetched")
        return progress.end_pass()

    def run_pass_batch(progress) -> float:
        progress.start_pass()
        # round-1 pacing: at most ~2 videos' uploads in flight; fetch the
        # oldest video's (small) score vectors before uploading the next —
        # bounded in-flight data keeps a degraded tunnel from serializing a
        # gigabyte of queued uploads ahead of the first result
        decoded = [video_pool.submit(decode_video, v) for v in videos]
        inflight = []
        for i in range(NUM_VIDEOS):
            v_rgb, v_op = upload_video(*decoded[i].result())
            inflight.append(launch_video_scoring(scorer, v_rgb, v_op,
                                                 n_windows, WINDOW_BATCH))
            if len(inflight) > 2:
                progress.add(consume(gather_video_scores(*inflight.pop(0))))
        for res in inflight:
            progress.add(consume(gather_video_scores(*res)))
        return progress.end_pass()

    run_pass = run_pass_chunk if mode == "chunk" else run_pass_batch
    progress = Progress()

    # Passes run on the MAIN thread (the axon tunnel client's measured-fast
    # path; probe 2026-08-17: same chunk pattern fetched in 84s main-thread
    # vs 222s from a worker thread).  The wall budget is enforced by a
    # watchdog that, once the budget expires AND at least one video has been
    # scored, emits the JSON from the live progress snapshot and exits the
    # process — a degraded tunnel degrades the number, never the output.
    pass_budget = max(60.0, TOTAL_WALL_BUDGET - (time.perf_counter() - _T0))
    if warm_overrun > 0:
        # the one-time program load overran into the pass phase: credit a
        # bounded slice of it back so the median rests on more steady
        # samples (BENCH_r04 rested on 3).  Worst-case process lifetime is
        # TOTAL_WALL_BUDGET + WARM_CREDIT + ZERO_GRACE = 600 s at defaults —
        # still far under the driver's observed tolerance.
        credit = min(warm_overrun, WARM_CREDIT)
        pass_budget += credit
        heartbeat(f"warm overran {warm_overrun:.1f}s; crediting "
                  f"{credit:.0f}s back to the pass budget")
    cancelled = threading.Event()  # set when main emits/raises: exactly ONE
    # JSON line ever prints, even on the transient-retry path

    # the micro path gets its OWN Progress: it must never reset the main
    # pass's t0/frames (a stalled-then-recovered main pass would otherwise
    # report frames over the post-reset elapsed time — inflated fps)
    micro_progress = Progress()
    _PROGRESS_REF[:] = [progress, micro_progress]  # early guard visibility

    def micro_measure():
        """Last resort when the chunk path returned nothing inside the
        budget: score window batches of one video through the (small,
        cached) per-batch program, adding REAL frames to micro_progress as
        each batch lands.  The executioner emits whatever this measured."""
        rgb, op = decode_video(videos[0], not otf)
        if otf:
            v_rgb, v_op = extractor(jax.device_put(rgb))
        else:
            v_rgb, v_op = upload_video(rgb, op)
        micro_progress.start_pass()
        for start in range(0, n_windows, WINDOW_BATCH):
            idx = np.arange(start, min(start + WINDOW_BATCH, n_windows))
            actual = len(idx)
            if actual < WINDOW_BATCH:
                idx = np.pad(idx, (0, WINDOW_BATCH - actual), mode="edge")
            out = batch_scorer(v_rgb, v_op, jnp.asarray(idx))
            np.asarray(out[0])
            micro_progress.add(actual)
            heartbeat(f"  micro: {start + actual}/{n_windows} windows")
        # record the finished micro pass so the executioner reports its
        # real rate, not frames diluted over idle time until the deadline
        micro_progress.end_pass()

    def watchdog():
        deadline = time.monotonic() + pass_budget
        while not cancelled.is_set():
            remaining = deadline - time.monotonic()
            time.sleep(min(10.0, remaining) if remaining > 0 else 10.0)
            if cancelled.is_set():
                return
            if time.monotonic() < deadline:
                continue
            passes, frames, elapsed = progress.snapshot()
            if passes:
                heartbeat(f"wall budget hit; reporting median of "
                          f"{len(passes)} completed pass(es)")
                emit(median_fps(passes))
                os._exit(0)
            if frames:
                # tunnel too degraded to finish one pass inside the budget:
                # report the real partial measurement (frames seen / time)
                heartbeat(f"wall budget hit mid-pass; partial measurement: "
                          f"{frames} frames in {elapsed:.1f}s")
                emit(frames / elapsed)
                os._exit(0)
            # not one video back inside the budget: the executioner emits at
            # the hard deadline no matter what; meanwhile try the micro
            # per-batch measurement so it has real frames to report
            heartbeat("wall budget hit with zero videos scored; micro "
                      "measurement until the hard deadline")
            try:
                micro_measure()
            except Exception as e:  # executioner still emits at deadline
                heartbeat(f"micro measurement failed: {e!r}")
            return

    def executioner():
        """Absolute output guarantee: ZERO_GRACE after the wall budget, emit
        whatever progress exists (a real partial rate, or an honest 0.0 for
        a dead tunnel) and exit 0 — the driver must never see rc=124 with
        an empty tail again (BENCH_r02)."""
        time.sleep(pass_budget + ZERO_GRACE)
        if cancelled.is_set():
            return
        passes, frames, elapsed = progress.snapshot()
        m_passes, m_frames, m_elapsed = micro_progress.snapshot()
        if passes:
            emit(median_fps(passes))
        elif frames and elapsed > 0:
            heartbeat(f"hard deadline; partial: {frames} frames in "
                      f"{elapsed:.1f}s")
            emit(frames / elapsed)
        elif m_passes:
            heartbeat(f"hard deadline; completed micro measurement: "
                      f"{m_passes[-1]:.2f} fps")
            emit(m_passes[-1])
        elif m_frames and m_elapsed > 0:
            heartbeat(f"hard deadline; micro measurement: {m_frames} "
                      f"frames in {m_elapsed:.1f}s")
            emit(m_frames / m_elapsed)
        else:
            heartbeat("hard deadline with zero device progress — tunnel "
                      "unresponsive; emitting 0.0")
            emit(0.0)
        os._exit(0)

    threading.Thread(target=watchdog, daemon=True, name="watchdog").start()
    threading.Thread(target=executioner, daemon=True,
                     name="executioner").start()

    try:
        # keep attempting passes until the cap — the watchdog owns the
        # budget, and an extra attempt can only ADD a completed pass to
        # the median (an unfinished one is simply not counted), so there
        # is nothing to gain by stopping early
        for i in range(N_PASSES):
            fps_i = run_pass(progress)
            heartbeat(f"pass {i + 1} (cap {N_PASSES}): {fps_i:.2f} fps")
        passes, _, _ = progress.snapshot()
        cancelled.set()
        emit(median_fps(passes))
    finally:
        cancelled.set()


if __name__ == "__main__":
    threading.Thread(target=_early_guard, daemon=True,
                     name="early-guard").start()
    try:
        main()
    except Exception as e:  # retry ONLY transient tunnel/RPC failures —
        # a real regression (shape error, broken scorer) must surface
        import jax

        transient = isinstance(e, (jax.errors.JaxRuntimeError, OSError,
                                   ConnectionError))
        if not transient:
            raise
        import traceback

        traceback.print_exc()
        heartbeat("transient device error; retrying once in 10s")
        time.sleep(10)
        try:
            main()
        except Exception:
            # second failure: the output contract still holds — report the
            # best real partial measurement either attempt made, else an
            # honest 0.0, and exit 0 (never rc!=0 with no JSON line)
            traceback.print_exc()
            for prog in _PROGRESS_REF:
                passes, frames, elapsed = prog.snapshot()
                if passes:
                    emit(median_fps(passes))
                    os._exit(0)
                if frames and elapsed > 0:
                    emit(frames / elapsed)
                    os._exit(0)
            heartbeat("second device failure with no progress; emitting 0.0")
            emit(0.0)
            os._exit(0)
