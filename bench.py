"""End-to-end inference benchmark: frames/sec/chip on a ped2-shaped test set.

Measures the BASELINE north-star — the full test-time path of
``run_test`` on one TPU chip: JPEG decode + resize + flow load on host
(threaded, overlapped with device work), one upload per video, on-device
window assembly + normalize + two-stream forward + memory addressing +
per-frame PSNR/commit scoring, and per-video record assembly.

Ped2-shaped: 12 videos x 180 frames of 256x256 RGB (synthesized, JPEG-encoded
in RAM and *decoded in the timed loop* like the reference's pipeline does
from disk) + per-video flow fields.  Reference baseline: 17.597 fps on the
authors' GPU (img/ped2.png via BASELINE.md), wall-clock including data
loading and their per-frame host PSNR loop.

Dispatch discipline (this environment talks to the chip over a tunnel where
every RPC can cost ~0.1-1 s): the 12 videos are scored in CHUNK-sized groups,
each group ONE jit dispatch (`make_multi_video_scorer` lax.maps the
video x window-batch grid inside the program); the whole pass does exactly
one device->host sync at the end.

Determinism discipline (CLAUDE.md): every program this file traces must
already be in the persistent compile cache (~/.cache/ammcnet_jax) — the
remote compile service takes 2 s-10 min for the SAME program depending on
the hour.  Exactly two programs run: `jit(gen.init)` and `jit_score_chunk`.
If the chunk program is not ready within BENCH_COMPILE_DEADLINE seconds the
bench degrades to the small cached per-batch scorer (a slower number, never
a timeout with no output).  Heartbeats go to stderr so a killed run leaves
a diagnosable tail; the ONE json line
{"metric", "value", "unit", "vs_baseline"} goes to stdout.

The reported value is the MEDIAN of BENCH_PASSES full passes (default 3) —
the pipeline must clear the target on a typical pass, not a lucky one.
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
NUM_VIDEOS = 12
FRAMES_PER_VIDEO = 180
SIZE = 256
# overridable: larger batches cut per-window overhead (64 measured 590
# windows/s device-resident vs 249 at 32); keep to shapes already in the
# persistent compile cache — this environment's remote compile service is
# high-variance
WINDOW_BATCH = int(os.environ.get("BENCH_WINDOW_BATCH", "64"))
# videos per jit dispatch: 6 -> a 12-video pass is 2 dispatches, and the
# second chunk's decode/upload overlaps the first chunk's compute
CHUNK = int(os.environ.get("BENCH_CHUNK", "6"))
# median-of-N passes (a single pass can catch a transient tunnel stall)
N_PASSES = int(os.environ.get("BENCH_PASSES", "3"))
# seconds to wait for the chunk program before degrading to the per-batch
# scorer; a cache hit takes seconds, only an (unexpected) fresh remote
# compile can exceed this
COMPILE_DEADLINE = float(os.environ.get("BENCH_COMPILE_DEADLINE", "240"))
# total wall budget for the timed passes: when the tunnel degrades (its
# device<->host bandwidth has been measured anywhere from 930 MB/s to
# 0.2 MB/s depending on the hour), report the throughput measured so far
# instead of timing out with no output
PASS_WALL_BUDGET = float(os.environ.get("BENCH_PASS_WALL_BUDGET", "300"))

_T0 = time.perf_counter()


def heartbeat(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def synth_ped2_shaped(rng: np.random.Generator):
    """12 videos of JPEG bytes + flow arrays, ped2-shaped, in RAM."""
    import cv2

    videos = []
    for _ in range(NUM_VIDEOS):
        jpegs = []
        base = rng.integers(0, 200, (SIZE, SIZE, 3), np.uint8)
        for t in range(FRAMES_PER_VIDEO):
            frame = np.roll(base, t, axis=1)
            ok, buf = cv2.imencode(".jpg", frame)
            assert ok
            jpegs.append(buf.tobytes())
        flows = rng.normal(0, 0.02, (FRAMES_PER_VIDEO - 1, SIZE, SIZE, 2)
                           ).astype(np.float32)
        videos.append((jpegs, flows))
    return videos


def _wait_with_deadline(fn, deadline_s: float, label: str):
    """Run fn() on a daemon thread, return its result or None after
    deadline_s.  A blocked remote compile cannot be cancelled from Python;
    the daemon thread lets the process move on (and exit) without it."""
    box = {}
    done = threading.Event()

    def run():
        try:
            box["result"] = fn()
        except Exception as e:  # surfaced by the caller via box
            box["error"] = e
        done.set()

    t = threading.Thread(target=run, daemon=True, name=label)
    t.start()
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

    enable_compilation_cache()

    from ammcnet_aaai2021_tpu.configs import NetConfig
    from ammcnet_aaai2021_tpu.eval.infer import (
        _assemble_records, gather_video_scores, launch_video_scoring,
        make_multi_video_scorer, make_video_scorer, pad_video_to_bucket,
        upload_video)
    from ammcnet_aaai2021_tpu.models import build_generator

    heartbeat("synthesizing ped2-shaped data (12 videos x 180 frames)")
    rng = np.random.default_rng(0)
    videos = synth_ped2_shaped(rng)

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

    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=8)

    def decode_video(video):
        jpegs, flows = video
        frames = list(pool.map(
            lambda b: cv2.cvtColor(
                cv2.imdecode(np.frombuffer(b, np.uint8), cv2.IMREAD_COLOR),
                cv2.COLOR_BGR2RGB),
            jpegs))
        rgb, op, _ = pad_video_to_bucket(np.stack(frames), flows)
        return rgb, op

    n_windows = FRAMES_PER_VIDEO - 5 + 1

    # ---- warm-up: the chunk scorer, with a deadline + fallback -----------
    heartbeat(f"warming chunk scorer (CHUNK={CHUNK}, wb={WINDOW_BATCH}, "
              f"deadline {COMPILE_DEADLINE:.0f}s)")
    scorer = make_multi_video_scorer(gen, variables,
                                     window_batch=WINDOW_BATCH)
    warm = [upload_video(*decode_video(videos[i])) for i in range(CHUNK)]

    def warm_chunk():
        out = np.asarray(scorer(tuple(r for r, _ in warm),
                                tuple(o for _, o in warm)))
        return out

    mode = "chunk"
    if _wait_with_deadline(warm_chunk, COMPILE_DEADLINE, "warm-chunk") is None:
        # the chunk program missed the deadline (fresh remote compile):
        # degrade to the small per-batch program — slower, but the bench
        # still prints a number instead of timing out silently
        heartbeat("chunk program missed deadline -> falling back to the "
                  "per-batch scorer")
        mode = "batch"
        scorer = make_video_scorer(gen, variables, window_batch=WINDOW_BATCH)

        def warm_batch():
            return gather_video_scores(*launch_video_scoring(
                scorer, warm[0][0], warm[0][1], n_windows, WINDOW_BATCH))

        if _wait_with_deadline(warm_batch, COMPILE_DEADLINE,
                               "warm-batch") is None:
            # both compiles in flight; block on the batch one — a late
            # number still beats rc=124 with an empty tail
            heartbeat("per-batch program also compiling; blocking on it")
            warm_batch()
    del warm
    heartbeat(f"warm-up done (mode={mode}); timing {N_PASSES} passes")

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
        decoded = [pool.submit(decode_video, v) for v in videos]
        launched = []
        for start in range(0, NUM_VIDEOS, CHUNK):
            chunk = [upload_video(*decoded[i].result())
                     for i in range(start, start + CHUNK)]
            launched.append(scorer(tuple(r for r, _ in chunk),
                                   tuple(o for _, o in chunk)))
            if len(launched) > 1:  # backpressure: fetch the oldest chunk
                for scores in np.asarray(launched.pop(0))[:, :, :n_windows]:
                    progress.add(consume(scores))
        for res in launched:
            for scores in np.asarray(res)[:, :, :n_windows]:
                progress.add(consume(scores))
        return progress.end_pass()

    def run_pass_batch(progress) -> float:
        progress.start_pass()
        # round-1 pacing: at most ~2 videos' uploads in flight; fetch the
        # oldest video's (small) score vectors before uploading the next —
        # bounded in-flight data keeps a degraded tunnel from serializing a
        # gigabyte of queued uploads ahead of the first result
        decoded = [pool.submit(decode_video, v) for v in videos]
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

    pass_error = []

    def run_all_passes():
        try:
            for i in range(N_PASSES):
                fps_i = run_pass(progress)
                heartbeat(f"pass {i + 1}/{N_PASSES}: {fps_i:.2f} fps")
        except Exception as e:  # surfaced by the main thread
            pass_error.append(e)
            heartbeat(f"pass failed: {e!r}")

    runner = threading.Thread(target=run_all_passes, daemon=True,
                              name="bench-passes")
    runner.start()
    runner.join(timeout=PASS_WALL_BUDGET)
    passes, frames, elapsed = progress.snapshot()
    if passes:
        fps = statistics.median(passes)
        if runner.is_alive():
            heartbeat(f"wall budget hit; reporting median of "
                      f"{len(passes)} completed pass(es)")
    elif frames:
        # tunnel too degraded to finish one pass inside the budget: report
        # the throughput actually measured so far (real frames / real time)
        fps = frames / elapsed
        heartbeat(f"wall budget hit mid-pass; partial measurement: "
                  f"{frames} frames in {elapsed:.1f}s")
    else:
        # not one video came back inside the budget — block for one full
        # pass; a late number still beats a timeout with no output
        heartbeat("no progress inside wall budget; blocking on pass 1")
        runner.join()
        passes, _, _ = progress.snapshot()
        if not passes:
            raise pass_error[0] if pass_error else RuntimeError(
                "bench passes produced no results")
        fps = statistics.median(passes)
    if pass_error and not passes:
        raise pass_error[0]
    print(json.dumps({
        "metric": "ped2_inference_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
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
        main()
