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
one device->host sync at the end.  A ped2 pass is 2 dispatches + 1 fetch.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
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
# best-of-N passes (default 1: the pipeline must clear the target on a
# median pass, not a lucky one)
N_PASSES = int(os.environ.get("BENCH_PASSES", "1"))


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


def main() -> None:
    import cv2
    import jax
    import jax.numpy as jnp

    from ammcnet_aaai2021_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from ammcnet_aaai2021_tpu.configs import NetConfig
    from ammcnet_aaai2021_tpu.eval.infer import (
        _assemble_records, make_multi_video_scorer, pad_video_to_bucket,
        upload_video)
    from ammcnet_aaai2021_tpu.models import build_generator

    rng = np.random.default_rng(0)
    videos = synth_ped2_shaped(rng)

    cfg = NetConfig()  # released config: bf16 compute, Pallas memory kernel
    gen = build_generator(cfg, per_sample_diff=True)
    variables = gen.init({"params": jax.random.PRNGKey(0)},
                         jnp.zeros((1, SIZE, SIZE, 12)),
                         jnp.zeros((1, SIZE, SIZE, 6)))
    scorer = make_multi_video_scorer(gen, variables,
                                     window_batch=WINDOW_BATCH)

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

    # warm-up: compile the chunk scorer once (persistent cache makes repeat
    # runs pay ~0 here)
    warm = [upload_video(*decode_video(videos[i])) for i in range(CHUNK)]
    _ = np.asarray(scorer(tuple(r for r, _ in warm), tuple(o for _, o in warm)))
    del warm
    n_windows = FRAMES_PER_VIDEO - 5 + 1

    fps = 0.0
    for _pass in range(N_PASSES):
        t0 = time.perf_counter()
        total_frames = 0
        # pipeline: decode on host threads || per-video async uploads ||
        # one dispatch per CHUNK videos (chunk 2's host work overlaps chunk
        # 1's compute).  The ONLY device->host sync is one stacked fetch of
        # the whole pass's scores (a sync round-trip on this environment's
        # tunnel can cost seconds under contention; everything fits in HBM).
        decoded = [pool.submit(decode_video, v) for v in videos]
        launched = []
        for start in range(0, NUM_VIDEOS, CHUNK):
            chunk = [upload_video(*decoded[i].result())
                     for i in range(start, start + CHUNK)]
            launched.append(scorer(tuple(r for r, _ in chunk),
                                   tuple(o for _, o in chunk)))
        all_scores = np.asarray(jnp.concatenate(launched))[:, :, :n_windows]
        for scores in all_scores:
            rgb_psnr, rgb_fea, op_psnr, op_fea = scores
            _assemble_records(rgb_psnr, FRAMES_PER_VIDEO, 5)
            _assemble_records(rgb_fea, FRAMES_PER_VIDEO, 5)
            _assemble_records(op_psnr, FRAMES_PER_VIDEO, 4)
            _assemble_records(op_fea, FRAMES_PER_VIDEO, 4)
            total_frames += len(rgb_psnr)
        elapsed = time.perf_counter() - t0
        fps = max(fps, total_frames / elapsed)
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
        time.sleep(10)
        main()
