"""Training orchestration: the epoch/step loop around the jitted steps.

Rebuild of the reference helpers (``Code/run_helper/train_helper.py``):
``train_from_multi_pretain`` (stage 2, :217-427) and ``train_base``
(stage 1, :1323-1850) — periodic loss/PSNR logging every ``STEP_LOG``,
scalar summaries every ``STEP_SUMMARY``, checkpoints every
``STEP_SAVE_CKPT``, per-iteration LR schedule (inside the optax schedule),
host-side data prefetch overlapping the device step.

Observability: scalars go to a CSV (TensorBoard-compatible via
``torch.utils.tensorboard`` when available — the reference used tensorboardX)
plus the rotating-file logger.  Flow images render through the Middlebury
color wheel like the reference's summary grids.
"""

from __future__ import annotations

import csv
import os
import queue
import threading
import time
from typing import Callable, Dict, Iterator, Optional

import jax
import numpy as np

from ..configs import STEP_LOG, STEP_SAVE_CKPT, STEP_SUMMARY
from .checkpoint import prune_checkpoints, save_checkpoint


class ScalarWriter:
    """CSV scalar sink; mirrors the reference's tensorboardX scalars and adds
    a greppable on-disk format.  Optionally tees to TensorBoard."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._csv_path = os.path.join(log_dir, "scalars.csv")
        self._csv = open(self._csv_path, "a", newline="")
        self._writer = csv.writer(self._csv)
        if os.path.getsize(self._csv_path) == 0:
            self._writer.writerow(["step", "tag", "value"])
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def scalars(self, step: int, values: Dict[str, float]) -> None:
        for tag, val in values.items():
            self._writer.writerow([step, tag, float(val)])
            if self._tb is not None:
                self._tb.add_scalar(tag, float(val), step)
        self._csv.flush()

    def image_grid(self, step: int, tag: str, images: np.ndarray) -> None:
        """NHWC uint8 (or [-1,1] float RGB, or (b,h,w,2) flow rendered
        through the color wheel) -> TensorBoard grid (reference
        get_vis_tensor + make_grid, utils.py:305-324)."""
        if self._tb is None:
            return
        images = np.asarray(images)
        if images.shape[-1] == 2:  # flow -> Middlebury color wheel
            from ..utils.vis import batch_flow_to_image

            images = batch_flow_to_image(images.astype(np.float32))
        elif images.dtype != np.uint8:
            images = ((np.clip(images, -1, 1) + 1) * 127.5).astype(np.uint8)
        # (b,h,w,c) -> one row grid (b*? simple horizontal concat)
        grid = np.concatenate(list(images), axis=1)
        self._tb.add_image(tag, grid, step, dataformats="HWC")

    def close(self) -> None:
        self._csv.close()
        if self._tb is not None:
            self._tb.close()


class PackedStateFetcher:
    """Fetch a pytree of device arrays with ONE D2H transfer per dtype.

    ``jax.device_get`` on a ~200-leaf train state pays one tunnel
    round-trip PER LEAF (~0.2-1.5 s each on this environment's remote
    device — 40-330 s per checkpoint, measured live on the 80k run).  This
    packs all same-dtype leaves into one contiguous device vector inside
    ONE jitted program (compiled once per state structure, persistent-
    cached), fetches each vector in a single RPC, and splits/reshapes on
    the host.  Same bytes, ~dtype-count round-trips instead of leaf-count.
    """

    def __init__(self):
        self._packer = None
        self._spec = None

    def __call__(self, tree):
        import jax.numpy as jnp

        leaves, treedef = jax.tree.flatten(tree)
        if self._packer is None:
            order: Dict = {}
            for i, x in enumerate(leaves):
                order.setdefault(jnp.dtype(x.dtype).name, []).append(i)
            self._spec = (treedef, order,
                          [(x.shape, x.size) for x in leaves])

            def pack(ls):
                return {name: jnp.concatenate(
                    [ls[i].reshape(-1) for i in idxs])
                    for name, idxs in order.items()}

            self._packer = jax.jit(pack)
        treedef0, order, shapes = self._spec
        packed = self._packer(leaves)
        out = [None] * len(leaves)
        for name, idxs in order.items():
            host = np.asarray(packed[name])  # ONE fetch per dtype
            off = 0
            for i in idxs:
                shape, size = shapes[i]
                out[i] = host[off:off + size].reshape(shape)
                off += size
        return jax.tree.unflatten(treedef0, out)


def prefetch(batch_iter: Iterator, depth: int = 2) -> Iterator:
    """Host-thread prefetch so data assembly overlaps the device step
    (replaces the reference's DataLoader(num_workers=16) processes)."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in batch_iter:
                q.put(item)
        finally:
            q.put(_END)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item


def train_loop(
    state,
    train_step: Callable,
    batch_iter: Iterator,
    flow_vars,
    iterations: int,
    run_dir: str,
    logger=None,
    psnr_fn: Optional[Callable] = None,
    vis_fn: Optional[Callable] = None,
    step_log: int = STEP_LOG,
    step_summary: int = STEP_SUMMARY,
    step_save: int = STEP_SAVE_CKPT,
    fetch_every_periods: int = 1,
    async_checkpoints: bool = False,
    keep_ckpts: Optional[int] = None,
    keep_every: Optional[int] = None,
):
    """Generic loop used by both stages.  ``psnr_fn(state, batch)`` computes
    the train-PSNR the reference logs every step_log (train_helper.py:347-386).
    Returns the final state.

    Scalar logging is DEFERRED (see ``flush_pending``), so ``step_summary``
    should be a multiple of ``step_log`` (the reference's 100/10 cadence is)
    — summary scalars are taken from the coinciding log step's stack.

    ``fetch_every_periods=K`` batches K log periods' scalar stacks into ONE
    device->host fetch (the per-10-step values are still recorded, written K
    periods late): on a remote device whose tiny-op RTT is ~0.2-6 s the
    per-period fetch otherwise bounds the loop at RTT, not at the 11 ms
    step (8k fetches over an 80k run).  ``async_checkpoints=True`` moves the
    checkpoint device_get + orbax write onto a writer thread — JAX arrays
    are immutable, so the step-N state snapshot stays consistent while the
    loop keeps stepping; queue depth 1 gives backpressure if saves fall a
    full cadence behind.  A kill mid-save leaves only an orbax tmp dir,
    which ``latest_step``'s digits-only filter ignores on resume.

    ``keep_ckpts``/``keep_every``: retention policy applied after every save
    (:func:`~.checkpoint.prune_checkpoints`) — the newest ``keep_ckpts``
    steps plus every ``keep_every``-divisible step survive; both ``None``
    keeps everything (the reference never pruned, but its checkpoints were
    ~100x smaller — weights only)."""
    import jax.numpy as jnp

    def _save_and_prune(sstep, pytree):
        save_checkpoint(ckpt_dir, sstep, pytree)
        deleted = prune_checkpoints(ckpt_dir, keep_ckpts, keep_every)
        if logger:
            logger.info("checkpoint saved at step %d%s", sstep,
                        f" (pruned {len(deleted)})" if deleted else "")

    writer = ScalarWriter(os.path.join(run_dir, "summary"))
    ckpt_dir = os.path.join(run_dir, "training", "checkpoints")
    t_data0 = time.time()
    step_times, data_times = [], []
    # the device-side state.step is authoritative for checkpoints/resume; a
    # host-side mirror avoids a device sync per iteration (reading the scalar
    # costs a full RPC round-trip on remote-device setups)
    step = int(state.step)
    t_period = time.time()

    # Deferred metric fetch: at each log step the scalars stack into ONE
    # device array (async dispatch); stacks accumulate and are fetched in
    # batches of ``fetch_every_periods`` — by then the oldest has had whole
    # log periods of compute to ride down; one RPC fetches everything.  A
    # per-scalar float() here would cost len(metrics) D2H round-trips per
    # log step (8 scalars x 8k log steps x 0.2-6 s RTT on this tunnel =
    # hours on an 80k run).
    pending = []  # [(step, keys, device_array, steps/s, data_frac), ...]
    flush_mark = [step, time.time()]  # (step, wall) at the last flush

    def flush_pending():
        if not pending:
            return
        vals_all = np.asarray(jnp.stack([p[2] for p in pending]),
                              dtype=np.float64)  # ONE fetch for all periods
        # In batched-fetch mode the per-period host rate is a DISPATCH rate
        # (the host runs ahead of the device between flushes); the truthful
        # throughput is steps/wall over the flush window — the np.asarray
        # above blocked until the newest period's metrics really computed.
        now = time.time()
        span_rate = (pending[-1][0] - flush_mark[0]) / max(
            now - flush_mark[1], 1e-9)
        flush_mark[0], flush_mark[1] = pending[-1][0], now
        for (pstep, keys, _, rate, data_frac), row in zip(pending, vals_all):
            if len(pending) > 1:
                rate = span_rate
            vals = dict(zip(keys, row.tolist()))
            if logger:
                comps = ", ".join(f"{k}={v:.4f}" for k, v in vals.items())
                logger.info("step %d | %s | %.1f steps/s data_stall=%.0f%%",
                            pstep, comps, rate, 100 * data_frac)
            if pstep % step_summary == 0:
                writer.scalars(pstep, vals)
                writer.scalars(pstep, {"steps_per_sec": rate,
                                       "data_stall_frac": data_frac})
        pending.clear()

    save_q: Optional["queue.Queue"] = None
    saver_thread = None
    fetch_state = PackedStateFetcher()
    if async_checkpoints:
        save_q = queue.Queue(maxsize=1)

        def saver():
            while True:
                item = save_q.get()
                if item is None:
                    return
                sstep, sstate = item
                _save_and_prune(sstep, fetch_state(_state_to_pytree(sstate)))

        saver_thread = threading.Thread(target=saver, daemon=True)
        saver_thread.start()

    for batch in prefetch(batch_iter):
        data_times.append(time.time() - t_data0)
        t0 = time.time()
        state, metrics = train_step(state, batch, flow_vars)
        step += 1
        step_times.append(time.time() - t0)
        if step % step_log == 0:
            keys = sorted(metrics)
            scalars = [metrics[k] for k in keys]
            if psnr_fn is not None:
                keys.append("train_psnr")
                scalars.append(psnr_fn(state, batch))
            now = time.time()
            period = max(now - t_period, 1e-9)
            rate = step_log / period
            data_frac = float(np.sum(data_times[-step_log:])) / period
            t_period = now
            pending.append((step, keys, jnp.stack(scalars), rate, data_frac))
            if len(pending) >= max(1, fetch_every_periods):
                flush_pending()
        if step % step_summary == 0 and vis_fn is not None:
            # image grids of predictions vs targets (flow rendered
            # through the color wheel), reference train_helper.py:388-411
            for tag, images in vis_fn(state, batch).items():
                writer.image_grid(step, tag, np.asarray(images))
        if step % step_save == 0:
            flush_pending()
            if save_q is not None:
                save_q.put((step, state))  # blocks only if a save is behind
            else:
                _save_and_prune(step, fetch_state(_state_to_pytree(state)))
        t_data0 = time.time()
        if step >= iterations:
            break
    flush_pending()
    if save_q is not None:
        save_q.put(None)
        saver_thread.join()
    writer.close()
    return state


def _state_to_pytree(state) -> Dict:
    """flax struct dataclass -> plain dict for orbax."""
    return {
        "step": state.step,
        "g_params": state.g_params,
        "g_state": state.g_state,
        "g_opt_state": state.g_opt_state,
        "d_params": state.d_params,
        "d_opt_state": state.d_opt_state,
    }
