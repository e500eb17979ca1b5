"""Multi-host input sharding.

TPU pods are multi-process: each host owns a slice of the chips and must
feed only its shard of the data (SURVEY.md 5.8: "multi-host input via
per-host file shards" — the reference, being single-process, has no
analogue).  Two units of sharding exist in this workload:

* training: each host draws independent clip samples (different sampler
  seeds) — data parallelism needs no coordination beyond distinct streams;
  the cross-process composition (per-host shards -> :func:`make_global_batch`
  -> GSPMD train step with gloo collectives inside) is executed for real by
  ``tests/test_multihost_train.py`` (2 processes, losses == single-process);
* evaluation: sub-videos are dealt round-robin across hosts; each host
  scores its videos and rank 0 concatenates records in global order
  (``tests/test_multihost_eval.py``).

Everything degrades to identity in single-process runs.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, TypeVar

import jax

T = TypeVar("T")


def warm_collectives() -> None:
    """Establish the cross-process collective context while ranks are aligned.

    XLA's CPU (gloo) collective context is created lazily at the FIRST
    collective, with a fixed ~30 s rendezvous deadline — and a deadline
    failure POISONS the context for the life of the process (measured:
    every later collective replays the cached DEADLINE_EXCEEDED instantly,
    so retrying is useless).  An ESTABLISHED context, by contrast, tolerates
    arbitrary inter-rank skew (measured: a broadcast where one rank arrives
    45 s late just blocks and completes).

    Therefore the one tiny collective below must run at a point where rank
    alignment is guaranteed — immediately after ``jax.distributed
    .initialize``, whose coordination barrier releases all ranks together.
    Any compute between that barrier and the first collective (imports,
    model init, compiles) convoys on loaded hosts and re-opens the window.
    No-op in single-process runs; idempotent and ~ms when already warm.
    """
    if jax.process_count() == 1:
        return
    import numpy as np
    from jax.experimental import multihost_utils

    multihost_utils.broadcast_one_to_all(np.zeros(4, np.uint8))


def initialize(**kwargs) -> None:
    """``jax.distributed.initialize`` + immediate :func:`warm_collectives`.

    The recommended entry for multi-host runs: it leaves no window between
    the initialize barrier (ranks aligned) and collective-context creation
    (see :func:`warm_collectives` for why that window is fatal on slow or
    contended hosts).  Accepts exactly ``jax.distributed.initialize``'s
    keyword arguments (coordinator_address, num_processes, process_id, ...).
    """
    jax.distributed.initialize(**kwargs)
    warm_collectives()


def agree_on_run_token() -> str:
    """All ranks agree on one fresh random token (rank 0's draw).

    Called at the START of an evaluation.  The one tiny
    ``broadcast_one_to_all`` collective here is safe provided the collective
    context already exists (:func:`warm_collectives` — the context, once
    established, tolerates ranks arriving minutes apart).  The token names a
    fresh per-run shard directory, which is what makes the END of the run
    collective-free: rank 0 rendezvouses by polling for the shard FILES
    (:func:`wait_for_shards`), which tolerates ranks finishing minutes apart
    and can never merge a previous run's stale shards.
    """
    import uuid

    import numpy as np

    if jax.process_count() == 1:
        return uuid.uuid4().hex
    from jax.experimental import multihost_utils

    local = np.frombuffer(uuid.uuid4().bytes, np.uint8)
    try:
        tok = multihost_utils.broadcast_one_to_all(local)
    except Exception as e:  # noqa: BLE001 — re-raise with the actual fix
        msg = str(e)
        if "DEADLINE_EXCEEDED" in msg or "Gloo context" in msg:
            raise RuntimeError(
                "cross-process collective context initialization failed — "
                "the ranks reached their first collective more than ~30 s "
                "apart (XLA's gloo rendezvous deadline), and a failed "
                "context cannot be retried within this process.  Establish "
                "the context while ranks are still aligned: call "
                "ammcnet_aaai2021_tpu.parallel.multihost.initialize(...) "
                "instead of jax.distributed.initialize(...), or call "
                "multihost.warm_collectives() immediately after it."
            ) from e
        raise
    return bytes(np.asarray(tok).tolist()).hex()


def consume_shard_dir(shard_dir: str) -> None:
    """Rank 0, after merging: retire the per-run shard directory.

    Atomically renames it aside first (the rename is the cross-rank
    "merge done" signal :func:`wait_for_merge` polls for — a plain rmtree
    of a directory another rank is statting can fail halfway on shared
    filesystems and leave the signal ambiguous), then best-effort deletes
    the renamed remains so recurring evals don't accumulate stale pickles.
    """
    import os
    import shutil

    consumed = shard_dir.rstrip("/") + ".consumed"
    try:
        os.rename(shard_dir, consumed)
    except OSError:
        consumed = shard_dir  # rename failed: fall back to direct removal
    shutil.rmtree(consumed, ignore_errors=True)


def wait_for_merge(shard_dir: str, timeout_s: float = 3600.0,
                   poll_s: float = 0.5) -> None:
    """Non-rank-0 end-of-run rendezvous: poll until rank 0 consumes the
    per-run shard directory (:func:`consume_shard_dir` renames it away
    after merging).

    Without this, fast ranks return from an eval minutes before rank 0
    finishes scoring+merging — their process exit then hangs
    jax.distributed's shutdown barrier, and a second eval in the same
    process would enter :func:`agree_on_run_token`'s broadcast collective
    with ranks minutes apart (exactly the rendezvous-deadline failure the
    file-based design avoids).  On timeout: warn and return — a crashed
    rank 0 must not also deadlock every worker."""
    import os
    import time
    import warnings

    t0 = time.monotonic()
    while os.path.isdir(shard_dir):
        if time.monotonic() - t0 > timeout_s:
            warnings.warn(
                f"rank 0 did not consume {shard_dir!r} within "
                f"{timeout_s:.0f}s; returning unaligned", RuntimeWarning)
            return
        time.sleep(poll_s)


def wait_for_shards(shard_dir: str, n_shards: int = 0,
                    timeout_s: float = 3600.0, poll_s: float = 0.5) -> None:
    """Rank-0 rendezvous: poll until every rank's ``records_*.pkl`` exists.

    The shards travel via the shared filesystem and are written atomically
    (write-then-rename), so observing the files directly is the strongest
    rendezvous available — a device barrier would not even guarantee
    cross-host filesystem visibility, and host-side collectives deadline
    when ranks finish minutes apart (which slow videos make routine).
    """
    import os
    import time

    n_shards = n_shards or jax.process_count()
    deadline = time.monotonic() + timeout_s
    while True:
        missing = [r for r in range(n_shards) if not os.path.exists(
            os.path.join(shard_dir, f"records_{r:05d}.pkl"))]
        if not missing:
            return
        if time.monotonic() > deadline:
            raise TimeoutError(
                f"still waiting for record shards from ranks {missing} "
                f"under {shard_dir!r} after {timeout_s:.0f}s")
        time.sleep(poll_s)


def host_shard(items: Sequence[T]) -> List[T]:
    """Round-robin deal of items (e.g. sub-video names) to this host."""
    return list(items[jax.process_index()::jax.process_count()])


def host_seed(base_seed: int) -> int:
    """Distinct per-host sampling stream for data-parallel training."""
    return base_seed + 1_000_003 * jax.process_index()


def make_global_batch(local_batch, mesh):
    """Host-local numpy shards -> one global jax.Array over the mesh's
    'data' axis (jax.make_array_from_process_local_data)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch)


def write_record_shard(shard_dir: str, local_records: Dict[str, list],
                       local_names: Sequence[str]) -> str:
    """Persist this host's per-video records + their video names.

    Ragged per-video score arrays cannot ride device collectives
    (process_allgather needs equal shapes), so multi-host evaluation merges
    through the shared filesystem: every host writes a shard, rank 0 calls
    :func:`merge_record_shards` after a barrier.
    """
    import os
    import pickle

    os.makedirs(shard_dir, exist_ok=True)
    path = os.path.join(shard_dir, f"records_{jax.process_index():05d}.pkl")
    # write-then-rename: a reader (rank 0's merge after the barrier) never
    # sees a half-written shard, and a rerun into the same shard_dir
    # atomically replaces its own stale shard
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        pickle.dump({"names": list(local_names), "records": local_records},
                    fh, pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)
    return path


def merge_record_shards(shard_dir: str, video_names: Sequence[str],
                        n_shards: int = 0) -> Dict[str, list]:
    """Rank-0 merge: reassemble all hosts' shards in global video order.

    Reads exactly the ``n_shards`` (default ``jax.process_count()``) shard
    files THIS run's ranks wrote — stale ``records_*.pkl`` left by an
    earlier run with more hosts (or a different checkpoint) are ignored, so
    a rerun into the same shard_dir can never merge another run's scores.
    """
    import os
    import pickle

    n_shards = n_shards or jax.process_count()
    by_name: Dict[str, Dict[str, object]] = {}
    keys = None
    for rank in range(n_shards):
        path = os.path.join(shard_dir, f"records_{rank:05d}.pkl")
        if not os.path.exists(path):
            # real error, not an assert: must survive python -O
            raise FileNotFoundError(
                f"missing record shard for rank {rank}: {path!r} "
                f"(expected {n_shards} shards)")
        with open(path, "rb") as fh:
            shard = pickle.load(fh)
        if keys is None:
            keys = [k for k in shard["records"] if k != "dataset"]
        for i, name in enumerate(shard["names"]):
            by_name[name] = {k: shard["records"][k][i] for k in keys}
    if keys is None:
        raise RuntimeError(f"no record shards under {shard_dir!r}")
    missing = [n for n in video_names if n not in by_name]
    if missing:
        raise RuntimeError(f"shards missing videos: {missing}")
    return {k: [by_name[n][k] for n in video_names] for k in keys}
