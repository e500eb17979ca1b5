"""Multi-host input sharding.

TPU pods are multi-process: each host owns a slice of the chips and must
feed only its shard of the data (SURVEY.md 5.8: "multi-host input via
per-host file shards" — the reference, being single-process, has no
analogue).  Two units of sharding exist in this workload:

* training: each host draws independent clip samples (different sampler
  seeds) — data parallelism needs no coordination beyond distinct streams;
* evaluation: sub-videos are dealt round-robin across hosts; each host
  scores its videos and rank 0 concatenates records in global order.

Everything degrades to identity in single-process runs.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, TypeVar

import jax

T = TypeVar("T")


def barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Cross-process barrier via the coordination service.

    Preferred over ``multihost_utils.sync_global_devices`` for host-side
    rendezvous (e.g. "all record shards written"): it does not build a
    device collective, so it works when ranks are minutes apart (gloo/NCCL
    context initialization deadlines are ~30 s) and costs no compile.
    No-op in single-process runs.
    """
    if jax.process_count() == 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:  # initialized through some other path: device barrier
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
        return
    client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


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
    with open(path, "wb") as fh:
        pickle.dump({"names": list(local_names), "records": local_records},
                    fh, pickle.HIGHEST_PROTOCOL)
    return path


def merge_record_shards(shard_dir: str,
                        video_names: Sequence[str]) -> Dict[str, list]:
    """Rank-0 merge: reassemble all hosts' shards in global video order."""
    import os
    import pickle

    by_name: Dict[str, Dict[str, object]] = {}
    keys = None
    for fname in sorted(os.listdir(shard_dir)):
        if not fname.startswith("records_"):
            continue
        with open(os.path.join(shard_dir, fname), "rb") as fh:
            shard = pickle.load(fh)
        if keys is None:
            keys = [k for k in shard["records"] if k != "dataset"]
        for i, name in enumerate(shard["names"]):
            by_name[name] = {k: shard["records"][k][i] for k in keys}
    assert keys is not None, f"no record shards under {shard_dir!r}"
    missing = [n for n in video_names if n not in by_name]
    assert not missing, f"shards missing videos: {missing}"
    return {k: [by_name[n][k] for n in video_names] for k in keys}
