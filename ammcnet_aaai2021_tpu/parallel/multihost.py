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


def gather_records_to_rank0(local_records: Dict[str, list],
                            video_names: Sequence[str]) -> Dict[str, list]:
    """Reassemble per-video record lists in global video order on rank 0.

    In single-process runs this is the identity.  Multi-process gathers go
    through jax.experimental.multihost_utils (host arrays, not devices).
    """
    if jax.process_count() == 1:
        return local_records
    from jax.experimental import multihost_utils

    # each record list entry is (video_name, array); all-gather the pairs
    gathered = multihost_utils.process_allgather(local_records, tiled=False)
    # merge: gathered is a per-host structure; flatten preserving global order
    merged: Dict[str, list] = {k: [] for k in local_records}
    name_order = {n: i for i, n in enumerate(video_names)}
    for key in merged:
        pairs = []
        for host_entries in gathered[key]:
            pairs.extend(host_entries)
        pairs.sort(key=lambda kv: name_order[kv[0]])
        merged[key] = [arr for _name, arr in pairs]
    return merged
