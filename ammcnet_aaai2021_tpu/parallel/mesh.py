"""Device mesh + sharding layout.

The reference has NO distributed backend (single GPU; SURVEY.md 2.2).  The
TPU-native scale-out story is jax.sharding: a mesh with a ``data`` axis,
batches sharded over it, parameters/codebook replicated, and XLA inserting
the gradient/EMA all-reduces over ICI.  The model (~25M params) fits on one
chip, so data parallelism over clips is the only axis that matters; the mesh
helper still accepts extra axes for completeness (large-batch serving can
shard the clip axis of the sliding-window enumeration — the only "sequence"
dimension this workload has, SURVEY.md 5.7).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Tuple[str, ...] = ("data",),
              devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree of arrays with the batch axis over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_params_tensor_parallel(mesh: Mesh, params,
                                 min_channels: int = 512):
    """Tensor-parallel placement for the wide bottleneck layers.

    Conv kernels whose output-channel dim is >= ``min_channels`` (the 512-ch
    bottleneck trunk convs and the AMFT bridge) shard that dim over the
    mesh's 'model' axis; everything else replicates.  XLA propagates the
    sharding through the matching activations and inserts the collectives —
    the model is small enough that this is optional capacity headroom, not a
    necessity (SURVEY.md 2.2), but the machinery is exercised end to end by
    __graft_entry__.dryrun_multichip on a (data, model) mesh.
    """
    if "model" not in mesh.axis_names:
        return replicate(mesh, params)
    repl = replicated(mesh)
    axis_size = mesh.shape["model"]

    def place(x):
        if (getattr(x, "ndim", 0) == 4 and x.shape[-1] >= min_channels
                and x.shape[-1] % axis_size == 0):
            return jax.device_put(
                x, NamedSharding(mesh, P(None, None, None, "model")))
        return jax.device_put(x, repl)

    return jax.tree.map(place, params)
