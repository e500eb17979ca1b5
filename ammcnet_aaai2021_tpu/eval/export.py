"""Serialized serving artifacts for the fused scorer (``jax.export``).

Production deployment of the reference requires shipping the whole Python
model zoo plus a torch checkpoint and re-tracing at startup
(``Code/run_helper/test_helper.py:503-518`` rebuilds the model and loads
``.pth`` state per run).  A TPU-native serving story is an ahead-of-time
artifact: the fused chunk scorer — window assembly + normalize + two-stream
forward + memory addressing + per-frame PSNR/commit records, the exact
program ``bench.py`` and ``run_test`` execute — exported once as versioned
StableHLO with the weights baked in, then loaded and called by a serving
process that needs NO model code, NO checkpoint format, and NO tracing:
``load_scorer(path)`` returns a callable.

Format: a single file — 8-byte little-endian header-length prefix, JSON
header (shapes, scorer geometry, platform, jax version), then the
``jax.export`` serialization.  The artifact is platform-checked at load
(StableHLO serialized for TPU will not run on CPU).
"""

from __future__ import annotations

import json
import struct
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

_MAGIC = b"AMMCSCR1"


def _chunk_arg_structs(n_videos: int, frames: int, size: int,
                       rgb_channels: int = 3, op_channels: int = 2):
    """ShapeDtypeStructs of one bucket-padded chunk (matches
    ``infer.pad_video_to_bucket``/``upload_video``)."""
    rgbs = tuple(jax.ShapeDtypeStruct((frames, size, size, rgb_channels),
                                      jnp.uint8) for _ in range(n_videos))
    ops = tuple(jax.ShapeDtypeStruct((frames - 1, size, size, op_channels),
                                     jnp.bfloat16) for _ in range(n_videos))
    return rgbs, ops


def export_scorer(generator, variables, *,
                  n_videos: int, frames: int, size: int,
                  window_batch: int = 192,
                  platforms: Optional[Tuple[str, ...]] = None,
                  apply_fn: Optional[Callable] = None,
                  extra_meta: Optional[Dict[str, Any]] = None) -> bytes:
    """Export the fused multi-video scorer as one self-contained artifact.

    The weights are closed over (baked into the program as constants) —
    a serving artifact pins its weights by design; the live paths keep
    passing them as arguments for cache-key hygiene (infer.py module note).

    ``apply_fn`` overrides the generator forward exactly as in
    :func:`~.infer.make_multi_video_scorer` — pass the int8 quantized
    forward (``models.quantized``) with its ``qvars`` as ``variables`` to
    export a quantized serving artifact.
    """
    from .infer import make_multi_video_scorer

    scorer = make_multi_video_scorer(generator, variables,
                                     window_batch=window_batch,
                                     apply_fn=apply_fn)

    def fn(rgbs, ops):
        return scorer.jitted(variables, rgbs, ops)

    rgbs, ops = _chunk_arg_structs(n_videos, frames, size)
    exp = jax_export.export(jax.jit(fn), platforms=platforms)(rgbs, ops)
    payload = exp.serialize()

    header = {
        "kind": "ammcnet_chunk_scorer",
        "n_videos": n_videos, "frames": frames, "size": size,
        "window_batch": window_batch,
        "platforms": list(exp.platforms),
        "jax_version": jax.__version__,
        "out_shape": [n_videos, 4,
                      -(-(frames - 5 + 1) // window_batch) * window_batch],
    }
    header.update(extra_meta or {})
    hdr = json.dumps(header).encode()
    return _MAGIC + struct.pack("<Q", len(hdr)) + hdr + bytes(payload)


def save_scorer(path: str, generator, variables, **kw) -> Dict[str, Any]:
    blob = export_scorer(generator, variables, **kw)
    with open(path, "wb") as f:
        f.write(blob)
    return read_header(path)


def read_header(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not an ammcnet scorer artifact "
                             f"(magic {magic!r})")
        (n,) = struct.unpack("<Q", f.read(8))
        return json.loads(f.read(n))


def load_scorer(path: str) -> Tuple[Callable, Dict[str, Any]]:
    """Load a serving artifact: returns ``(score_chunk(rgbs, ops), header)``.

    Needs no model code and performs no tracing — the deserialized program
    jit-executes directly (compile of the embedded StableHLO only, served
    by the persistent compile cache like every other program).
    """
    with open(path, "rb") as f:
        blob = f.read()
    if blob[:len(_MAGIC)] != _MAGIC:
        raise ValueError(f"{path}: not an ammcnet scorer artifact")
    (n,) = struct.unpack("<Q", blob[8:16])
    header = json.loads(blob[16:16 + n])
    exp = jax_export.deserialize(bytearray(blob[16 + n:]))

    backend = jax.default_backend()
    plats = {p.lower() for p in exp.platforms}
    if backend.lower() not in plats and not (
            backend.lower() in ("tpu", "axon") and plats & {"tpu", "axon"}):
        raise ValueError(
            f"artifact built for platforms {sorted(plats)} cannot serve on "
            f"the current '{backend}' backend — re-export with "
            f"platforms=('{backend}',)")

    call = jax.jit(exp.call)

    def score_chunk(rgbs, ops):
        return call(tuple(rgbs), tuple(ops))

    return score_chunk, header
