"""Orbax checkpointing.

Replaces the reference's ``torch.save(state_dict)`` every 1000 steps +
filename-sort latest-loading (``Code/utils/utils.py:182-203``) with orbax
checkpoints of the FULL training state — generator params, BatchNorm
statistics, EMA codebook state, discriminator params, both optimizer states,
and the step counter.  (The reference never checkpointed optimizer state;
resume there silently reset Adam moments.)

Layout: ``<ckpt_dir>/<step>/`` per orbax convention; ``latest_step`` mirrors
the reference's step_NNNNNN.pth sort.
"""

from __future__ import annotations

import os
from typing import Any, Optional


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(ckpt_dir: str, step: int, state: Any) -> str:
    """Save a pytree under <ckpt_dir>/<step:06d>."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"{step:06d}")
    ckpt = _checkpointer()
    ckpt.save(path, state, force=True)
    ckpt.wait_until_finished()
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    return max(steps) if steps else None


def prune_checkpoints(ckpt_dir: str, keep_last: Optional[int] = None,
                      keep_every: Optional[int] = None) -> list:
    """Retention policy for full-state checkpoints.

    The reference's cadence (every 1000 steps, ``const_params.py:32``) with
    THIS framework's full state (G/D params + both Adam states + EMA
    codebooks, ~296 MB at released scale vs the reference's weights-only
    ~3 MB) writes ~24 GB per 80k run — so faithful cadence needs a retention
    knob the reference never did.  Keeps the union of: the newest
    ``keep_last`` steps, every step divisible by ``keep_every``, and always
    the latest (resume safety).  ``None`` disables that criterion; both
    ``None`` keeps everything (reference behavior).  Returns deleted steps.
    """
    if keep_last is None and keep_every is None:
        return []
    if not os.path.isdir(ckpt_dir):
        return []
    steps = sorted(int(d) for d in os.listdir(ckpt_dir) if d.isdigit())
    if not steps:
        return []
    keep = {steps[-1]}
    if keep_last:
        keep.update(steps[-keep_last:])
    if keep_every:
        keep.update(s for s in steps if s % keep_every == 0)
    import shutil

    deleted = []
    for s in steps:
        if s not in keep:
            shutil.rmtree(os.path.join(ckpt_dir, f"{s:06d}"))
            deleted.append(s)
    return deleted


def restore_checkpoint(ckpt_dir: str, target: Any = None,
                       step: Optional[int] = None) -> Any:
    """Restore the given (or latest) step.

    ``target=None`` restores the raw saved pytree (useful for consumers that
    only need a slice, e.g. the watch-folder evaluator pulling just the
    generator out of a full train state)."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir!r}")
    path = os.path.join(os.path.abspath(ckpt_dir), f"{step:06d}")
    if target is None:
        return _checkpointer().restore(path)
    return _checkpointer().restore(path, target=target)


def save_msgpack(path: str, variables: Any) -> None:
    """Single-file msgpack serialization (for converted torch weights and
    small fixtures; flax-native)."""
    from flax import serialization

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(serialization.to_bytes(variables))


def load_msgpack(path: str, target: Any) -> Any:
    from flax import serialization

    with open(path, "rb") as fh:
        return serialization.from_bytes(target, fh.read())


def load_generator_variables(ckptfile: str, target: Any,
                             net_tag: Optional[str] = None) -> Any:
    """Load a generator variable tree from any supported checkpoint format.

    Dispatch on path shape (shared by ``run_test`` and ``export_model``):
    ``*.pth`` -> torch converter (needs ``net_tag``), ``*.msgpack`` ->
    flax msgpack against ``target``, else an orbax step dir (either a raw
    variable tree or a full train state with ``g_params``/``g_state``, the
    ``train_loop`` format).  Leaves are committed to the default device
    once — restores hand back host numpy, and without this every scorer
    dispatch would re-upload the 25M params (run_test.py note).
    """
    import jax
    import jax.numpy as jnp

    if ckptfile.endswith(".pth"):
        from ..tools.torch_convert import convert_pth

        variables = convert_pth(ckptfile, net_tag)
    elif ckptfile.endswith(".msgpack"):
        variables = load_msgpack(ckptfile, target)
    else:
        restored = restore_checkpoint(os.path.dirname(ckptfile),
                                      step=int(os.path.basename(ckptfile)))
        if "g_params" in restored:  # full train state (train_loop format)
            variables = {"params": restored["g_params"],
                         **restored["g_state"]}
        else:
            variables = restored
    return jax.tree.map(jnp.asarray, variables)
