"""Serving artifact (`eval/export.py`): a saved `jax.export` scorer must
reload WITHOUT model code and reproduce the live scorer's outputs exactly.

Replaces the reference's deploy story — rebuild the model zoo + load a
.pth per serving process (``Code/run_helper/test_helper.py:503-518``) —
with a self-contained versioned StableHLO blob.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ammcnet_aaai2021_tpu.configs import NetConfig
from ammcnet_aaai2021_tpu.eval.export import (export_scorer, load_scorer,
                                              read_header, save_scorer)
from ammcnet_aaai2021_tpu.eval.infer import (make_multi_video_scorer,
                                             pad_video_to_bucket)
from ammcnet_aaai2021_tpu.models import build_generator


@pytest.fixture(scope="module")
def tiny_scorer_setup():
    cfg = NetConfig(dtype="float32", use_pallas_memory=False, n_embed=64)
    gen = build_generator(cfg, per_sample_diff=True)
    size = 32
    variables = gen.init({"params": jax.random.PRNGKey(0)},
                         jnp.zeros((1, size, size, 12)),
                         jnp.zeros((1, size, size, 6)))
    return gen, variables, size


def _chunk(rng, n_videos, t, size, bucket):
    videos = [pad_video_to_bucket(
        rng.integers(0, 255, (t, size, size, 3), np.uint8),
        # bf16: the artifact pins the live pipeline's op dtype
        rng.normal(0, 0.02, (t - 1, size, size, 2)).astype(jnp.bfloat16),
        bucket=bucket) for _ in range(n_videos)]
    return (tuple(v[0] for v in videos), tuple(v[1] for v in videos))


def test_export_roundtrip_matches_live_scorer(tiny_scorer_setup, rng,
                                              tmp_path):
    gen, variables, size = tiny_scorer_setup
    n_videos, t, bucket, wb = 2, 14, 16, 8
    path = str(tmp_path / "scorer.ammc")

    header = save_scorer(path, gen, variables, n_videos=n_videos,
                         frames=bucket, size=size, window_batch=wb,
                         platforms=("cpu",),
                         extra_meta={"exp_tag": "test_export"})
    assert header["kind"] == "ammcnet_chunk_scorer"
    assert header["exp_tag"] == "test_export"
    assert read_header(path) == header

    score_chunk, hdr2 = load_scorer(path)
    assert hdr2 == header

    rgbs, ops = _chunk(rng, n_videos, t, size, bucket)
    got = np.asarray(score_chunk(rgbs, ops))
    live = make_multi_video_scorer(gen, variables, window_batch=wb)
    want = np.asarray(live(rgbs, ops))
    assert got.shape == tuple(
        np.where(np.asarray(header["out_shape"]) > 0,
                 header["out_shape"], want.shape))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_export_artifact_is_self_contained(tiny_scorer_setup, tmp_path):
    """The blob embeds the weights: mutating the live variable tree after
    export must not change the artifact's outputs."""
    gen, variables, size = tiny_scorer_setup
    blob = export_scorer(gen, variables, n_videos=1, frames=16, size=size,
                         window_batch=8, platforms=("cpu",))
    assert blob[:8] == b"AMMCSCR1"
    # weights baked in -> blob carries ~all parameter bytes (measured:
    # 100.2 MB blob vs 100.3 MB of f32 leaves at this config)
    n_param_bytes = sum(x.size * x.dtype.itemsize
                        for x in jax.tree.leaves(variables))
    assert len(blob) > 0.9 * n_param_bytes


def test_export_bad_magic_rejected(tmp_path):
    path = str(tmp_path / "junk.ammc")
    with open(path, "wb") as f:
        f.write(b"NOTANART" + b"\x00" * 64)
    with pytest.raises(ValueError, match="not an ammcnet scorer artifact"):
        read_header(path)
    with pytest.raises(ValueError, match="not an ammcnet scorer artifact"):
        load_scorer(path)


def test_export_platform_mismatch_rejected(tiny_scorer_setup, tmp_path,
                                           monkeypatch):
    gen, variables, size = tiny_scorer_setup
    path = str(tmp_path / "scorer_tpu_only.ammc")
    # Export "for TPU" by lying about platforms at export time is not
    # possible on a CPU test host (lowering differs), so check the guard
    # directly: doctor the loaded Exported's platforms via the header path
    # by exporting for cpu then asserting the guard trips for a fake
    # backend.
    save_scorer(path, gen, variables, n_videos=1, frames=16, size=size,
                window_batch=8, platforms=("cpu",))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pytest.raises(ValueError, match="cannot serve on"):
        load_scorer(path)


def test_export_model_cli_toydata(tmp_path):
    """End-to-end CLI: toydata -> bf16 artifact with --check (reload +
    live-scorer agreement), then the int8 path through calibration on
    real training clips + export (no --check: int8 convs are emulated and
    minutes-slow on CPU; artifact numerics are covered by the bf16 check
    and tests/test_quantized.py)."""
    from ammcnet_aaai2021_tpu.runners.export_model import main as export_main
    from ammcnet_aaai2021_tpu.tools.make_toydata import make_toydata

    root = str(tmp_path / "data")
    make_toydata(root, frames_per_video=12, image_size=32)

    out = str(tmp_path / "scorer.ammc")
    res = export_main([
        "--dataset_name", "toydata", "--data_dir", root,
        "--out", out, "--image_size", "32",
        "--n_videos", "2", "--frames", "16", "--window_batch", "4",
        "--platforms", "cpu", "--check"])
    assert res["forward"] == "bf16"
    assert res["check_max_diff"] <= 1e-2  # bf16-ulp program-variant noise
    assert os.path.getsize(out) == res["bytes"]

    out8 = str(tmp_path / "scorer_int8.ammc")
    res8 = export_main([
        "--dataset_name", "toydata", "--data_dir", root,
        "--out", out8, "--image_size", "32",
        "--n_videos", "1", "--frames", "16", "--window_batch", "4",
        "--calib_batches", "1", "--calib_batch_size", "2",
        "--platforms", "cpu", "--int8"])
    assert res8["forward"] == "int8-calibrated"
    assert res8["calib_clips"] == 2
    # int8 weights baked in -> far smaller than the f32 artifact
    assert res8["bytes"] < 0.55 * res["bytes"]
    assert read_header(out8)["forward"] == "int8-calibrated"
