"""Training-loop utility tests: scalar/image writers, prefetch iterator,
step timer."""

import csv
import os
import threading
import time

import numpy as np
import pytest

from ammcnet_aaai2021_tpu.train.loop import ScalarWriter, prefetch
from ammcnet_aaai2021_tpu.utils.profiling import StepTimer


class TestScalarWriter:
    def test_csv_and_reopen_append(self, tmp_path):
        d = str(tmp_path / "sum")
        w = ScalarWriter(d, use_tensorboard=False)
        w.scalars(10, {"g_loss": 1.5, "d_loss": 0.3})
        w.close()
        w2 = ScalarWriter(d, use_tensorboard=False)
        w2.scalars(20, {"g_loss": 1.2})
        w2.close()
        with open(os.path.join(d, "scalars.csv")) as fh:
            rows = list(csv.DictReader(fh))
        assert [(r["step"], r["tag"]) for r in rows] == [
            ("10", "g_loss"), ("10", "d_loss"), ("20", "g_loss")]

    def test_image_grid_flow_and_rgb(self, tmp_path, rng):
        pytest.importorskip("torch.utils.tensorboard")
        d = str(tmp_path / "sum")
        w = ScalarWriter(d, use_tensorboard=True)
        if w._tb is None:
            pytest.skip("tensorboard writer unavailable")
        # rgb in [-1, 1] and 2-channel flow both render without error
        w.image_grid(1, "rgb/pred",
                     rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32))
        w.image_grid(1, "op/pred",
                     rng.normal(size=(2, 8, 8, 2)).astype(np.float32))
        w.close()
        assert any(f.startswith("events") for f in os.listdir(d))


class TestPrefetch:
    def test_order_preserved_and_exhausts(self):
        items = list(range(20))
        out = list(prefetch(iter(items), depth=3))
        assert out == items

    def test_overlaps_production(self):
        produced = []

        def gen():
            for i in range(5):
                produced.append(i)
                yield i

        it = prefetch(gen(), depth=2)
        first = next(it)
        assert first == 0
        # the producer thread must run ahead of the (idle) consumer; poll
        # with a deadline instead of a fixed sleep — fixed sleeps flake on
        # this 1-core machine when the producer thread gets starved
        deadline = time.monotonic() + 5.0
        while len(produced) < 3 and time.monotonic() < deadline:
            time.sleep(0.005)
        assert len(produced) >= 3  # prefetched beyond what we consumed
        assert list(it) == [1, 2, 3, 4]


class TestStepTimer:
    def test_fps_accounting(self):
        # assert the ACCOUNTING (frames / measured step time), not the
        # accuracy of time.sleep — on a loaded 1-core machine a 10 ms sleep
        # can take 30+ ms, so bounds must come from our own wall clock
        t = StepTimer(window=10)
        wall0 = time.perf_counter()
        for _ in range(3):
            with t.step():
                time.sleep(0.01)
        wall = time.perf_counter() - wall0
        fps = t.fps(frames_per_step=4)
        upper = 3 * 4 / (0.01 * 3)  # sleeps can only take LONGER than asked
        assert 0.5 * (3 * 4 / wall) <= fps <= upper * 1.05
        assert "fps/chip" in t.summary(4)


class TestPackedStateFetcher:
    def test_roundtrip_equals_device_get(self):
        """One D2H per dtype must deliver the same pytree as per-leaf
        device_get (the 80k run's checkpoint fetch paid ~200 leaf RTTs,
        PERF.md round-3)."""
        import jax
        import jax.numpy as jnp

        from ammcnet_aaai2021_tpu.train.loop import PackedStateFetcher

        r = np.random.default_rng(0)
        tree = {
            "step": jnp.asarray(7, jnp.int32),
            "g_params": {"a": jnp.asarray(r.normal(size=(3, 5)),
                                          jnp.float32),
                         "b": jnp.asarray(r.normal(size=(4,)), jnp.float32)},
            "counts": jnp.asarray(r.integers(0, 9, (2, 2)), jnp.int32),
        }
        fetch = PackedStateFetcher()
        got = fetch(tree)
        want = jax.device_get(tree)
        for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
        got2 = fetch(tree)  # packer is cached after the first call
        for g, w in zip(jax.tree.leaves(got2), jax.tree.leaves(want)):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
