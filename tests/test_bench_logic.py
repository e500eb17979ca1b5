"""Host-side logic of bench.py (no device): the output-guarantee machinery.

The driver consumes exactly one JSON line from bench's stdout; these tests
pin the exactly-once emit contract, the deadline helper, and the synth
data's shape so bench regressions surface in the CPU suite instead of in a
driver run on the real chip.
"""

import json
import time

import numpy as np
import pytest

import bench


@pytest.fixture(autouse=True)
def _reset_emit_state():
    bench._EMITTED.clear()
    bench._PROGRESS_REF.clear()
    yield
    bench._EMITTED.clear()
    bench._PROGRESS_REF.clear()


class TestEmit:
    def test_one_json_line_with_required_fields(self, capsys):
        bench.emit(88.0)
        line = capsys.readouterr().out.strip()
        d = json.loads(line)
        assert set(d) == {"metric", "value", "unit", "vs_baseline"}
        assert d["value"] == 88.0
        assert d["vs_baseline"] == round(88.0 / bench.BASELINE_FPS, 2)

    def test_exactly_once_across_callers(self, capsys):
        bench.emit(10.0)
        bench.emit(99.0)  # watchdog/executioner racing main: ignored
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == 1
        assert json.loads(out[0])["value"] == 10.0

    def test_threaded_race_emits_once(self, capsys):
        import threading

        ts = [threading.Thread(target=bench.emit, args=(float(i),))
              for i in range(8)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert len(capsys.readouterr().out.strip().splitlines()) == 1


class TestWaitWithDeadline:
    def test_returns_result(self):
        assert bench._wait_with_deadline(lambda: 42, 5.0, "t") == 42

    def test_none_after_deadline(self):
        t0 = time.perf_counter()
        r = bench._wait_with_deadline(lambda: time.sleep(30), 0.2, "t")
        assert r is None
        assert time.perf_counter() - t0 < 5.0

    def test_propagates_error(self):
        def boom():
            raise ValueError("x")

        with pytest.raises(ValueError):
            bench._wait_with_deadline(boom, 5.0, "t")


class TestSynthMemo:
    """The /tmp JPEG memo must round-trip byte-identically and never let a
    corrupt file kill the driver's run (np.load raises BadZipFile, not
    OSError, on truncation)."""

    @pytest.fixture(autouse=True)
    def _tiny_shapes(self, monkeypatch):
        monkeypatch.setattr(bench, "FRAMES_PER_VIDEO", 6)
        monkeypatch.setattr(bench, "SIZE", 32)
        # same key expression as synth_ped2_shaped (incl. the _gray suffix
        # keyed on the BENCH_GRAY default)
        self.memo = (f"/tmp/ammcnet_bench_synth_s0_6x32"
                     f"{'_gray' if bench.GRAY else ''}.npz")
        import os

        if os.path.exists(self.memo):
            os.remove(self.memo)
        yield
        if os.path.exists(self.memo):
            os.remove(self.memo)

    def test_warm_hit_returns_identical_bytes(self):
        import os

        cold = bench.synth_ped2_shaped(seed=0)
        assert os.path.exists(self.memo)
        warm = bench.synth_ped2_shaped(seed=0)
        assert [bytes(j) for j in cold[0][0]] == \
               [bytes(j) for j in warm[0][0]]

    def test_corrupt_memo_resynthesizes(self):
        bench.synth_ped2_shaped(seed=0)
        with open(self.memo, "wb") as fh:
            fh.write(b"not a zip")
        videos = bench.synth_ped2_shaped(seed=0)
        assert len(videos) == bench.NUM_VIDEOS
        assert len(videos[0][0]) == 6


def test_synth_shares_one_encoded_video():
    """Setup cost must stay O(1 video): all 12 entries alias one
    (jpegs, flows) pair (the timed loop still decodes/uploads each)."""
    videos = bench.synth_ped2_shaped(seed=0)
    assert len(videos) == bench.NUM_VIDEOS
    assert all(v is videos[0] for v in videos)
    jpegs, flows = videos[0]
    assert len(jpegs) == bench.FRAMES_PER_VIDEO
    assert flows.shape == (bench.FRAMES_PER_VIDEO - 1, bench.SIZE,
                           bench.SIZE, 2)
    import cv2

    frame = cv2.imdecode(np.frombuffer(jpegs[0], np.uint8),
                         cv2.IMREAD_COLOR)
    assert frame.shape == (bench.SIZE, bench.SIZE, 3)


class TestLandProgramsLockstep:
    """tools.land_programs must land EXACTLY the programs the driver's
    compile check (__graft_entry__.entry) runs — it now imports the shared
    _build_entry_program instead of hand-copying it (round-2 advisor)."""

    def test_main_consumes_the_shared_builder(self, monkeypatch):
        from ammcnet_aaai2021_tpu.tools import land_programs

        graft = land_programs._import_graft_entry()
        assert hasattr(graft, "_build_entry_program")

        def sentinel():
            raise RuntimeError("sentinel-builder-called")

        monkeypatch.setattr(graft, "_build_entry_program", sentinel)
        with pytest.raises(RuntimeError, match="sentinel-builder-called"):
            land_programs.main()

    def test_entry_builder_traces_at_entry_shapes(self):
        import jax
        import jax.numpy as jnp

        from ammcnet_aaai2021_tpu.tools import land_programs

        graft = land_programs._import_graft_entry()
        gen, fn, shapes = graft._build_entry_program()
        rgb = jax.ShapeDtypeStruct(shapes["rgb"], jnp.float32)
        op = jax.ShapeDtypeStruct(shapes["op"], jnp.float32)
        init_in = (jax.ShapeDtypeStruct(shapes["rgb"][:-1] + (12,),
                                        jnp.float32),
                   jax.ShapeDtypeStruct(shapes["op"][:-1] + (6,),
                                        jnp.float32))
        rng = {"params": jax.ShapeDtypeStruct((2,), jnp.uint32)}
        vars_sds = jax.eval_shape(gen.init, rng, *init_in)
        out = jax.eval_shape(fn, vars_sds, rgb, op)
        b = shapes["rgb"][0]
        assert [o.shape for o in out] == [(b,), (b,), (b,), (b,)]


class TestMedianFps:
    """median_fps: pass 1 (program-load absorber) is excluded whenever a
    later pass completed; a lone pass is reported as-is (honest partial)."""

    def test_single_pass_reported_as_is(self):
        assert bench.median_fps([31.0]) == 31.0

    def test_pass_one_excluded_with_two_passes(self):
        # plain median would be 215.5; the rule reports the steady pass
        assert bench.median_fps([31.0, 400.0]) == 400.0

    def test_pass_one_excluded_with_many_passes(self):
        passes = [31.0, 390.0, 410.0, 400.0]
        assert bench.median_fps(passes) == 400.0

    def test_input_list_not_mutated(self):
        passes = [1.0, 2.0, 3.0]
        bench.median_fps(passes)
        assert passes == [1.0, 2.0, 3.0]
