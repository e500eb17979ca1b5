"""Tests for the self-review fixes: branch freeze (in test_train_step),
reference-exact op-psnr bug, blockwise batch-commit, record-shard merge."""

import numpy as np
import pytest

from ammcnet_aaai2021_tpu.eval.infer import blockwise_mean, op_psnr_reference_bug


class TestBlockwiseMean:
    def test_partial_final_block_uses_real_members_only(self):
        v = np.array([1.0, 3.0, 5.0, 7.0, 10.0], np.float32)
        out = blockwise_mean(v, block=2)
        np.testing.assert_allclose(out, [2, 2, 6, 6, 10])


class TestOpPsnrReferenceBug:
    def test_matches_torch_broadcast_oracle(self, rng):
        torch = pytest.importorskip("torch")
        import jax.numpy as jnp

        b, h, w = 3, 16, 12
        op_input = rng.uniform(-1, 1, (b, h, w, 6)).astype(np.float32)
        op_pred = rng.uniform(-1, 1, (b, h, w, 2)).astype(np.float32)
        got = np.asarray(op_psnr_reference_bug(jnp.asarray(op_pred),
                                               jnp.asarray(op_input)))
        # torch oracle reproducing test_helper.py:434-464 + psnr_error
        fields = torch.from_numpy(op_input.reshape(b, h, w, 3, 2)
                                  .transpose(0, 3, 4, 1, 2).copy())  # (b,3,2,h,w)
        pred = torch.from_numpy(op_pred.transpose(0, 3, 1, 2).copy())  # (b,2,h,w)
        ref = []
        for i in range(b):
            gen = pred[i].unsqueeze(0)          # (1,2,h,w)
            gt = fields[i].unsqueeze(0)         # (1,3,2,h,w)
            num_pixels = gen.shape[1] * gen.shape[2] * gen.shape[3]
            gtn, genn = (gt + 1) / 2, (gen + 1) / 2
            sq = (gtn - genn) ** 2              # broadcast (1,3,2,h,w)
            errors = 10 * torch.log10(
                1.0 / ((1.0 / num_pixels) * torch.sum(sq, dim=[1, 2, 3])))
            ref.append(float(errors.mean()))
        np.testing.assert_allclose(got, ref, rtol=1e-4)


class TestRecordShardMerge:
    def test_roundtrip_and_order(self, tmp_path, rng, monkeypatch):
        import jax

        from ammcnet_aaai2021_tpu.parallel.multihost import (
            merge_record_shards, write_record_shard)

        names = ["01", "02", "03"]
        keys = ["rgb_img_pred_records", "rgb_fea_comm_records"]
        full = {k: [rng.random(5 + i) for i in range(3)] for k in keys}
        # emulate 2 hosts: host0 gets videos 0,2; host1 gets 1 (round robin)
        shard_dir = str(tmp_path)
        write_record_shard(shard_dir,
                           {k: [full[k][0], full[k][2]] for k in keys},
                           ["01", "03"])
        monkeypatch.setattr(jax, "process_index", lambda: 1)
        write_record_shard(shard_dir, {k: [full[k][1]] for k in keys}, ["02"])
        merged = merge_record_shards(shard_dir, names, n_shards=2)
        for k in keys:
            for a, b in zip(merged[k], full[k]):
                np.testing.assert_array_equal(a, b)

    def test_missing_video_raises(self, tmp_path, rng):
        from ammcnet_aaai2021_tpu.parallel.multihost import (
            merge_record_shards, write_record_shard)

        write_record_shard(str(tmp_path),
                           {"rgb_img_pred_records": [rng.random(4)]}, ["01"])
        with pytest.raises(RuntimeError, match="missing videos"):
            merge_record_shards(str(tmp_path), ["01", "02"])

    def test_stale_higher_rank_shard_ignored(self, tmp_path, rng,
                                             monkeypatch):
        """A leftover records_00001.pkl from an earlier 2-host run must not
        leak into a later single-host merge (the round-2 advisor finding)."""
        import jax

        from ammcnet_aaai2021_tpu.parallel.multihost import (
            merge_record_shards, write_record_shard)

        keys = ["rgb_img_pred_records"]
        stale = {k: [rng.random(5)] for k in keys}
        monkeypatch.setattr(jax, "process_index", lambda: 1)
        write_record_shard(str(tmp_path), stale, ["01"])
        monkeypatch.setattr(jax, "process_index", lambda: 0)
        fresh = {k: [rng.random(5)] for k in keys}
        write_record_shard(str(tmp_path), fresh, ["01"])
        merged = merge_record_shards(str(tmp_path), ["01"], n_shards=1)
        np.testing.assert_array_equal(merged[keys[0]][0], fresh[keys[0]][0])

    def test_wait_for_shards_sees_late_file(self, tmp_path):
        import threading
        import time as _time

        from ammcnet_aaai2021_tpu.parallel.multihost import wait_for_shards

        path = tmp_path / "records_00000.pkl"

        def write_late():
            _time.sleep(0.2)
            path.write_bytes(b"x")

        t = threading.Thread(target=write_late)
        t.start()
        wait_for_shards(str(tmp_path), n_shards=1, timeout_s=10, poll_s=0.05)
        t.join()

    def test_wait_for_shards_timeout_names_missing_ranks(self, tmp_path):
        from ammcnet_aaai2021_tpu.parallel.multihost import wait_for_shards

        with pytest.raises(TimeoutError, match=r"\[0, 1\]"):
            wait_for_shards(str(tmp_path), n_shards=2, timeout_s=0.2,
                            poll_s=0.05)

    def test_consume_shard_dir_renames_then_removes(self, tmp_path):
        from ammcnet_aaai2021_tpu.parallel.multihost import consume_shard_dir

        d = tmp_path / "run_abc"
        d.mkdir()
        (d / "records_00000.pkl").write_bytes(b"x")
        consume_shard_dir(str(d))
        assert not d.exists()
        assert not (tmp_path / "run_abc.consumed").exists()

    def test_wait_for_merge_returns_once_consumed(self, tmp_path):
        import threading
        import time as _time

        from ammcnet_aaai2021_tpu.parallel.multihost import (
            consume_shard_dir, wait_for_merge)

        d = tmp_path / "run_def"
        d.mkdir()

        def consume_late():
            _time.sleep(0.2)
            consume_shard_dir(str(d))

        t = threading.Thread(target=consume_late)
        t.start()
        wait_for_merge(str(d), timeout_s=10, poll_s=0.05)
        t.join()
        assert not d.exists()

    def test_wait_for_merge_timeout_warns_not_hangs(self, tmp_path):
        from ammcnet_aaai2021_tpu.parallel.multihost import wait_for_merge

        d = tmp_path / "run_ghi"
        d.mkdir()
        with pytest.warns(RuntimeWarning, match="did not consume"):
            wait_for_merge(str(d), timeout_s=0.2, poll_s=0.05)

    def test_run_token_single_process_is_fresh_hex(self):
        from ammcnet_aaai2021_tpu.parallel.multihost import agree_on_run_token

        a, b = agree_on_run_token(), agree_on_run_token()
        assert a != b and len(a) == 32
        int(a, 16)  # valid hex

    def test_warm_collectives_single_process_noop(self):
        # must not touch any backend/collective machinery single-process
        from ammcnet_aaai2021_tpu.parallel.multihost import warm_collectives

        warm_collectives()

    def test_cpu_cache_dir_is_machine_keyed(self, tmp_path):
        # CPU-only processes must never share AOT executables across
        # machines (cpu_aot_loader SIGILL risk after a VM migration); the
        # suite runs under jax_platforms=cpu so the subdir must be applied
        from ammcnet_aaai2021_tpu.utils.compile_cache import (
            _machine_fingerprint, enable_compilation_cache)

        import os

        got = enable_compilation_cache(str(tmp_path / "cache"))
        fp = _machine_fingerprint()
        assert got == str(tmp_path / "cache" / f"cpu-{fp}")
        assert os.path.isdir(got)
        assert len(fp) == 10
        # fingerprint is stable within one host
        assert _machine_fingerprint() == fp
        # restore the suite-wide cache dir (conftest set it at import)
        enable_compilation_cache()
