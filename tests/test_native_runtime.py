"""Native (C++) batching runtime vs the pure-python fallbacks: identical
block tables, free counts, admissions and stop decisions on random
workloads.  (The reference ships its batch manager only as a pre-built
static lib and cannot test it; here both backends are driven in lockstep.)"""
import numpy as np
import pytest

from eddie_wang_hackathon2023_tpu.native import batch_runtime
from eddie_wang_hackathon2023_tpu.runtime.batch_manager import (_PyScheduler,
                                                                FINISHED)
from eddie_wang_hackathon2023_tpu.runtime.kv_cache_manager import (
    GenerationSequence, KVCacheManager)

pytestmark = pytest.mark.skipif(not batch_runtime.available(),
                                reason="native toolchain unavailable")


class _PyKV:
    """Adapter: int-seq-id API over the python KVCacheManager."""

    def __init__(self, num_layers, num_blocks, tokens_per_block,
                 max_blocks_per_seq, beam_width=1):
        self.m = KVCacheManager(num_layers, num_blocks, tokens_per_block,
                                max_blocks_per_seq, beam_width)
        self.seqs = {}

    def add_sequence(self, sid, context_len):
        seq = GenerationSequence(sid, sid)
        self.seqs[sid] = seq
        self.m.add_sequence(seq, context_len)

    def step(self, finished):
        self.m.step(finished)

    def stop(self, sid):
        self.m.stop(self.seqs.pop(sid))

    @property
    def free_block_count(self):
        return len(self.m.blocks_manager.free_blocks)

    def get_block_index_arrays(self):
        return self.m.get_block_index_arrays()


@pytest.mark.parametrize("beam", [1, 2, 4])
def test_kv_manager_matches_python(beam):
    rng = np.random.default_rng(0)
    py = _PyKV(2, 256, 8, 16, beam_width=beam)
    nat = batch_runtime.NativeKVCacheManager(2, 256, 8, 16, beam_width=beam)
    live = []
    next_id = 0
    for it in range(200):
        op = rng.random()
        if (op < 0.3 and len(live) < 6) or not live:
            clen = int(rng.integers(1, 40))
            py.add_sequence(next_id, clen)
            nat.add_sequence(next_id, clen)
            live.append(next_id)
            next_id += 1
        elif op < 0.45 and live:
            sid = live.pop(int(rng.integers(len(live))))
            py.stop(sid)
            nat.stop(sid)
        else:
            fin = [bool(rng.random() < 0.15) for _ in live]
            py.step(fin)
            nat.step(fin)
        assert py.free_block_count == nat.free_block_count, it
        np.testing.assert_array_equal(py.get_block_index_arrays(),
                                      nat.get_block_index_arrays(),
                                      err_msg=f"iter {it}")


def test_kv_pool_exhaustion_raises():
    nat = batch_runtime.NativeKVCacheManager(1, 4, 8, 8, beam_width=1)
    nat.add_sequence(0, 30)          # 4 blocks of 8 tokens
    with pytest.raises(RuntimeError):
        nat.add_sequence(1, 1)


def test_scheduler_matches_python():
    rng = np.random.default_rng(1)
    py = _PyScheduler(4, 64, end_id=99)
    nat = batch_runtime.NativeScheduler(4, 64, end_id=99)
    next_id = 0
    for it in range(300):
        if rng.random() < 0.2:
            mx = int(rng.integers(1, 10))
            eid = -1 if rng.random() < 0.5 else 99
            stream = bool(rng.random() < 0.3)
            py.add_request(next_id, mx, eid, stream)
            nat.add_request(next_id, mx, eid, stream)
            next_id += 1
        while True:
            s_py, r_py = py.next_admission()
            s_nat, r_nat = nat.next_admission()
            assert (s_py, r_py) == (s_nat, r_nat), it
            if s_py < 0:
                break
            plen = int(rng.integers(1, 20))
            py.on_admitted(s_py, plen)
            nat.on_admitted(s_nat, plen)
            tok = int(rng.integers(0, 101))   # may hit end_id 99
            assert py.push_token(s_py, tok) == nat.push_token(s_nat, tok)
        a_py, l_py, t_py = py.state()
        a_nat, l_nat, t_nat = nat.state()
        np.testing.assert_array_equal(a_py, a_nat)
        active = a_py
        np.testing.assert_array_equal(l_py[active], l_nat[active])
        np.testing.assert_array_equal(t_py[active], t_nat[active])
        assert py.num_pending == nat.num_pending
        assert py.num_active == nat.num_active
        # advance all active slots one generated token
        for s in np.nonzero(active)[0]:
            tok = int(rng.integers(0, 101))
            assert py.push_token(int(s), tok) == nat.push_token(int(s), tok)


def test_scheduler_stop_conditions():
    nat = batch_runtime.NativeScheduler(2, 8, end_id=5)
    # end-id stop
    nat.add_request(0, 100)
    slot, rid = nat.next_admission()
    nat.on_admitted(slot, 2)
    assert nat.push_token(slot, 3) == 0
    assert nat.push_token(slot, 5) & FINISHED
    # budget stop
    nat.add_request(1, 2)
    slot, _ = nat.next_admission()
    nat.on_admitted(slot, 1)
    assert nat.push_token(slot, 1) == 0
    assert nat.push_token(slot, 2) & FINISHED
    # max-seq-len stop
    nat.add_request(2, 100)
    slot, _ = nat.next_admission()
    nat.on_admitted(slot, 5)
    assert nat.push_token(slot, 1) == 0      # len 6
    assert nat.push_token(slot, 2) & FINISHED  # len 7 == S-1


def test_cpp_self_test(tmp_path):
    """Build and run the pure-C++ self-test binary (the reference's C++
    unit-test tier, C/tests/, minus the gtest dependency)."""
    import os
    import subprocess
    src_dir = os.path.dirname(batch_runtime.__file__)
    exe = os.path.join(tmp_path, "test_batch_runtime")
    subprocess.run(["g++", "-O1", "-std=c++17", "-o", exe,
                    os.path.join(src_dir, "test_batch_runtime.cc"),
                    os.path.join(src_dir, "batch_runtime.cc")],
                   check=True, capture_output=True)
    r = subprocess.run([exe], capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "ALL NATIVE TESTS PASSED" in r.stdout
