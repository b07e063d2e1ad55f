"""ctypes bindings for the native batching runtime (batch_runtime.cc):
paged-KV block bookkeeping + the continuous-batching slot scheduler.

Drop-in behavioural equivalents of the pure-python
``runtime/kv_cache_manager.KVCacheManager`` and the host bookkeeping inside
``runtime/batch_manager.ContinuousBatchingManager`` (the reference ships
this layer only as a C++ static lib — batch_manager/
libtensorrt_llm_batch_manager_static.a)."""
from __future__ import annotations

import ctypes
from functools import lru_cache
from typing import List, Tuple

import numpy as np

from . import _build

c_u8p = ctypes.POINTER(ctypes.c_uint8)
c_i32p = ctypes.POINTER(ctypes.c_int32)
c_i64p = ctypes.POINTER(ctypes.c_int64)


@lru_cache(maxsize=1)
def _lib():
    lib = ctypes.CDLL(_build("ewtruntime", ["batch_runtime.cc"]))
    lib.ewt_kv_create.restype = ctypes.c_void_p
    lib.ewt_kv_create.argtypes = [ctypes.c_int] * 4
    lib.ewt_kv_destroy.argtypes = [ctypes.c_void_p]
    lib.ewt_kv_add_sequence.restype = ctypes.c_int
    lib.ewt_kv_add_sequence.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                        ctypes.c_int]
    lib.ewt_kv_step.restype = ctypes.c_int
    lib.ewt_kv_step.argtypes = [ctypes.c_void_p, c_u8p]
    lib.ewt_kv_stop.restype = ctypes.c_int
    lib.ewt_kv_stop.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ewt_kv_num_sequences.restype = ctypes.c_int
    lib.ewt_kv_num_sequences.argtypes = [ctypes.c_void_p]
    lib.ewt_kv_free_blocks.restype = ctypes.c_int
    lib.ewt_kv_free_blocks.argtypes = [ctypes.c_void_p]
    lib.ewt_kv_block_table.argtypes = [ctypes.c_void_p, c_i32p]

    lib.ewt_sched_create.restype = ctypes.c_void_p
    lib.ewt_sched_create.argtypes = [ctypes.c_int] * 3
    lib.ewt_sched_destroy.argtypes = [ctypes.c_void_p]
    lib.ewt_sched_add_request.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                          ctypes.c_int, ctypes.c_int,
                                          ctypes.c_uint8]
    lib.ewt_sched_next_admission.restype = ctypes.c_int
    lib.ewt_sched_next_admission.argtypes = [ctypes.c_void_p, c_i64p]
    lib.ewt_sched_on_admitted.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                          ctypes.c_int]
    lib.ewt_sched_push_token.restype = ctypes.c_int
    lib.ewt_sched_push_token.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                         ctypes.c_int]
    lib.ewt_sched_num_pending.restype = ctypes.c_int
    lib.ewt_sched_num_pending.argtypes = [ctypes.c_void_p]
    lib.ewt_sched_num_active.restype = ctypes.c_int
    lib.ewt_sched_num_active.argtypes = [ctypes.c_void_p]
    lib.ewt_sched_state.argtypes = [ctypes.c_void_p, c_u8p, c_i32p, c_i32p]
    return lib


def available() -> bool:
    try:
        _lib()
        return True
    except Exception:
        return False


class NativeKVCacheManager:
    """Same API/semantics as runtime.kv_cache_manager.KVCacheManager, with
    the bookkeeping in C++.  Sequences are identified by integer seq ids."""

    def __init__(self, num_layers: int, num_blocks: int,
                 tokens_per_block: int, max_blocks_per_seq: int,
                 beam_width: int = 1):
        self._lib = _lib()
        self.num_layers = num_layers
        self.tokens_per_block = tokens_per_block
        self.max_blocks_per_seq = max_blocks_per_seq
        self.beam_width = beam_width
        self._h = ctypes.c_void_p(self._lib.ewt_kv_create(
            num_blocks, tokens_per_block, max_blocks_per_seq, beam_width))

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.ewt_kv_destroy(h)
            self._h = None

    def add_sequence(self, seq_id: int, context_len: int) -> None:
        if self._lib.ewt_kv_add_sequence(self._h, seq_id, context_len) != 0:
            raise RuntimeError("KV cache block pool exhausted")

    def step(self, finished: List[bool]) -> None:
        arr = np.asarray(finished, np.uint8)
        if self._lib.ewt_kv_step(self._h, arr.ctypes.data_as(c_u8p)) != 0:
            raise RuntimeError("KV cache block pool exhausted")

    def stop(self, seq_id: int) -> None:
        if self._lib.ewt_kv_stop(self._h, seq_id) != 0:
            raise KeyError(f"unknown sequence {seq_id}")

    @property
    def num_sequences(self) -> int:
        return self._lib.ewt_kv_num_sequences(self._h)

    @property
    def free_block_count(self) -> int:
        return self._lib.ewt_kv_free_blocks(self._h)

    def get_block_index_arrays(self) -> np.ndarray:
        n = self.num_sequences
        out = np.empty((n, self.beam_width, self.max_blocks_per_seq), np.int32)
        self._lib.ewt_kv_block_table(self._h, out.ctypes.data_as(c_i32p))
        return out


class NativeScheduler:
    """Slot lifecycle + stop decisions for continuous batching (the host
    half of GptManager).  Flag bits from push_token: 1=finished, 2=stream."""

    FINISHED = 1
    STREAM = 2

    def __init__(self, max_slots: int, max_seq_len: int, end_id: int):
        self._lib = _lib()
        self.max_slots = max_slots
        self._h = ctypes.c_void_p(
            self._lib.ewt_sched_create(max_slots, max_seq_len, end_id))

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.ewt_sched_destroy(h)
            self._h = None

    def add_request(self, request_id: int, max_new_tokens: int,
                    end_id: int = -1, streaming: bool = False) -> None:
        self._lib.ewt_sched_add_request(self._h, request_id, max_new_tokens,
                                        end_id, int(streaming))

    def next_admission(self) -> Tuple[int, int]:
        """(slot, request_id), or (-1, -1) when nothing to admit."""
        rid = ctypes.c_int64(-1)
        slot = self._lib.ewt_sched_next_admission(self._h, ctypes.byref(rid))
        return slot, int(rid.value)

    def on_admitted(self, slot: int, prompt_len: int) -> None:
        self._lib.ewt_sched_on_admitted(self._h, slot, prompt_len)

    def push_token(self, slot: int, tok: int) -> int:
        return self._lib.ewt_sched_push_token(self._h, slot, tok)

    @property
    def num_pending(self) -> int:
        return self._lib.ewt_sched_num_pending(self._h)

    @property
    def num_active(self) -> int:
        return self._lib.ewt_sched_num_active(self._h)

    def state(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(active [S] bool, lengths [S] i32, last_tokens [S] i32) views for
        feeding the jitted step program."""
        active = np.empty((self.max_slots,), np.uint8)
        lengths = np.empty((self.max_slots,), np.int32)
        last = np.empty((self.max_slots,), np.int32)
        self._lib.ewt_sched_state(self._h, active.ctypes.data_as(c_u8p),
                                  lengths.ctypes.data_as(c_i32p),
                                  last.ctypes.data_as(c_i32p))
        return active.astype(bool), lengths, last
