"""Continuous (in-flight) batching manager.

Counterpart of the reference's batch manager
(``include/tensorrt_llm/batch_manager/GptManager.h:48`` — shipped only as a
pre-built static lib — plus the IFB attention plugin and
``D/in_flight_batching.md``): requests enter and leave the running batch
between decode steps, without draining it.

TPU-native shape: a fixed pool of B slots over one preallocated KV cache
[n_layer, B, 2, H, S_max, D].  Admission runs a bucketed-length prefill
that writes the prompt's KV into the slot (per-row write positions via the
vmapped cache update in ops/attention.append_kv); every scheduler tick then
runs ONE jitted decode step over all slots with per-slot lengths and
active masks.  Finished slots are freed and refilled.  All shapes are
static => exactly two compiled programs per prompt bucket (prefill) + one
step program, reused forever.

API mirrors the reference's callback design (GetInferenceRequestsCallback /
SendResponseCallback, ref callbacks.h).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .sampling import SamplingConfig


@dataclasses.dataclass
class InferenceRequest:
    """ref InferenceRequest (batch_manager/InferenceRequest.h)."""
    request_id: int
    input_ids: np.ndarray           # [prompt_len] int32
    max_new_tokens: int = 64
    end_id: Optional[int] = None
    streaming: bool = False


@dataclasses.dataclass
class Response:
    request_id: int
    output_ids: List[int]
    finished: bool


def _bucket(n: int, sizes=(32, 64, 128, 256, 512, 1024, 2048)) -> int:
    for s in sizes:
        if n <= s:
            return s
    return sizes[-1]


FINISHED, STREAM = 1, 2     # push_token flag bits (shared with native lib)


class _PyScheduler:
    """Pure-python fallback for native.batch_runtime.NativeScheduler — same
    API, same semantics (the equivalence test drives both on random
    traces)."""

    def __init__(self, max_slots: int, max_seq_len: int, end_id: int):
        self.max_slots = max_slots
        self.max_seq_len = max_seq_len
        self.default_end_id = end_id
        self.pending: List[tuple] = []
        self.active = np.zeros((max_slots,), bool)
        self.lengths = np.zeros((max_slots,), np.int32)
        self.budget = np.zeros((max_slots,), np.int32)
        self.last_token = np.zeros((max_slots,), np.int32)
        self.end_id = np.full((max_slots,), end_id, np.int32)
        self.streaming = np.zeros((max_slots,), bool)

    def add_request(self, request_id: int, max_new_tokens: int,
                    end_id: int = -1, streaming: bool = False) -> None:
        self.pending.append((request_id, max_new_tokens,
                             self.default_end_id if end_id < 0 else end_id,
                             streaming))

    def next_admission(self):
        if not self.pending:
            return -1, -1
        for s in range(self.max_slots):
            if not self.active[s]:
                rid, max_new, eid, stream = self.pending.pop(0)
                self.active[s] = True
                self.lengths[s] = 0
                self.budget[s] = max_new
                self.end_id[s] = eid
                self.streaming[s] = stream
                return s, rid
        return -1, -1

    def on_admitted(self, slot: int, prompt_len: int) -> None:
        self.lengths[slot] = prompt_len

    def push_token(self, slot: int, tok: int) -> int:
        self.budget[slot] -= 1
        self.last_token[slot] = tok
        self.lengths[slot] += 1
        done = (tok == self.end_id[slot] or self.budget[slot] <= 0
                or self.lengths[slot] >= self.max_seq_len - 1)
        if done:
            self.active[slot] = False
            return FINISHED
        return STREAM if self.streaming[slot] else 0

    @property
    def num_pending(self) -> int:
        return len(self.pending)

    @property
    def num_active(self) -> int:
        return int(self.active.sum())

    def state(self):
        return (self.active.copy(), self.lengths.copy(),
                self.last_token.copy())


def make_scheduler(max_slots: int, max_seq_len: int, end_id: int,
                   native: Optional[bool] = None):
    """Native C++ scheduler when the toolchain is available (the reference's
    batch manager is C++-only); python fallback otherwise."""
    from ..native import batch_runtime
    if native is None:
        native = batch_runtime.available()
    if native:
        return batch_runtime.NativeScheduler(max_slots, max_seq_len, end_id)
    return _PyScheduler(max_slots, max_seq_len, end_id)


class ContinuousBatchingManager:

    def __init__(self,
                 model,
                 sampling_config: SamplingConfig,
                 max_batch_size: int = 8,
                 max_seq_len: int = 2048,
                 get_inference_requests: Optional[Callable[[int], List[InferenceRequest]]] = None,
                 send_response: Optional[Callable[[Response], None]] = None,
                 params=None,
                 native_scheduler: Optional[bool] = None,
                 steps_per_tick: int = 1):
        self.model = model
        self.sc = sampling_config
        self.B = max_batch_size
        self.S = max_seq_len
        # tokens generated per scheduler tick: >1 amortises the host round
        # trip (dominant on remote/tunnelled devices) at the cost of up to
        # steps_per_tick-1 wasted steps after a slot hits EOT and the same
        # added admission latency for queued requests
        self.steps_per_tick = max(1, steps_per_tick)
        self.get_inference_requests = get_inference_requests or (lambda n: [])
        self.send_response = send_response or (lambda r: None)
        self.params = params if params is not None else model.state_dict()

        self.cache = model.new_kv_cache(self.B, self.S)
        self.sched = make_scheduler(self.B, self.S, self.sc.end_id,
                                    native_scheduler)
        self._requests: Dict[int, InferenceRequest] = {}   # queued, by id
        self.slot_request: Dict[int, InferenceRequest] = {}
        self.slot_output: Dict[int, List[int]] = {}
        # true prompt length per slot — models with needs_context_lengths
        # (GLM's 2D positions) require it at every step
        self._needs_ctx = getattr(model, "needs_context_lengths", False)
        self._ctx_lens = np.zeros((self.B,), np.int32)

        self._prefill_fns: Dict[int, Callable] = {}
        self._step_fn = jax.jit(self._step_impl, donate_argnums=(1,))

    # -- jitted programs ---------------------------------------------------

    def _prefill_impl(self, params, cache, tokens, slot, length):
        """tokens [1, P] (right-padded to bucket); writes KV at slot,
        returns (first sampled token, cache)."""
        p = tokens.shape[1]
        row_cache = jax.lax.dynamic_slice_in_dim(cache, slot, 1, axis=1)
        extra = (dict(context_lengths=length[None])
                 if self._needs_ctx else {})
        logits, row_cache = self.model.apply(
            params, tokens, row_cache, 0, length[None],
            attention_start=None, **extra)
        cache = jax.lax.dynamic_update_slice_in_dim(cache, row_cache, slot,
                                                    axis=1)
        # logits at the last VALID position (prompt is right-padded)
        last = logits[0, length - 1].astype(jnp.float32)
        next_tok = jnp.argmax(last, axis=-1).astype(jnp.int32)
        return next_tok, cache

    def _step_impl(self, params, cache, last_tokens, lengths, active,
                   ctx_lens=None):
        """steps_per_tick decode steps for all slots in one program.
        last_tokens [B]; lengths [B] = tokens so far; active [B] bool.
        Returns (tokens [B, steps_per_tick], cache)."""
        extra = dict(context_lengths=ctx_lens) if self._needs_ctx else {}

        def one(carry, _):
            cache, toks, lens = carry
            logits, cache = self.model.apply(
                params, toks[:, None], cache, lens, lens + 1, **extra)
            nt = jnp.argmax(logits[:, -1].astype(jnp.float32),
                            axis=-1).astype(jnp.int32)
            nt = jnp.where(active, nt, self.sc.pad_id)
            return (cache, nt, lens + 1), nt

        (cache, _, _), toks = jax.lax.scan(
            one, (cache, last_tokens, lengths), None,
            length=self.steps_per_tick)
        return toks.T, cache

    # -- host-side scheduling (delegated to the scheduler backend) ---------

    def _admit(self, req: InferenceRequest, slot: int) -> None:
        prompt = np.asarray(req.input_ids, np.int32).reshape(1, -1)
        p = prompt.shape[1]
        bucket = _bucket(p)
        padded = np.full((1, bucket), self.sc.pad_id, np.int32)
        padded[0, :p] = prompt[0]
        if bucket not in self._prefill_fns:
            self._prefill_fns[bucket] = jax.jit(self._prefill_impl,
                                                donate_argnums=(1,))
        next_tok, self.cache = self._prefill_fns[bucket](
            self.params, self.cache, jnp.asarray(padded),
            jnp.asarray(slot, jnp.int32), jnp.asarray(p, jnp.int32))
        self.sched.on_admitted(slot, p)
        self._ctx_lens[slot] = p
        self.slot_request[slot] = req
        self.slot_output[slot] = []
        self._push_token(slot, int(next_tok))

    def _push_token(self, slot: int, tok: int) -> int:
        """Account one generated token; the done/stream decision comes from
        the scheduler backend (native C++ when available)."""
        req = self.slot_request[slot]
        self.slot_output[slot].append(tok)
        flags = self.sched.push_token(slot, tok)
        if flags & FINISHED:
            self.send_response(Response(req.request_id,
                                        list(self.slot_output[slot]),
                                        finished=True))
            del self.slot_request[slot]
        elif flags & STREAM:
            self.send_response(Response(req.request_id, [tok],
                                        finished=False))
        return flags

    def step(self) -> int:
        """One scheduler tick: admit new requests into free slots, then one
        decode step across active slots.  Returns number of active slots."""
        free = self.B - self.sched.num_active
        if free > 0:
            for req in self.get_inference_requests(free):
                eid = req.end_id if req.end_id is not None else self.sc.end_id
                self._requests[req.request_id] = req
                self.sched.add_request(req.request_id, req.max_new_tokens,
                                       eid, req.streaming)
        while True:
            slot, rid = self.sched.next_admission()
            if slot < 0:
                break
            self._admit(self._requests.pop(rid), slot)
        active, lengths, last_tokens = self.sched.state()
        if not active.any():
            return 0
        next_tok, self.cache = self._step_fn(
            self.params, self.cache, jnp.asarray(last_tokens),
            jnp.asarray(lengths), jnp.asarray(active),
            jnp.asarray(self._ctx_lens))
        next_np = np.asarray(next_tok)                  # [B, steps_per_tick]
        live = list(active)
        for k in range(next_np.shape[1]):
            for slot in range(self.B):
                if live[slot]:
                    flags = self._push_token(slot, int(next_np[slot, k]))
                    if flags & FINISHED:
                        live[slot] = False
        return self.sched.num_active

    def run(self, max_ticks: int = 1_000_000) -> None:
        """Drive until queues drain (ref GptManager event loop)."""
        idle = 0
        for _ in range(max_ticks):
            n = self.step()
            if n == 0:
                idle += 1
                if idle >= 2:   # two empty polls => drained
                    break
            else:
                idle = 0
