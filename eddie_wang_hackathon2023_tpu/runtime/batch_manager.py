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


class ContinuousBatchingManager:

    def __init__(self,
                 model,
                 sampling_config: SamplingConfig,
                 max_batch_size: int = 8,
                 max_seq_len: int = 2048,
                 get_inference_requests: Optional[Callable[[int], List[InferenceRequest]]] = None,
                 send_response: Optional[Callable[[Response], None]] = None,
                 params=None):
        self.model = model
        self.sc = sampling_config
        self.B = max_batch_size
        self.S = max_seq_len
        self.get_inference_requests = get_inference_requests or (lambda n: [])
        self.send_response = send_response or (lambda r: None)
        self.params = params if params is not None else model.state_dict()

        self.cache = model.new_kv_cache(self.B, self.S)
        self.lengths = np.zeros((self.B,), np.int32)      # valid tokens in slot
        self.active = np.zeros((self.B,), bool)
        self.budget = np.zeros((self.B,), np.int32)       # remaining new tokens
        self.slot_request: Dict[int, InferenceRequest] = {}
        self.slot_output: Dict[int, List[int]] = {}
        self.last_tokens = np.full((self.B,), self.sc.pad_id, np.int32)

        self._prefill_fns: Dict[int, Callable] = {}
        self._step_fn = jax.jit(self._step_impl, donate_argnums=(1,))

    # -- jitted programs ---------------------------------------------------

    def _prefill_impl(self, params, cache, tokens, slot, length):
        """tokens [1, P] (right-padded to bucket); writes KV at slot,
        returns (first sampled token, cache)."""
        p = tokens.shape[1]
        row_cache = jax.lax.dynamic_slice_in_dim(cache, slot, 1, axis=1)
        logits, row_cache = self.model.apply(
            params, tokens, row_cache, 0, length[None],
            attention_start=None)
        cache = jax.lax.dynamic_update_slice_in_dim(cache, row_cache, slot,
                                                    axis=1)
        # logits at the last VALID position (prompt is right-padded)
        last = logits[0, length - 1].astype(jnp.float32)
        next_tok = jnp.argmax(last, axis=-1).astype(jnp.int32)
        return next_tok, cache

    def _step_impl(self, params, cache, last_tokens, lengths, active):
        """One decode step for all slots.  last_tokens [B]; lengths [B] =
        tokens so far; active [B] bool."""
        seqlen = lengths + 1
        logits, cache = self.model.apply(
            params, last_tokens[:, None], cache, lengths, seqlen)
        logits = logits[:, -1].astype(jnp.float32)
        next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        next_tok = jnp.where(active, next_tok, self.sc.pad_id)
        return next_tok, cache

    # -- host-side scheduling ---------------------------------------------

    def _free_slots(self) -> List[int]:
        return [i for i in range(self.B) if not self.active[i]]

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
        tok = int(next_tok)
        self.active[slot] = True
        self.lengths[slot] = p
        self.budget[slot] = req.max_new_tokens
        self.slot_request[slot] = req
        self.slot_output[slot] = []
        self.last_tokens[slot] = self.sc.pad_id
        self._push_token(slot, tok)

    def _push_token(self, slot: int, tok: int) -> None:
        req = self.slot_request[slot]
        end_id = req.end_id if req.end_id is not None else self.sc.end_id
        self.slot_output[slot].append(tok)
        self.budget[slot] -= 1
        self.last_tokens[slot] = tok
        self.lengths[slot] += 1
        done = (tok == end_id or self.budget[slot] <= 0
                or self.lengths[slot] >= self.S - 1)
        if req.streaming and not done:
            self.send_response(Response(req.request_id,
                                        [tok], finished=False))
        if done:
            self.send_response(Response(req.request_id,
                                        list(self.slot_output[slot]),
                                        finished=True))
            self.active[slot] = False
            del self.slot_request[slot]

    def step(self) -> int:
        """One scheduler tick: admit new requests into free slots, then one
        decode step across active slots.  Returns number of active slots."""
        free = self._free_slots()
        if free:
            for req in self.get_inference_requests(len(free)):
                self._admit(req, free.pop(0))
                if not free:
                    break
        if not self.active.any():
            return 0
        next_tok, self.cache = self._step_fn(
            self.params, self.cache, jnp.asarray(self.last_tokens),
            jnp.asarray(self.lengths), jnp.asarray(self.active))
        next_np = np.asarray(next_tok)
        for slot in range(self.B):
            if self.active[slot]:
                self._push_token(slot, int(next_np[slot]))
        return int(self.active.sum())

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
