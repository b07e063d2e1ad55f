"""Continuous (in-flight) batching manager.

Counterpart of the reference's batch manager
(``include/tensorrt_llm/batch_manager/GptManager.h:48`` — shipped only as a
pre-built static lib — plus the IFB attention plugin and
``D/in_flight_batching.md``): requests enter and leave the running batch
between decode steps, without draining it.

TPU-native shape: a fixed pool of B slots over one preallocated KV cache —
either a dense [n_layer, B, 2, H, S_max, D] slot cache or (``paged=True``)
a block pool [n_layer, N, 2, H, T, D] addressed through per-slot block
tables from the (python or native C++) KV cache manager, the reference's
paged_kv_cache mode (D/gpt_attention.md:168-200).  Admission runs a
bucketed-length prefill that writes the prompt's KV into the slot; every
scheduler tick then runs ONE jitted decode step over all slots with
per-slot lengths and active masks.  All shapes are static => exactly two
compiled programs per prompt bucket (prefill) + one step program, reused
forever.

Sampling is first-class (ref GptManager serving arbitrary per-request
SamplingConfig): each slot carries its request's temperature / top-k /
top-p / penalties / min-length / end-id and bad-words list as rows of
traced device arrays consumed by :func:`~.sampling.dynamic_decode` inside
the jitted step — values change per request, the compiled program doesn't.
Per-request stop-words are enforced host-side at push time (exact
semantics, any list shape).

API mirrors the reference's callback design (GetInferenceRequestsCallback /
SendResponseCallback, ref callbacks.h).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .kv_cache_manager import GenerationSequence, KVCacheManager
from .sampling import DecodeParams, SamplingConfig, dynamic_decode


@dataclasses.dataclass
class InferenceRequest:
    """ref InferenceRequest (batch_manager/InferenceRequest.h)."""
    request_id: int
    input_ids: np.ndarray           # [prompt_len] int32
    max_new_tokens: int = 64
    end_id: Optional[int] = None
    streaming: bool = False
    # per-request sampling overrides (ref GptManager.h:48 per-entry
    # SamplingConfig); None => the manager's config
    sampling: Optional[SamplingConfig] = None


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
                 steps_per_tick: int = 1,
                 paged: bool = False,
                 tokens_per_block: int = 32,
                 num_blocks: Optional[int] = None,
                 max_top_k: int = 64,
                 max_bad_words: int = 4,
                 max_bad_word_len: int = 4,
                 mixed_admission: bool = False,
                 chunk_width: int = 16,
                 max_beam_width: int = 1,
                 ):
        self.model = model
        self.sc = sampling_config
        self.B = max_batch_size
        self.S = max_seq_len
        # per-request beam search in serving (ref GptManager.h:48 takes a
        # full per-entry SamplingConfig incl. beamWidth): the slot cache
        # holds max_beam_width physical rows per slot; each request uses
        # its own width <= max (greedy/sampled requests = width 1).  Beam
        # reordering rides the cache_indirection row map — the cache never
        # physically reorders (same trick as the offline GenerationSession)
        self.W = max(1, max_beam_width)
        # tokens generated per scheduler tick: >1 amortises the host round
        # trip (dominant on remote/tunnelled devices) at the cost of up to
        # steps_per_tick-1 wasted steps after a slot hits EOT and the same
        # added admission latency for queued requests
        self.steps_per_tick = max(1, steps_per_tick)
        self.get_inference_requests = get_inference_requests or (lambda n: [])
        self.send_response = send_response or (lambda r: None)
        self.params = params if params is not None else model.state_dict()
        self.paged = paged
        self.tokens_per_block = tokens_per_block
        self.max_blocks_per_seq = -(-self.S // tokens_per_block)
        self.max_top_k = max_top_k

        if paged:
            nb = num_blocks or self.B * self.W * self.max_blocks_per_seq
            self.num_blocks = nb
            self.pool = model.new_paged_pool(nb, tokens_per_block)
            self.kvman = KVCacheManager(
                num_layers=self.pool.shape[0], num_blocks=nb,
                tokens_per_block=tokens_per_block,
                max_blocks_per_seq=self.max_blocks_per_seq,
                beam_width=self.W)
            self._kv_seqs: Dict[int, GenerationSequence] = {}   # slot -> seq
            self._seq_counter = 0
            self.cache = None
            self.S_cache = self.S
        else:
            # beam x mixed: the chunk feeder parks excluded rows' window
            # writes at their NEXT pending position; chunk_width columns of
            # slack keep the end-of-cache dynamic-update-slice from
            # clamping back onto real KV
            self.S_cache = self.S + (max(2, chunk_width)
                                     if mixed_admission and self.W > 1
                                     else 0)
            self.cache = model.new_kv_cache(self.B * self.W, self.S_cache)
        self.sched = make_scheduler(self.B, self.S, _scalar(self.sc.end_id),
                                    native_scheduler)
        self._requests: Dict[int, InferenceRequest] = {}   # queued, by id
        self.slot_request: Dict[int, InferenceRequest] = {}
        self.slot_output: Dict[int, List[int]] = {}
        # true prompt length per slot — models with needs_context_lengths
        # (GLM's 2D positions) require it at every step
        self._needs_ctx = getattr(model, "needs_context_lengths", False)
        self._ctx_lens = np.zeros((self.B,), np.int32)

        # -- per-slot sampling state (host mirrors of the traced arrays) --
        v = model.config.vocab_size
        self._vocab = v
        sc = self.sc
        self._temp = np.full((self.B,), _scalar(sc.temperature), np.float32)
        self._topk = np.full((self.B,), _scalar(sc.top_k), np.int32)
        self._topp = np.full((self.B,), _scalar(sc.top_p), np.float32)
        self._rep = np.full((self.B,), _scalar(sc.repetition_penalty),
                            np.float32)
        self._pres = np.full((self.B,), _scalar(sc.presence_penalty),
                             np.float32)
        self._minlen = np.full((self.B,), _scalar(sc.min_length), np.int32)
        self._end_ids = np.full((self.B,), _scalar(sc.end_id), np.int32)
        self._seeds = np.zeros((self.B,), np.int64)
        self.NW, self.MW = max_bad_words, max_bad_word_len
        self._bad_words = np.zeros((self.B, self.NW, self.MW), np.int32)
        self._bad_lens = np.zeros((self.B, self.NW), np.int32)
        self._stop_words: Dict[int, List[List[int]]] = {}
        # device-side stop tables (fixed-shape, like the reference's
        # stop_words tensors): let the beam scan freeze a stopped beam
        # IN-STEP; the host lists above stay authoritative for arbitrary
        # word sizes on the per-tick paths
        self._stopw = np.zeros((self.B, self.NW, self.MW), np.int32)
        self._stopl = np.zeros((self.B, self.NW), np.int32)
        # the rolling tail must hold a FULL stop word (MW) for in-scan
        # matching, not just the MW-1 bad-word prefix
        self._tail_len = max(self.MW, 1)
        # device-resident penalty counts + ban-window tail, carried through
        # the jitted programs (never round-tripped to host).  One row per
        # physical cache row (slots x beams)
        rows = self.B * self.W
        self._counts = jnp.zeros((rows, v), jnp.int32)
        self._tail = jnp.full((rows, self._tail_len), -1, jnp.int32)
        self._base_key = jax.random.PRNGKey(_scalar(sc.random_seed))
        self._tick = 0
        if self.W > 1:
            # beam state: device-resident indirection; host mirrors of the
            # small per-(slot, beam) arrays (the tick fetches tokens anyway)
            self._ind = jnp.zeros((self.B, self.W, self.S_cache), jnp.int32)
            self._pending = np.zeros((self.B, self.W), np.int32)
            self._cum = np.full((self.B, self.W), -1e9, np.float32)
            self._fins = np.ones((self.B, self.W), bool)
            self._beam_w = np.ones((self.B,), np.int32)
            self._is_sampled = np.ones((self.B,), bool)
            self._beam_hist: Dict[int, List[List[int]]] = {}
            self._beam_prefill_fns: Dict[tuple, Callable] = {}
            self._beam_step_fn = jax.jit(self._beam_step_impl,
                                         donate_argnums=(1, 3, 4, 5))

        # -- mixed context+generation step (true in-flight batching, ref
        # ibGptAttentionPlugin / T/functional.py:2985-3137): admission
        # prefill is fed in chunk_width-token chunks through the SAME tick
        # program that decodes every other slot, so admissions never stall
        # the running batch
        self.mixed_admission = mixed_admission
        self.chunk_width = max(2, chunk_width)
        if mixed_admission:
            assert not getattr(model.config, "bidirectional_context", False), \
                "mixed admission needs causal prompt attention"
        self._prefill_prompt: Dict[int, np.ndarray] = {}
        self._prefill_progress: Dict[int, int] = {}
        self._mixed_fn = jax.jit(self._mixed_step_impl,
                                 donate_argnums=(1, 3, 4))

        self._prefill_fns: Dict[int, Callable] = {}
        self._step_fn = jax.jit(self._step_impl,
                                donate_argnums=(1, 3, 4))

        # (An ``async_depth`` speculative-dispatch mode — tick N+1
        # dispatched before tick N's tokens were fetched — was built in
        # round 3, LOST its round-4 device A/B (245 vs 336 tok/s on v5e:
        # steps_per_tick already amortises the host round trip, and the
        # speculative chain serialised an extra device dependency per
        # tick), and was DELETED in round 5 per the adopt-or-delete
        # discipline.  Raise steps_per_tick to hide host latency.)

    # -- jitted programs ---------------------------------------------------

    def _decode_params(self, batch: int) -> DecodeParams:
        return DecodeParams(
            temperature=jnp.asarray(self._temp[:batch]),
            top_k=jnp.asarray(self._topk[:batch]),
            top_p=jnp.asarray(self._topp[:batch]),
            repetition_penalty=jnp.asarray(self._rep[:batch]),
            presence_penalty=jnp.asarray(self._pres[:batch]),
            min_length=jnp.asarray(self._minlen[:batch]),
            end_id=jnp.asarray(self._end_ids[:batch]),
            bad_words=jnp.asarray(self._bad_words[:batch]),
            bad_word_lens=jnp.asarray(self._bad_lens[:batch]),
            max_top_k=self.max_top_k, greedy=False)

    def _slot_params(self, slot: int) -> DecodeParams:
        return DecodeParams(
            temperature=jnp.asarray(self._temp[slot:slot + 1]),
            top_k=jnp.asarray(self._topk[slot:slot + 1]),
            top_p=jnp.asarray(self._topp[slot:slot + 1]),
            repetition_penalty=jnp.asarray(self._rep[slot:slot + 1]),
            presence_penalty=jnp.asarray(self._pres[slot:slot + 1]),
            min_length=jnp.asarray(self._minlen[slot:slot + 1]),
            end_id=jnp.asarray(self._end_ids[slot:slot + 1]),
            bad_words=jnp.asarray(self._bad_words[slot:slot + 1]),
            bad_word_lens=jnp.asarray(self._bad_lens[slot:slot + 1]),
            max_top_k=self.max_top_k, greedy=False)

    # -- beam serving (ref GptManager per-request beamWidth) ----------------

    def _decode_params_rows(self) -> DecodeParams:
        """DecodeParams with one row per physical cache row (B*W): slot
        values repeated across the slot's beam rows."""
        r = lambda a: jnp.asarray(np.repeat(a, self.W, axis=0))
        return DecodeParams(
            temperature=r(self._temp), top_k=r(self._topk),
            top_p=r(self._topp), repetition_penalty=r(self._rep),
            presence_penalty=r(self._pres), min_length=r(self._minlen),
            end_id=r(self._end_ids), bad_words=r(self._bad_words),
            bad_word_lens=r(self._bad_lens), max_top_k=self.max_top_k,
            greedy=False)

    def _filter_rows(self, lg, dp, counts, glens, tail):
        """The filter half of dynamic_decode (penalties, min-length,
        bad-words over the carried ban tail) — the beam path selects
        tokens itself via beam_search_step."""
        from .sampling import (apply_min_length, apply_presence_penalty,
                               apply_repetition_penalty, ban_bad_words)
        lg = apply_repetition_penalty(lg, counts, dp.repetition_penalty)
        lg = apply_presence_penalty(lg, counts, dp.presence_penalty)
        lg = apply_min_length(lg, glens, dp.min_length, dp.end_id)
        if dp.bad_words is not None:
            lg = ban_bad_words(lg, tail, self._tail_len, dp.bad_words,
                               dp.bad_word_lens)
        return lg

    def _beam_prefill_impl(self, params, cache, table, copy_src, copy_dst,
                           counts, tail, ind, tokens, slot, length, dp_row,
                           rng, live_row, is_beam: bool):
        """Admission into a beam manager: prefill the prompt KV into the
        slot's physical row 0 only; the indirection maps every beam's
        prompt positions to row 0 (no KV tiling — the offline session
        repeats the cache instead, generation.py:125).  Paged mode writes
        through beam-0's block table and then replicates the PARTIAL
        prompt block (``copy_src`` -> ``copy_dst`` [W-1], out-of-range =
        no-op) into each sibling beam's private block — full prompt blocks
        stay shared read-only.  Beam requests expand the top-W first
        continuations; sampled/greedy requests (width 1) sample on beam
        row 0.  Returns (pending [W], cum [W], fin [W], cache, counts,
        tail, ind)."""
        from .sampling import beam_search_step
        v = self._vocab
        W = self.W
        row0 = slot * W
        extra = (dict(context_lengths=length[None])
                 if self._needs_ctx else {})
        if self.paged:
            from ..ops.paged_attention import PagedCacheState
            logits, state = self.model.apply(
                params, tokens, PagedCacheState(cache, table), 0,
                length[None], attention_start=None, **extra)
            cache = state.pool
            part = jnp.broadcast_to(
                cache[:, copy_src][:, None],
                (cache.shape[0], W - 1) + cache.shape[2:])
            cache = cache.at[:, copy_dst].set(part, mode="drop")
        else:
            row_cache = jax.lax.dynamic_slice_in_dim(cache, row0, 1, axis=1)
            logits, row_cache = self.model.apply(
                params, tokens, row_cache, 0, length[None],
                attention_start=None, **extra)
            cache = jax.lax.dynamic_update_slice_in_dim(cache, row_cache,
                                                        row0, axis=1)
        p = tokens.shape[1]
        oh = jax.nn.one_hot(tokens[0], v, dtype=jnp.int32)
        valid = (jnp.arange(p) < length)[:, None]
        prompt_counts = jnp.sum(oh * valid, axis=0)             # [V]
        tl = self._tail_len
        pos = length - tl + jnp.arange(tl)
        tail_prompt = jnp.where(pos >= 0,
                                tokens[0, jnp.clip(pos, 0, p - 1)], -1)
        last = logits[0, length - 1].astype(jnp.float32)[None]  # [1, V]
        pad_id = _scalar(self.sc.pad_id)
        if is_beam:
            lg_f = self._filter_rows(last, dp_row, prompt_counts[None],
                                     jnp.zeros((1,), jnp.int32),
                                     tail_prompt[None])
            # expand the single prefill beam: all but beam 0 start at -inf
            # so the first expansion picks distinct continuations
            # (generation.py:170-173)
            lp_t = jnp.broadcast_to(jax.nn.log_softmax(lg_f[0]),
                                    (1, W, v))
            cum0 = jnp.full((1, W), -1e9, jnp.float32).at[0, 0].set(0.0)
            _, tok, cum, fin = beam_search_step(
                lp_t, cum0, jnp.zeros((1, W), bool), W, dp_row.end_id)
            pending = tok[0]
            cum_row, fin_row = cum[0], fin[0]
        else:
            nt, _ = dynamic_decode(last, rng, dp_row,
                                   token_counts=prompt_counts[None],
                                   cur_lengths=jnp.zeros((1,), jnp.int32),
                                   tokens=tail_prompt[None], cur=tl)
            pending = jnp.full((W,), pad_id, jnp.int32).at[0].set(nt[0])
            cum_row = jnp.full((W,), -1e9, jnp.float32).at[0].set(0.0)
            fin_row = jnp.ones((W,), bool).at[0].set(
                nt[0] == dp_row.end_id[0])
        cum_row = jnp.where(live_row, cum_row, -1e9)
        fin_row = jnp.where(live_row, fin_row, True)
        # every live beam's counts = prompt counts + its own first token
        rows_counts = prompt_counts[None] + \
            jax.nn.one_hot(pending, v, dtype=jnp.int32) * live_row[:, None]
        counts = jax.lax.dynamic_update_slice(counts, rows_counts, (row0, 0))
        rows_tail = jnp.concatenate(
            [jnp.broadcast_to(tail_prompt[1:], (W, tl - 1))
             if tl > 1 else jnp.zeros((W, 0), jnp.int32),
             pending[:, None]], axis=1)
        tail = jax.lax.dynamic_update_slice(tail, rows_tail, (row0, 0))
        # indirection: prompt positions -> physical row 0; position
        # ``length`` (where the pending tokens land next tick) -> own row
        spos = jnp.arange(self.S, dtype=jnp.int32)[None, :]
        ind_slot = jnp.where(spos == length,
                             jnp.arange(W, dtype=jnp.int32)[:, None], 0)
        ind = jax.lax.dynamic_update_slice(ind, ind_slot[None], (slot, 0, 0))
        return pending, cum_row, fin_row, cache, counts, tail, ind

    def _beam_step_impl(self, params, cache, table, counts, tail, ind,
                        pending, cum, fins, live, is_sampled, lengths,
                        gen_lens, active, dp_rows, end_slot, rng,
                        stopw, stopl, ctx_lens=None):
        """steps_per_tick beam/sampling steps for all slots in ONE program.

        pending [B, W] this tick's not-yet-written tokens; lengths [B]
        include the pending token (its KV is written at lengths-1);
        cum/fins [B, W]; live [B, W] = beam j < the request's width;
        is_sampled [B] selects dynamic_decode (width-1 sampled/greedy
        requests) over beam expansion.  The KV cache never reorders —
        ``ind`` [B, W, S] carries beam ancestry into the attention read
        (cache_indirection).  Returns stacked per-step (parents, tokens,
        fins, cums) [steps, B, W] + carried state."""
        from .sampling import beam_search_step, update_indirection
        B, W = pending.shape
        rows = B * W
        v = self._vocab
        pad_id = _scalar(self.sc.pad_id)
        extra = (dict(context_lengths=jnp.repeat(ctx_lens, W))
                 if self._needs_ctx else {})
        eye = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None], (B, W))
        if self.paged:
            from ..ops.paged_attention import PagedCacheState
            cache = PagedCacheState(cache, table)

        def one(carry, k):
            cache, counts, tail, ind, pending, cum, fins, lens, glens = carry
            lens_r = jnp.repeat(lens, W)
            logits, cache = self.model.apply(
                params, pending.reshape(rows)[:, None], cache, lens_r - 1,
                lens_r, beam_indirection=ind, **extra)
            lg = logits[:, -1].astype(jnp.float32)          # [rows, V]
            glens_r = jnp.repeat(glens, W)
            # -- beam expansion over filtered log-probs --
            lg_f = self._filter_rows(lg, dp_rows, counts, glens_r, tail)
            logprobs = jax.nn.log_softmax(lg_f, axis=-1).reshape(B, W, v)
            parent_b, tok_b, cum_b, fin_b = beam_search_step(
                logprobs, cum, fins, W, end_slot)
            # -- width-1 sampled/greedy rows: dynamic_decode on beam row 0
            nt_s, _ = dynamic_decode(
                lg, jax.random.fold_in(rng, k), dp_rows,
                token_counts=counts, cur_lengths=glens_r, tokens=tail,
                cur=self._tail_len)
            nt_s = nt_s.reshape(B, W)
            sam = is_sampled[:, None]
            parent = jnp.where(sam, eye, parent_b)
            tok = jnp.where(sam, nt_s, tok_b)
            fin = jnp.where(sam,
                            jnp.logical_or(fins, tok == end_slot[:, None]),
                            fin_b)
            new_cum = jnp.where(sam, cum, cum_b)
            # dead beams stay dead (width < W); finished sampled rows
            # keep emitting end_id like the offline loop
            new_cum = jnp.where(live, new_cum, -1e9)
            fin = jnp.where(live, fin, True)
            tok = jnp.where(jnp.logical_and(sam, fins),
                            end_slot[:, None], tok)
            keep = jnp.logical_not(active)[:, None]
            parent = jnp.where(keep, eye, parent)
            tok = jnp.where(keep, pending, tok).astype(jnp.int32)
            new_cum = jnp.where(keep, cum, new_cum)
            fin = jnp.where(keep, fins, fin)
            # reorder carried per-row state to follow surviving beams
            parent_rows = (jnp.arange(B, dtype=jnp.int32)[:, None] * W
                           + parent).reshape(rows)
            counts = jnp.take(counts, parent_rows, axis=0)
            tail = jnp.take(tail, parent_rows, axis=0)
            grow = jnp.logical_and(
                live, jnp.logical_and(active[:, None],
                                      jnp.logical_not(fin)))
            counts = counts + jax.nn.one_hot(
                tok.reshape(rows), v, dtype=jnp.int32) * \
                grow.reshape(rows)[:, None]
            tail = jnp.concatenate(
                [tail[:, 1:], tok.reshape(rows)[:, None]], axis=1)
            # in-scan stop words: a beam whose (reordered) tail now ends
            # with one of its slot's stop words freezes IMMEDIATELY — the
            # next step's beam_search_step keeps it with frozen scores,
            # so multi-step ticks never expand a stopped beam (this
            # replaced the steps_per_tick=1 restriction)
            from .sampling import match_stop_words
            stopm = match_stop_words(
                tail, self._tail_len - 1,
                jnp.repeat(stopw, W, axis=0),
                jnp.repeat(stopl, W, axis=0)).reshape(B, W)
            fin = jnp.logical_or(
                fin, jnp.logical_and(
                    stopm, jnp.logical_and(active[:, None], live)))
            # next pending lands at position ``lens`` -> own physical row
            ind = update_indirection(ind, parent,
                                     jnp.where(active, lens, -1))
            adv = active.astype(jnp.int32)
            return ((cache, counts, tail, ind, tok, new_cum, fin,
                     lens + adv, glens + adv),
                    (parent, tok, fin, new_cum))

        (cache, counts, tail, ind, pending, cum, fins, *_), outs = \
            jax.lax.scan(one, (cache, counts, tail, ind, pending, cum,
                               fins, lengths, gen_lens),
                         jnp.arange(self.steps_per_tick))
        out_cache = cache.pool if self.paged else cache
        return outs + (out_cache, counts, tail, ind, pending, cum, fins)

    def _prefill_impl(self, params, cache, table, counts, tail, tokens,
                      slot, length, dp_row, rng):
        """tokens [1, P] (right-padded to bucket); writes KV at slot,
        seeds the slot's penalty counts and ban tail, samples the first
        token.  Returns (first token, cache, counts, tail)."""
        v = self._vocab
        extra = (dict(context_lengths=length[None])
                 if self._needs_ctx else {})
        if self.paged:
            from ..ops.paged_attention import PagedCacheState
            logits, state = self.model.apply(
                params, tokens, PagedCacheState(cache, table), 0,
                length[None], attention_start=None, **extra)
            new_cache = state.pool
        else:
            row_cache = jax.lax.dynamic_slice_in_dim(cache, slot, 1, axis=1)
            logits, row_cache = self.model.apply(
                params, tokens, row_cache, 0, length[None],
                attention_start=None, **extra)
            new_cache = jax.lax.dynamic_update_slice_in_dim(
                cache, row_cache, slot, axis=1)
        # prompt token counts (penalties scan the full history)
        p = tokens.shape[1]
        oh = jax.nn.one_hot(tokens[0], v, dtype=jnp.int32)
        valid = (jnp.arange(p) < length)[:, None]
        counts = counts.at[slot].set(jnp.sum(oh * valid, axis=0))
        # ban tail = last tokens of the prompt (right-padded buffer)
        tl = self._tail_len
        pos = length - tl + jnp.arange(tl)
        tail_row = jnp.where(pos >= 0,
                             tokens[0, jnp.clip(pos, 0, p - 1)], -1)
        tail = tail.at[slot].set(tail_row)
        # logits at the last VALID position (prompt is right-padded)
        last = logits[0, length - 1].astype(jnp.float32)[None]
        counts_row = jax.lax.dynamic_slice_in_dim(counts, slot, 1, axis=0)
        tail_row2 = jax.lax.dynamic_slice_in_dim(tail, slot, 1, axis=0)
        nt, _ = dynamic_decode(last, rng, dp_row, token_counts=counts_row,
                               cur_lengths=jnp.zeros((1,), jnp.int32),
                               tokens=tail_row2, cur=tl)
        counts = counts.at[slot, nt[0]].add(1)
        tail = tail.at[slot].set(
            jnp.concatenate([tail_row[1:], nt.astype(jnp.int32)]))
        return nt[0], new_cache, counts, tail

    def _step_impl(self, params, cache, table, counts, tail, last_tokens,
                   lengths, gen_lens, active, dp, rng, ctx_lens=None):
        """steps_per_tick decode steps for all slots in one program.
        last_tokens [B] pending tokens (KV not yet written); lengths [B] =
        tokens so far INCLUDING the pending one (so the pending token's KV
        is written at position lengths-1 with sequence_length = lengths);
        active [B] bool.  Returns (tokens [B, steps_per_tick], cache,
        counts, tail)."""
        extra = dict(context_lengths=ctx_lens) if self._needs_ctx else {}
        pad_id = _scalar(self.sc.pad_id)
        v = self._vocab
        if self.paged:
            from ..ops.paged_attention import PagedCacheState
            model_cache = PagedCacheState(cache, table)
        else:
            model_cache = cache

        def one(carry, k):
            mcache, counts, tail, toks, lens, glens = carry
            logits, mcache = self.model.apply(
                params, toks[:, None], mcache, lens - 1, lens, **extra)
            nt, _ = dynamic_decode(
                logits[:, -1].astype(jnp.float32),
                jax.random.fold_in(rng, k), dp, token_counts=counts,
                cur_lengths=glens, tokens=tail, cur=self._tail_len)
            nt = jnp.where(active, nt, pad_id).astype(jnp.int32)
            counts = counts + jax.nn.one_hot(nt, v, dtype=jnp.int32) * \
                active[:, None]
            tail = jnp.concatenate([tail[:, 1:], nt[:, None]], axis=1)
            return (mcache, counts, tail, nt, lens + 1, glens + 1), nt

        (model_cache, counts, tail, *_), toks = jax.lax.scan(
            one, (model_cache, counts, tail, last_tokens, lengths, gen_lens),
            jnp.arange(self.steps_per_tick))
        out_cache = (model_cache.pool if self.paged else model_cache)
        return toks.T, out_cache, counts, tail

    def _mixed_step_impl(self, params, cache, table, counts, tail, window,
                         write_pos, valid, is_prefill, sample_mask,
                         reset_mask, gen_lens, active, dp, rng,
                         ctx_lens=None):
        """ONE program serving mixed phases (ref ibGptAttention mixed
        context+generation enqueue): every row gets a [W]-token window —
        decode rows carry their pending token at index 0 (valid=1), rows in
        context phase carry the next prompt chunk (valid<=W) at positions
        write_pos..write_pos+valid-1.  Pad lanes write dead KV beyond
        sequence_length that later real tokens overwrite before it is ever
        attended.  Rows finishing their prompt this tick (and all decode
        rows) sample one token."""
        b, w = window.shape
        v = self._vocab
        counts = jnp.where(reset_mask[:, None], 0, counts)
        tail = jnp.where(reset_mask[:, None], -1, tail)
        seq_after = write_pos + valid
        extra = dict(context_lengths=ctx_lens) if self._needs_ctx else {}
        if self.paged:
            from ..ops.paged_attention import PagedCacheState
            model_cache = PagedCacheState(cache, table)
        else:
            model_cache = cache
        logits, model_cache = self.model.apply(
            params, window, model_cache, write_pos, seq_after, **extra)
        out_cache = model_cache.pool if self.paged else model_cache
        j = jnp.arange(w)
        real = j[None, :] < valid[:, None]                 # [B, W]
        # context rows accumulate prompt-history penalty counts; decode
        # rows' pending token was counted when it was sampled
        oh = jax.nn.one_hot(window, v, dtype=jnp.int32) * real[..., None]
        counts = counts + jnp.where(is_prefill[:, None], oh.sum(axis=1), 0)
        # ban-window tail absorbs the window's real tokens (context rows)
        stream = jnp.concatenate([tail, window], axis=1)   # [B, T+W]
        off1 = jnp.where(is_prefill, valid, 0)
        tl = self._tail_len
        gidx = off1[:, None] + jnp.arange(tl)[None, :]
        tail = jnp.take_along_axis(stream, gidx, axis=1)
        # logits at each row's last real position
        idx = jnp.clip(valid - 1, 0, w - 1)
        last = jnp.take_along_axis(
            logits, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        nt, _ = dynamic_decode(last.astype(jnp.float32), rng, dp,
                               token_counts=counts, cur_lengths=gen_lens,
                               tokens=tail, cur=tl)
        pad_id = _scalar(self.sc.pad_id)
        emit = jnp.logical_and(sample_mask, active)
        nt = jnp.where(emit, nt, pad_id).astype(jnp.int32)
        counts = counts + jax.nn.one_hot(nt, v, dtype=jnp.int32) * \
            emit[:, None]
        tail = jnp.where(emit[:, None],
                         jnp.concatenate([tail[:, 1:], nt[:, None]], axis=1),
                         tail)
        return nt, out_cache, counts, tail

    def _mixed_tick(self) -> int:
        """One mixed context+generation tick (replaces separate admission
        prefills while any slot is in context phase)."""
        active, lengths, last_tokens = self.sched.state()
        if not active.any():
            return 0
        B, W = self.B, self.chunk_width
        window = np.zeros((B, W), np.int32)
        write_pos = np.zeros((B,), np.int32)
        valid = np.zeros((B,), np.int32)
        is_prefill = np.zeros((B,), bool)
        sample_mask = np.zeros((B,), bool)
        reset_mask = np.zeros((B,), bool)
        gen_lens = np.zeros((B,), np.int32)
        chunk_of: Dict[int, int] = {}
        for slot in range(B):
            if slot in self._prefill_progress:
                off = self._prefill_progress[slot]
                prompt = self._prefill_prompt[slot]
                p = len(prompt)
                k = min(W, p - off)
                window[slot, :k] = prompt[off:off + k]
                write_pos[slot] = off
                valid[slot] = k
                is_prefill[slot] = True
                sample_mask[slot] = (off + k == p)
                reset_mask[slot] = (off == 0)
                chunk_of[slot] = k
            elif active[slot]:
                window[slot, 0] = last_tokens[slot]
                write_pos[slot] = lengths[slot] - 1
                valid[slot] = 1
                sample_mask[slot] = True
                gen_lens[slot] = lengths[slot] - self._ctx_lens[slot]
        if self.paged:
            # coverage invariant (same as step()): stay one position ahead
            # of the pending-token write.  Decode rows and rows finishing
            # their prompt this tick advance one block position; rows
            # mid-prefill hold (their prompt blocks were allocated at
            # admission)
            hold = [s.batch_idx in self._prefill_progress
                    and not sample_mask[s.batch_idx]
                    for s in self.kvman.sequences]
            self.kvman.step(hold)
            cache_arg = self.pool
            table_arg = jnp.asarray(self._block_tables())
        else:
            cache_arg = self.cache
            table_arg = None
        self._tick += 1
        rng = jax.random.fold_in(self._base_key, self._tick)
        nt, new_cache, self._counts, self._tail = self._mixed_fn(
            self.params, cache_arg, table_arg, self._counts, self._tail,
            jnp.asarray(window), jnp.asarray(write_pos), jnp.asarray(valid),
            jnp.asarray(is_prefill), jnp.asarray(sample_mask),
            jnp.asarray(reset_mask), jnp.asarray(gen_lens),
            jnp.asarray(active), self._decode_params(self.B), rng,
            jnp.asarray(self._ctx_lens))
        if self.paged:
            self.pool = new_cache
        else:
            self.cache = new_cache
        nt_np = np.asarray(nt)
        for slot in range(B):
            if slot in self._prefill_progress:
                if sample_mask[slot]:
                    del self._prefill_progress[slot]
                    del self._prefill_prompt[slot]
                    self._push_token(slot, int(nt_np[slot]))
                else:
                    self._prefill_progress[slot] += chunk_of[slot]
            elif active[slot]:
                self._push_token(slot, int(nt_np[slot]))
        return self.sched.num_active

    # -- host-side scheduling (delegated to the scheduler backend) ---------

    def _set_slot_sampling(self, slot: int, req: InferenceRequest) -> None:
        sc = req.sampling or self.sc
        self._temp[slot] = _scalar(sc.temperature)
        self._topk[slot] = min(_scalar(sc.top_k), self.max_top_k)
        self._topp[slot] = _scalar(sc.top_p)
        self._rep[slot] = _scalar(sc.repetition_penalty)
        self._pres[slot] = _scalar(sc.presence_penalty)
        self._minlen[slot] = _scalar(sc.min_length)
        self._end_ids[slot] = (req.end_id if req.end_id is not None
                               else _scalar(sc.end_id))
        self._seeds[slot] = _scalar(sc.random_seed)
        self._bad_words[slot] = 0
        self._bad_lens[slot] = 0
        words = list(sc.bad_words_list or [])
        if req.sampling is not None and self.sc.bad_words_list:
            # manager-level bans apply on top of per-request lists
            words += [w for w in self.sc.bad_words_list if w not in words]
        for i, w in enumerate(words[:self.NW]):
            w = list(w)[:self.MW]
            self._bad_words[slot, i, :len(w)] = w
            self._bad_lens[slot, i] = len(w)
        self._stop_words[slot] = [list(w)
                                  for w in (sc.stop_words_list or [])]
        self._stopw[slot] = 0
        self._stopl[slot] = 0
        for i, w in enumerate((sc.stop_words_list or [])[:self.NW]):
            w = list(w)[:self.MW]
            self._stopw[slot, i, :len(w)] = w
            self._stopl[slot, i] = len(w)

    def _admit(self, req: InferenceRequest, slot: int) -> None:
        if self.W > 1:
            sc = req.sampling or self.sc
            # stop words on beams are matched IN-SCAN against the rolling
            # device tail (round 5 — the per-tick host detection used to
            # force steps_per_tick=1); only the fixed device-table
            # capacity remains, a buffer bound like the reference's
            # fixed-shape stop_words tensors
            if getattr(sc, "num_beams", 1) > 1 and sc.stop_words_list \
                    and self.steps_per_tick > 1 and \
                    any(len(w) > self.MW for w in sc.stop_words_list):
                raise ValueError(
                    f"beam stop words longer than max_bad_word_len "
                    f"({self.MW}) need steps_per_tick=1 or a larger "
                    f"word buffer")
            self._admit_beam(req, slot)
            return
        prompt = np.asarray(req.input_ids, np.int32).reshape(1, -1)
        p = prompt.shape[1]
        if self.mixed_admission:
            # deferred: the prompt is fed in chunks by the mixed tick; no
            # separate prefill dispatch ever runs
            self._set_slot_sampling(slot, req)
            self.sched.on_admitted(slot, p)
            self._ctx_lens[slot] = p
            self.slot_request[slot] = req
            self.slot_output[slot] = []
            self._prefill_prompt[slot] = prompt[0]
            self._prefill_progress[slot] = 0
            if self.paged:
                # allocate the prompt's blocks up front (host bookkeeping
                # only); chunk writes then scatter into them at arbitrary
                # non-block-aligned offsets.  Coverage grows one position
                # per generated token from the finishing tick onward —
                # see _mixed_tick
                seq = GenerationSequence(self._seq_counter, slot)
                self._seq_counter += 1
                self.kvman.add_sequence(seq, p)
                self._kv_seqs[slot] = seq
            return
        bucket = _bucket(p)
        padded = np.full((1, bucket), _scalar(self.sc.pad_id), np.int32)
        padded[0, :p] = prompt[0]
        self._set_slot_sampling(slot, req)
        if self.paged:
            seq = GenerationSequence(self._seq_counter, slot)
            self._seq_counter += 1
            self.kvman.add_sequence(seq, p)
            self._kv_seqs[slot] = seq
            # cover the pending token's position p (new block if p % T == 0)
            self._kv_step_one(slot)
            table = self._block_tables()
            cache_arg = self.pool
            table_arg = jnp.asarray(table[slot:slot + 1])
        else:
            cache_arg = self.cache
            table_arg = None
        key = (bucket, self.paged)
        if key not in self._prefill_fns:
            self._prefill_fns[key] = jax.jit(self._prefill_impl,
                                             donate_argnums=(1, 3, 4))
        rng = jax.random.fold_in(self._base_key,
                                 (self._seeds[slot] * 1000003 + slot
                                  + self._tick) % (2**31))
        next_tok, new_cache, self._counts, self._tail = self._prefill_fns[key](
            self.params, cache_arg, table_arg, self._counts, self._tail,
            jnp.asarray(padded), jnp.asarray(slot, jnp.int32),
            jnp.asarray(p, jnp.int32), self._slot_params(slot), rng)
        if self.paged:
            self.pool = new_cache
        else:
            self.cache = new_cache
        self.sched.on_admitted(slot, p)
        self._ctx_lens[slot] = p
        self.slot_request[slot] = req
        self.slot_output[slot] = []
        tok = int(next_tok)
        self._push_token(slot, tok)

    def _admit_beam(self, req: InferenceRequest, slot: int) -> None:
        """Admission into a beam-enabled manager (W > 1)."""
        prompt = np.asarray(req.input_ids, np.int32).reshape(1, -1)
        p = prompt.shape[1]
        if self.mixed_admission:
            # beam x mixed: the chunk FEEDER streams the whole prompt into
            # the slot's beam-0 row through the mixed window program while
            # other slots keep beam-decoding; at handoff the slot joins
            # the beam tick with pending = the last prompt token, whose
            # (re)write + logits reproduce the beam-prefill expansion
            # exactly (see _beam_handoff)
            self._set_slot_sampling(slot, req)
            sc = req.sampling or self.sc
            w = max(1, int(getattr(sc, "num_beams", 1)))
            if w > self.W:
                raise ValueError(f"request {req.request_id} wants {w} "
                                 f"beams; manager max_beam_width is {self.W}")
            self._beam_w[slot] = w
            self._is_sampled[slot] = w == 1
            self.sched.on_admitted(slot, p)
            self._ctx_lens[slot] = p
            self.slot_request[slot] = req
            self.slot_output[slot] = []
            self._beam_hist[slot] = [[] for _ in range(self.W)]
            # keep the slot out of done-checks until handoff
            self._fins[slot] = True
            self._cum[slot] = -1e9
            self._prefill_prompt[slot] = prompt[0]
            self._prefill_progress[slot] = 0
            if self.paged:
                seq = GenerationSequence(self._seq_counter, slot)
                self._seq_counter += 1
                self.kvman.add_sequence(seq, p)
                self._kv_seqs[slot] = seq
            return
        bucket = _bucket(p)
        padded = np.full((1, bucket), _scalar(self.sc.pad_id), np.int32)
        padded[0, :p] = prompt[0]
        self._set_slot_sampling(slot, req)
        sc = req.sampling or self.sc
        w = max(1, int(getattr(sc, "num_beams", 1)))
        if w > self.W:
            raise ValueError(f"request {req.request_id} wants {w} beams; "
                             f"manager max_beam_width is {self.W}")
        is_beam = w > 1
        self._beam_w[slot] = w
        self._is_sampled[slot] = not is_beam
        live_row = np.arange(self.W) < w
        key = (bucket, is_beam)
        if key not in self._beam_prefill_fns:
            self._beam_prefill_fns[key] = jax.jit(
                partial(self._beam_prefill_impl, is_beam=is_beam),
                donate_argnums=(1, 5, 6, 7))
        rng = jax.random.fold_in(self._base_key,
                                 (self._seeds[slot] * 1000003 + slot
                                  + self._tick) % (2**31))
        if self.paged:
            seq = GenerationSequence(self._seq_counter, slot)
            self._seq_counter += 1
            self.kvman.add_sequence(seq, p)
            self._kv_seqs[slot] = seq
            self._kv_step_one(slot)      # cover the pending token's slot
            tables = self._block_tables()
            row0 = slot * self.W
            tpb = self.tokens_per_block
            if p % tpb != 0:
                # replicate the partial prompt block into each sibling
                # beam's private block after the prefill writes it
                bidx = (p - 1) // tpb
                copy_src = int(tables[row0][bidx])
                copy_dst = np.array(
                    [tables[row0 + j][bidx] for j in range(1, self.W)],
                    np.int32)
            else:                         # no partial block: no-op copy
                copy_src = 0
                copy_dst = np.full((self.W - 1,), self.num_blocks, np.int32)
            cache_arg = self.pool
            table_arg = jnp.asarray(tables[row0:row0 + 1])
        else:
            cache_arg = self.cache
            table_arg = None
            copy_src = 0
            copy_dst = np.zeros((max(self.W - 1, 1),), np.int32)
        pending, cum, fin, new_cache, self._counts, self._tail, \
            self._ind = self._beam_prefill_fns[key](
                self.params, cache_arg, table_arg,
                jnp.asarray(copy_src, jnp.int32), jnp.asarray(copy_dst),
                self._counts, self._tail,
                self._ind, jnp.asarray(padded),
                jnp.asarray(slot, jnp.int32), jnp.asarray(p, jnp.int32),
                self._slot_params(slot), rng, jnp.asarray(live_row))
        if self.paged:
            self.pool = new_cache
        else:
            self.cache = new_cache
        pending, cum, fin = jax.device_get((pending, cum, fin))
        self._pending[slot] = pending
        self._cum[slot] = cum
        self._fins[slot] = fin
        self.sched.on_admitted(slot, p)
        self._ctx_lens[slot] = p
        self.slot_request[slot] = req
        self.slot_output[slot] = []
        self._beam_hist[slot] = [
            [int(pending[j])] if live_row[j] else [] for j in range(self.W)]
        self._account_beam_tick(slot)

    def _account_beam_tick(self, slot: int, fins_row=None,
                           cums_row=None) -> None:
        """One scheduler push per tick per beam slot: budget/length
        accounting only — finish is decided here (all live beams done),
        not by the scheduler's token == end_id check."""
        fins_row = self._fins[slot] if fins_row is None else fins_row
        cums_row = self._cum[slot] if cums_row is None else cums_row
        done = bool(np.all(fins_row |
                           ~(np.arange(self.W) < self._beam_w[slot])))
        end = int(self._end_ids[slot])
        probe = end if done else (end + 1) % max(self._vocab, 2)
        flags = self.sched.push_token(slot, probe)
        if (flags & FINISHED) or done:
            if not (flags & FINISHED):
                # budget not yet exhausted but every beam finished: force
                # the scheduler to release the slot
                while not (self.sched.push_token(slot, end) & FINISHED):
                    pass
            self._finalize_beam_slot(slot, cums_row)

    def _finalize_beam_slot(self, slot: int, cums_row) -> None:
        """Pick the best beam (GNMT length penalty — the offline
        finalize_beams twin) and send the response."""
        req = self.slot_request[slot]
        sc = req.sampling or self.sc
        lp = float(getattr(sc, "length_penalty", 1.0))
        end = int(self._end_ids[slot])
        prompt_len = int(self._ctx_lens[slot])
        best_score, best_tokens = -np.inf, []
        for j in range(int(self._beam_w[slot])):
            toks = self._beam_hist[slot][j]
            glen = toks.index(end) if end in toks else len(toks)
            seq_len = prompt_len + glen
            penalty = max(((5.0 + seq_len) / 6.0) ** lp, 1e-9)
            score = float(cums_row[j]) / penalty
            if score > best_score:
                best_score, best_tokens = score, toks[:glen]
        self.send_response(Response(req.request_id, list(best_tokens),
                                    finished=True))
        if self.paged and slot in self._kv_seqs:
            self.kvman.stop(self._kv_seqs.pop(slot))
        del self.slot_request[slot]
        del self._beam_hist[slot]

    def _beam_feed_tick(self) -> None:
        """beam x mixed admission: advance every feeding slot's prompt one
        chunk through the mixed window program over the full B*W-row cache.
        Non-feeding rows are excluded by valid=0 with their window writes
        parked at the row's NEXT pending position (dense: overwritten
        before ever attended, with chunk_width slack columns at the cache
        end; paged: dropped or covered-but-unread) — so beam decoding
        never stalls behind an admission."""
        rows = self.B * self.W
        Wc = self.chunk_width
        active, lengths, _ = self.sched.state()
        window = np.zeros((rows, Wc), np.int32)
        write_pos = np.zeros((rows,), np.int32)
        valid = np.zeros((rows,), np.int32)
        is_prefill = np.zeros((rows,), bool)
        no_mask = np.zeros((rows,), bool)
        reset_mask = np.zeros((rows,), bool)
        done_slots = []
        for slot in range(self.B):
            r0 = slot * self.W
            if slot in self._prefill_progress:
                off = self._prefill_progress[slot]
                prompt = self._prefill_prompt[slot]
                p = len(prompt)
                k = min(Wc, p - off)
                window[r0, :k] = prompt[off:off + k]
                write_pos[r0] = off
                valid[r0] = k
                is_prefill[r0] = True
                reset_mask[r0] = off == 0
                self._prefill_progress[slot] = off + k
                if off + k == p:
                    done_slots.append(slot)
            elif active[slot]:
                write_pos[r0:r0 + self.W] = lengths[slot]
        if self.paged:
            cache_arg = self.pool
            # CRITICAL: non-feeding rows' tables alias the slot's SHARED
            # prompt blocks (beam sibling rows in particular) — their
            # parked window writes would clobber the prompt.  Masking
            # their tables to -1 makes every one of their lanes an
            # out-of-range scatter (dropped); their attention reads are
            # garbage but discarded (nothing samples in a feed tick)
            tables = self._block_tables()
            feed_rows = np.zeros((rows,), bool)
            for slot in self._prefill_progress:
                feed_rows[slot * self.W] = True
            for slot in done_slots:
                feed_rows[slot * self.W] = True
            tables[~feed_rows] = -1
            table_arg = jnp.asarray(tables)
        else:
            cache_arg = self.cache
            table_arg = None
        self._tick += 1
        rng = jax.random.fold_in(self._base_key, self._tick)
        _, new_cache, self._counts, self._tail = self._mixed_fn(
            self.params, cache_arg, table_arg, self._counts, self._tail,
            jnp.asarray(window), jnp.asarray(write_pos), jnp.asarray(valid),
            jnp.asarray(is_prefill), jnp.asarray(no_mask),
            jnp.asarray(reset_mask), jnp.asarray(np.zeros((rows,), np.int32)),
            jnp.asarray(no_mask), self._decode_params_rows(), rng,
            jnp.asarray(np.repeat(self._ctx_lens, self.W)))
        if self.paged:
            self.pool = new_cache
        else:
            self.cache = new_cache
        for slot in done_slots:
            self._beam_handoff(slot)

    def _handoff_impl(self, counts, tail, ind, slot):
        """Broadcast the fed slot's beam-0 penalty counts + ban tail to its
        sibling beam rows and zero its indirection (prompt reads -> row 0)."""
        W, v = self.W, self._vocab
        row0 = slot * W
        c0 = jax.lax.dynamic_slice(counts, (row0, 0), (1, v))
        counts = jax.lax.dynamic_update_slice(
            counts, jnp.broadcast_to(c0, (W, v)), (row0, 0))
        t0 = jax.lax.dynamic_slice(tail, (row0, 0), (1, self._tail_len))
        tail = jax.lax.dynamic_update_slice(
            tail, jnp.broadcast_to(t0, (W, self._tail_len)), (row0, 0))
        ind = jax.lax.dynamic_update_slice(
            ind, jnp.zeros((1, W, ind.shape[2]), ind.dtype), (slot, 0, 0))
        return counts, tail, ind

    def _beam_handoff(self, slot: int) -> None:
        """The fed slot joins the beam tick: pending = the LAST prompt
        token — its (idempotent) rewrite at position p-1 produces the
        prefill-final logits, and the tick's beam_search_step over
        cum = [0, -inf, ...] IS the first-beam expansion the separate
        beam prefill performs (token-exact by construction)."""
        del self._prefill_progress[slot]
        prompt = self._prefill_prompt.pop(slot)
        if not hasattr(self, "_handoff_fn"):
            self._handoff_fn = jax.jit(self._handoff_impl,
                                       donate_argnums=(0, 1, 2))
        self._counts, self._tail, self._ind = self._handoff_fn(
            self._counts, self._tail, self._ind,
            jnp.asarray(slot, jnp.int32))
        self._pending[slot] = int(prompt[-1])
        self._cum[slot] = -1e9
        self._cum[slot, 0] = 0.0
        self._fins[slot] = False

    def _beam_tick(self) -> int:
        """One serving tick in a beam-enabled manager."""
        active, lengths, _ = self.sched.state()
        if self._prefill_progress:
            # slots still being chunk-fed don't decode yet
            active = active.copy()
            for slot in self._prefill_progress:
                active[slot] = False
        if not active.any():
            return self.sched.num_active if self._prefill_progress else 0
        self._tick += 1
        rng = jax.random.fold_in(self._base_key, self._tick)
        gen_lens = lengths - self._ctx_lens
        live = np.arange(self.W)[None, :] < self._beam_w[:, None]
        if self.paged:
            # pre-extend every live slot's private chain for the positions
            # this tick writes (new private block per beam at boundaries)
            for _ in range(self.steps_per_tick):
                self.kvman.step([False] * len(self.kvman.sequences))
            cache_arg = self.pool
            table_arg = jnp.asarray(self._block_tables())
        else:
            cache_arg = self.cache
            table_arg = None
        (parents, toks, fins, cums, new_cache, self._counts, self._tail,
         self._ind, pending, cum, fin_dev) = self._beam_step_fn(
            self.params, cache_arg, table_arg, self._counts, self._tail,
            self._ind,
            jnp.asarray(self._pending), jnp.asarray(self._cum),
            jnp.asarray(self._fins), jnp.asarray(live),
            jnp.asarray(self._is_sampled), jnp.asarray(lengths),
            jnp.asarray(gen_lens), jnp.asarray(active),
            self._decode_params_rows(), jnp.asarray(self._end_ids), rng,
            jnp.asarray(self._stopw), jnp.asarray(self._stopl),
            jnp.asarray(self._ctx_lens))
        if self.paged:
            self.pool = new_cache
        else:
            self.cache = new_cache
        parents, toks, fins, cums, pending, cum, fin_dev = jax.device_get(
            (parents, toks, fins, cums, pending, cum, fin_dev))
        # device_get can hand back read-only buffers; the admission path
        # writes rows in place
        self._pending = np.array(pending)
        self._cum = np.array(cum)
        self._fins = np.array(fin_dev)
        live_slots = list(active)
        stop_force = np.zeros((self.B, self.W), bool)
        for k in range(parents.shape[0]):
            for slot in range(self.B):
                if not live_slots[slot]:
                    continue
                hist = self._beam_hist[slot]
                par, tk = parents[k, slot], toks[k, slot]
                hist = [list(hist[int(par[j])]) + [int(tk[j])]
                        for j in range(self.W)]
                self._beam_hist[slot] = hist
                # stop-words: a beam whose history ends with a stop word
                # finishes (host-exact, like the width-1 serving path);
                # the device learns it at the next fins upload, when the
                # frozen-EOS carry takes over
                stops = self._stop_words.get(slot)
                if stops:
                    prompt = list(np.asarray(
                        self.slot_request[slot].input_ids).reshape(-1))
                    for j in range(int(self._beam_w[slot])):
                        seq = prompt + hist[j]
                        for w_ in stops:
                            if len(w_) and len(seq) >= len(w_) and \
                                    [int(x) for x in seq[-len(w_):]] == \
                                    [int(x) for x in w_]:
                                stop_force[slot, j] = True
                self._account_beam_tick(
                    slot, fins[k, slot] | stop_force[slot], cums[k, slot])
                if slot not in self.slot_request:     # finished this step
                    live_slots[slot] = False
        if stop_force.any():
            self._fins = self._fins | stop_force
        return self.sched.num_active

    # -- paged bookkeeping -------------------------------------------------

    def _kv_step_one(self, only_slot: Optional[int] = None) -> None:
        """Advance block coverage one position for live sequences (ref
        KVCacheManager.step)."""
        finished = [only_slot is not None and s.batch_idx != only_slot
                    for s in self.kvman.sequences]
        self.kvman.step(finished)

    def _block_tables(self) -> np.ndarray:
        """[B*W, max_blocks] per-row tables (rows grouped by slot): every
        beam row has its own private generation chain; prompt blocks appear
        in all of a slot's rows (shared, read-only)."""
        arr = np.full((self.B * self.W, self.max_blocks_per_seq), -1,
                      np.int32)
        if self.kvman.sequences:
            idx = self.kvman.get_block_index_arrays()   # [n, beam, max]
            for i, seq in enumerate(self.kvman.sequences):
                for j in range(self.W):
                    arr[seq.batch_idx * self.W + j] = idx[i, j]
        return arr

    # -- token push / responses -------------------------------------------

    def _push_token(self, slot: int, tok: int) -> int:
        """Account one generated token; the done/stream decision comes from
        the scheduler backend (native C++ when available).  Per-request
        stop-words are enforced here (host side — exact semantics for any
        list shape)."""
        req = self.slot_request[slot]
        self.slot_output[slot].append(tok)
        stops = self._stop_words.get(slot)
        hit_stop = False
        if stops:
            seq = (list(np.asarray(req.input_ids).reshape(-1))
                   + self.slot_output[slot])
            for w in stops:
                if len(w) and len(seq) >= len(w) and \
                        [int(x) for x in seq[-len(w):]] == [int(x) for x in w]:
                    hit_stop = True
                    break
        if hit_stop:
            # force the scheduler to finish the slot (accounting identical
            # to an end_id hit; the stop word stays in the output)
            flags = self.sched.push_token(slot, int(self._end_ids[slot]))
            flags |= FINISHED
        else:
            flags = self.sched.push_token(slot, tok)
        if flags & FINISHED:
            if self.paged and slot in self._kv_seqs:
                self.kvman.stop(self._kv_seqs.pop(slot))
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
                eid = req.end_id if req.end_id is not None \
                    else _scalar(self.sc.end_id)
                self._requests[req.request_id] = req
                self.sched.add_request(req.request_id, req.max_new_tokens,
                                       eid, req.streaming)
        while True:
            slot, rid = self.sched.next_admission()
            if slot < 0:
                break
            self._admit(self._requests.pop(rid), slot)
        if self.W > 1:
            if self.mixed_admission and self._prefill_progress:
                self._beam_feed_tick()
            return self._beam_tick()
        if self.mixed_admission and self._prefill_progress:
            # one mixed context+generation step: prompts advance a chunk,
            # every decode slot still produces its token this tick
            return self._mixed_tick()
        active, lengths, last_tokens = self.sched.state()
        if not active.any():
            return 0
        next_tok = self._dispatch_tick(active, lengths,
                                       jnp.asarray(last_tokens))
        self._consume_tick(next_tok, active, list(self.slot_request.items()))
        return self.sched.num_active

    def _dispatch_tick(self, active, lengths, pending_dev):
        """Enqueue one steps_per_tick decode program; returns the tokens
        output (a device future — nothing is fetched here)."""
        if self.paged:
            # pre-extend block coverage for every position this tick writes
            for _ in range(self.steps_per_tick):
                self.kvman.step([False] * len(self.kvman.sequences))
            cache_arg = self.pool
            table_arg = jnp.asarray(self._block_tables())
        else:
            cache_arg = self.cache
            table_arg = None
        self._tick += 1
        rng = jax.random.fold_in(self._base_key, self._tick)
        gen_lens = lengths - self._ctx_lens
        next_tok, new_cache, self._counts, self._tail = self._step_fn(
            self.params, cache_arg, table_arg, self._counts, self._tail,
            pending_dev, jnp.asarray(lengths),
            jnp.asarray(gen_lens), jnp.asarray(active),
            self._decode_params(self.B), rng,
            jnp.asarray(self._ctx_lens))
        if self.paged:
            self.pool = new_cache
        else:
            self.cache = new_cache
        return next_tok

    def _consume_tick(self, tokens_dev, active, rids) -> None:
        """Fetch one tick's tokens and run scheduler accounting.  ``rids``
        snapshots (slot, request) at dispatch: a slot finished and
        re-admitted while the tick was in flight must NOT receive the
        stale speculative tokens."""
        rid_of = dict(rids)
        next_np = np.asarray(tokens_dev)            # [B, steps_per_tick]
        live = list(active)
        for k in range(next_np.shape[1]):
            for slot in range(self.B):
                if not live[slot]:
                    continue
                if self.slot_request.get(slot) is not rid_of.get(slot):
                    live[slot] = False              # re-purposed since
                    continue
                flags = self._push_token(slot, int(next_np[slot, k]))
                if flags & FINISHED:
                    live[slot] = False

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


def _scalar(x) -> float:
    """Serving configs must be scalar-per-request; reject [B] arrays."""
    if np.ndim(x):
        raise ValueError("ContinuousBatchingManager takes scalar "
                         "SamplingConfig fields (per-request variation "
                         "comes from InferenceRequest.sampling)")
    return x if isinstance(x, (int, float)) else float(x)