"""Autoregressive generation runtime for decoder-only LMs.

Counterpart of the reference's ``tensorrt_llm/runtime/generation.py``
(GenerationSession:141, ModelConfig:104, SamplingConfig:120) and the C++
``GptSession::generate`` (gptSession.cpp:700).  The reference's loop runs on
the host: one engine enqueue per token, ping-pong execution contexts for the
KV buffers, a torch ``DynamicDecodeOp`` for sampling, and a final
``gather_tree`` to reconstruct beams.  Here the whole thing — prefill,
per-step decode, penalties, bad-words bans, top-k/top-p sampling or beam
search with beam reordering, and stop criteria — is one jitted
``lax.while_loop``; the KV cache is a donated in-place buffer (no ping-pong
copies) and beams are kept contiguous by gathering carried state each step
(no gather_tree pass).

Per-request sampling parameters ride as traced [B] arrays
(:class:`~.sampling.DecodeParams`), so changing temperatures / penalties /
ban lists between calls reuses the compiled program.  Prompt lengths are
bucketed (left-padding; the reference's optimization-profile trick) so
varied prompts hit a handful of compiles instead of one per length.

Ragged prompts are left-padded; ``attention_start`` masks the pad region
(replacing the reference's masked_tokens / remove-input-padding machinery).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sampling import (DecodeParams, SamplingConfig, beam_search_step,
                       dynamic_decode, finalize_beams, gather_beams,
                       match_stop_words, update_indirection)

PROMPT_BUCKETS = (8, 16, 32, 48, 64, 96, 128, 192, 256, 384, 512, 768,
                  1024, 1536, 2048)


def bucket_length(n: int, buckets=PROMPT_BUCKETS) -> int:
    for s in buckets:
        if n <= s:
            return s
    return n


@dataclasses.dataclass
class ModelConfig:
    """ref generation.py:104-118 (engine-centric fields dropped; the jit
    carries its own shapes)."""
    vocab_size: int
    num_layers: int
    num_heads: int
    hidden_size: int
    max_seq_len: int = 2048
    num_kv_heads: Optional[int] = None


class GenerationSession:
    """Drives any model with the DecoderLMHead forward contract."""

    def __init__(self, model_config: ModelConfig, model,
                 sampling_config: Optional[SamplingConfig] = None,
                 bucket_prompts: bool = True,
                 use_cache_indirection: bool = True):
        self.model_config = model_config
        self.model = model
        self.sampling_config = sampling_config or SamplingConfig()
        self.bucket_prompts = bucket_prompts
        # beam search without the per-step full-cache reorder: carry a
        # [B, beam, S] physical-row map instead (the reference's
        # cache_indirection, T/functional.py:2738) and let the attention
        # read gather through it.  Requires the model to accept
        # ``beam_indirection`` (DecoderLMHead does).  Default ON: measured
        # 2.40 vs 62.74 ms/tok at beam=4/ctx=2048 (benchmarks/beam_bench);
        # set False only for models without the beam_indirection kwarg
        self.use_cache_indirection = use_cache_indirection
        self._params = None
        self._decode_fn = jax.jit(
            self._decode_impl,
            static_argnames=("prompt_len", "max_new_tokens", "beam"))

    def setup(self, params=None) -> None:
        """Capture parameters (ref GenerationSession.setup buffer prep)."""
        self._params = params if params is not None else self.model.state_dict()
        # packed weight image for the whole-decoder-layer megakernel
        # (ops/pallas_decoder_layer.py) — built once here, rides the
        # decode jit as an arg
        self._mk_blobs = None
        from ..ops.pallas_decoder_layer import params_cross_device_sharded
        from ..plugin import get_plugin_config
        if get_plugin_config().use_decode_megakernel() and \
                getattr(self.model, "megakernel_eligible",
                        lambda: False)() and \
                not params_cross_device_sharded(self._params):
            # pspec-sharded TP/DP params take the scanned path: the
            # megakernel's pallas_call is a single-core program the SPMD
            # partitioner cannot split (see params_cross_device_sharded)
            self._mk_blobs = jax.jit(self.model.megakernel_blobs)(
                self._params)

    # ------------------------------------------------------------------

    def _decode_impl(self, params, input_ids, input_lengths, rng,
                     dparams: DecodeParams, prompt_len: int,
                     max_new_tokens: int, beam: int, mk_blobs=None):
        """input_ids [B, prompt_len] left-padded int32;
        input_lengths [B] true prompt lengths.
        Returns (tokens [B, beam, total_len], seq_lengths [B, beam],
        cum_log_probs [B, beam])."""
        sc = self.sampling_config
        model = self.model
        b = input_ids.shape[0]
        total_len = prompt_len + max_new_tokens
        v = self.model_config.vocab_size

        start = (prompt_len - input_lengths).astype(jnp.int32)  # left-pad gap

        # K-step deferred KV-store tail (ops.attention write_tail_kv);
        # greedy/sampling only — beams reorder carried state every step.
        # kt columns of slack so the once-per-K merge never clamps
        from ..plugin import get_plugin_config
        kt = get_plugin_config().get_decode_tail() if beam == 1 else 0
        cache = model.new_kv_cache(b, total_len + kt)
        seqlen0 = jnp.full((b,), prompt_len, jnp.int32)
        # GLM-style models need the true prompt length at every step (2D
        # position ids; ref ChatGLM6BHeadModelGenerationSession)
        needs_ctx = getattr(model, "needs_context_lengths", False)
        extra = dict(context_lengths=input_lengths) if needs_ctx else {}
        logits_all, cache = model.apply(params, input_ids, cache, 0, seqlen0,
                                        attention_start=start, **extra)
        logits = logits_all[:, -1].astype(jnp.float32)

        if beam > 1:
            # tile state to [B*beam, ...] after prefill (ref _tile_beam_width)
            def tile(x, axis=0):
                return jnp.repeat(x, beam, axis=axis)
            cache = jnp.repeat(cache, beam, axis=1)
            logits = tile(logits)
            start = tile(start)
        bb = b * beam
        extra_bb = (dict(context_lengths=jnp.repeat(input_lengths, beam, 0)
                         if beam > 1 else input_lengths)
                    if needs_ctx else {})
        dp = (jax.tree.map(lambda x: jnp.repeat(x, beam, 0), dparams)
              if beam > 1 else dparams)
        end_id = dp.end_id                                  # [bb]

        tokens_buf = jnp.full((bb, total_len), sc.pad_id, jnp.int32)
        tokens_buf = jax.lax.dynamic_update_slice(
            tokens_buf, jnp.repeat(input_ids, beam, 0) if beam > 1 else input_ids,
            (0, 0))
        token_counts = jnp.zeros((bb, v), jnp.int32)
        # count prompt tokens for penalties (ref penalty kernels scan history)
        one_hot = jax.nn.one_hot(
            jnp.repeat(input_ids, beam, 0) if beam > 1 else input_ids, v,
            dtype=jnp.int32)
        pos = jnp.arange(prompt_len, dtype=jnp.int32)[None, :, None]
        live = pos >= jnp.reshape(start, (-1, 1, 1))
        token_counts = jnp.sum(one_hot * live, axis=1)

        use_ind = beam > 1 and self.use_cache_indirection
        init = dict(
            logits=logits,
            tokens=tokens_buf,
            cache=cache,
            cur=jnp.asarray(prompt_len, jnp.int32),
            finished=jnp.zeros((bb,), jnp.bool_),
            cum_lp=(jnp.zeros((b, beam), jnp.float32)
                    if beam > 1 else jnp.zeros((bb,), jnp.float32)),
            counts=token_counts,
            rng=rng,
        )
        if use_ind:
            # after prefill every beam holds its own copy of the prompt KV
            init["ind"] = jnp.broadcast_to(
                jnp.arange(beam, dtype=jnp.int32)[None, :, None],
                (b, beam, total_len))
        if kt:
            from ..ops.attention import new_tail_kv
            init["tail"] = new_tail_kv(cache, kt)
            init["tail_len"] = jnp.asarray(0, jnp.int32)
        if beam > 1:
            # all but beam 0 start at -inf so the first expansion picks
            # distinct continuations of the single prefill beam
            init["cum_lp"] = init["cum_lp"].at[:, 1:].set(-1e9)

        def cond(s):
            return jnp.logical_and(s["cur"] < total_len,
                                   jnp.logical_not(jnp.all(s["finished"])))

        def body(s):
            cur = s["cur"]
            gen_len = cur - prompt_len
            rng, sub = jax.random.split(s["rng"])
            if beam > 1:
                lg, _ = _filtered_logits(s["logits"], dp, s["counts"],
                                         jnp.full((bb,), gen_len, jnp.int32),
                                         s["tokens"], cur)
                logprobs = jax.nn.log_softmax(lg.reshape(b, beam, v),
                                              axis=-1)
                parent, tok, cum, fin = beam_search_step(
                    logprobs, s["cum_lp"], s["finished"].reshape(b, beam),
                    beam, sc.end_id, sc.length_penalty, cur_len=gen_len)
                # reorder carried state to follow the surviving beams —
                # with cache_indirection the CACHE itself stays put and
                # only the [B, beam, S] row map is advanced
                to_gather = dict(tokens=s["tokens"].reshape(b, beam, -1),
                                 counts=s["counts"].reshape(b, beam, v))
                if not use_ind:
                    to_gather["cache"] = jnp.moveaxis(
                        s["cache"].reshape(s["cache"].shape[0], b, beam,
                                           *s["cache"].shape[2:]), 0, 2)
                reordered = gather_beams(to_gather, parent)
                tokens = reordered["tokens"].reshape(bb, -1)
                counts = reordered["counts"].reshape(bb, v)
                if use_ind:
                    cache = s["cache"]
                else:
                    cache = jnp.moveaxis(reordered["cache"], 2, 0).reshape(
                        s["cache"].shape)
                next_tok = tok.reshape(bb)
                finished = fin.reshape(bb)
                cum_lp = cum
                tokens = tokens.at[jnp.arange(bb), cur].set(next_tok)
                if dp.stop_words is not None:
                    stop = match_stop_words(tokens, cur, dp.stop_words,
                                            dp.stop_word_lens)
                    finished = jnp.logical_or(finished, stop)
            else:
                next_tok, lp = dynamic_decode(
                    s["logits"], sub, dp, token_counts=s["counts"],
                    cur_lengths=jnp.full((bb,), gen_len, jnp.int32),
                    tokens=s["tokens"], cur=cur)
                cum_lp = s["cum_lp"] + jnp.where(s["finished"], 0.0, lp)
                next_tok = jnp.where(s["finished"], end_id, next_tok)
                finished = jnp.logical_or(s["finished"],
                                          next_tok == end_id)
                tokens = s["tokens"].at[jnp.arange(bb), cur].set(next_tok)
                if dp.stop_words is not None:
                    stop = match_stop_words(tokens, cur, dp.stop_words,
                                            dp.stop_word_lens)
                    finished = jnp.logical_or(finished, stop)
                counts = s["counts"]
                cache = s["cache"]
            counts = counts + jax.nn.one_hot(next_tok, v, dtype=jnp.int32) * \
                jnp.logical_not(finished)[:, None]
            extra_step = dict(extra_bb)
            out_state = {}
            if use_ind:
                ind = update_indirection(s["ind"], parent, cur)
                extra_step["beam_indirection"] = ind
                out_state["ind"] = ind
            if kt:
                # tail mode: cache rides the carry UNTOUCHED (any in-body
                # cache write — one-column DUS or lax.cond merge — makes
                # XLA copy the whole buffer every step); the merge runs
                # once per K steps in the outer loop below
                step_logits, _, tail = model.apply(
                    params, next_tok[:, None], cache, cur,
                    jnp.full((bb,), cur + 1, jnp.int32),
                    attention_start=start, kv_tail=s["tail"],
                    tail_len=s["tail_len"],
                    megakernel_blobs=mk_blobs, **extra_step)
                out_state["tail"] = tail
                out_state["tail_len"] = s["tail_len"] + 1
            else:
                step_logits, cache = model.apply(
                    params, next_tok[:, None], cache, cur,
                    jnp.full((bb,), cur + 1, jnp.int32),
                    attention_start=start,
                    megakernel_blobs=mk_blobs, **extra_step)
            return dict(logits=step_logits[:, -1].astype(jnp.float32),
                        tokens=tokens, cache=cache, cur=cur + 1,
                        finished=finished, cum_lp=cum_lp, counts=counts,
                        rng=rng, **out_state)

        if kt:
            from ..ops.attention import merge_tail_kv

            def inner_cond(t):
                return jnp.logical_and(t["tail_len"] < kt, cond(t))

            def outer_body(s):
                cur0 = s["cur"]
                t = jax.lax.while_loop(inner_cond, body, s)
                cache = merge_tail_kv(t["cache"], t["tail"], cur0)
                return {**t, "cache": cache,
                        "tail_len": jnp.asarray(0, jnp.int32)}

            final = jax.lax.while_loop(cond, outer_body, init)
        else:
            final = jax.lax.while_loop(cond, body, init)
        tokens = final["tokens"].reshape(b, beam, total_len)
        # per-sequence length: position of first end_id after the prompt
        gen = tokens[:, :, prompt_len:]
        is_end = gen == jnp.reshape(end_id, (b, beam))[..., None]
        any_end = jnp.any(is_end, axis=-1)
        first_end = jnp.argmax(is_end, axis=-1)
        gen_lens = jnp.where(any_end, first_end, max_new_tokens)
        seq_lens = prompt_len + gen_lens
        cum = (final["cum_lp"] if beam > 1
               else final["cum_lp"].reshape(b, beam))
        return tokens, seq_lens.astype(jnp.int32), cum

    # ------------------------------------------------------------------

    def decode(self, input_ids: np.ndarray, input_lengths: np.ndarray,
               sampling_config: Optional[SamplingConfig] = None,
               max_new_tokens: int = 32, seed: int = 0):
        """ref GenerationSession.decode():782.  input_ids [B, L] LEFT-padded
        (pad with anything; attention_start masks it).
        Returns (output_ids [B, beam, total_len] np, seq_lengths [B, beam],
        cum_log_probs [B, beam]).  ``total_len = L + max_new_tokens`` — any
        internal prompt bucketing is sliced back off before returning."""
        if sampling_config is not None:
            # values ride as traced arrays; jit re-traces only if the
            # config's *signature* (per-request-ness, word-list shapes,
            # beam) changes — see SamplingConfig.cache_key
            self.sampling_config = sampling_config
        if self._params is None:
            self.setup()
        sc = self.sampling_config
        beam = sc.num_beams
        b, in_len = input_ids.shape
        if beam > 1 and not self.use_cache_indirection:
            # physical-gather beam reorder rematerialises the WHOLE cache
            # every step: the gathered copy + the donated carry's double
            # buffer put ~3x the cache bytes live at once.  At 2k ctx on a
            # 24L/1024h model that is ~9 GB and it OOM-killed the axon v5e
            # worker (round-2 beam_bench 'gather' mode crash — root cause:
            # memory, not a kernel bug).  cache_indirection (default)
            # carries a [B, beam, S] row map instead and is also ~26x
            # faster at 2k ctx; this mode exists as a numerical
            # cross-check for small shapes.
            mc = self.model_config
            nkv = mc.num_kv_heads or mc.num_heads
            total = in_len + max_new_tokens
            cache_bytes = (mc.num_layers * b * beam * 2 * nkv * total
                           * (mc.hidden_size // mc.num_heads) * 2)
            live = 3 * cache_bytes
            limit = None
            try:
                stats = jax.devices()[0].memory_stats()
                limit = stats.get("bytes_limit") if stats else None
            except Exception:
                pass
            if limit and live > 0.9 * limit:
                raise MemoryError(
                    f"physical-gather beam decode needs ~{live / 1e9:.1f} GB "
                    f"live cache (> device limit {limit / 1e9:.1f} GB); use "
                    "use_cache_indirection=True (the default)")
            if live > 4e9:
                from ..logger import logger
                logger.warning(
                    f"physical-gather beam decode will hold "
                    f"~{live / 1e9:.1f} GB of cache copies live per step; "
                    "prefer use_cache_indirection=True")
        prompt_len = (bucket_length(in_len) if self.bucket_prompts
                      else in_len)
        pad = prompt_len - in_len
        if pad:
            input_ids = np.concatenate(
                [np.full((b, pad), sc.pad_id, input_ids.dtype), input_ids],
                axis=1)
        dparams = DecodeParams.from_config(sc, b)
        from ..plugin import get_plugin_config
        tokens, lens, cum = self._decode_fn(
            self._params, jnp.asarray(input_ids, jnp.int32),
            jnp.asarray(input_lengths, jnp.int32),
            jax.random.PRNGKey(seed or sc.random_seed),
            dparams, prompt_len=prompt_len,
            max_new_tokens=max_new_tokens, beam=beam,
            mk_blobs=(getattr(self, "_mk_blobs", None)
                      if b <= get_plugin_config().get_megakernel_max_batch()
                      else None))
        # one batched fetch — per-array transfers each pay a device round
        # trip (severe over remote-device tunnels)
        tokens, lens, cum = jax.device_get((tokens, lens, cum))
        if pad:
            tokens = tokens[:, :, pad:]       # drop bucket left-padding
            lens = lens - pad
        return tokens, lens, cum

    def best_sequences(self, tokens, seq_lens, cum):
        """Select the top beam per row (gather_tree + ranker equivalent)."""
        best_tokens, best = finalize_beams(
            jnp.asarray(tokens), jnp.asarray(cum), jnp.asarray(seq_lens),
            self.sampling_config.length_penalty)
        b = tokens.shape[0]
        best_tokens, best = jax.device_get((best_tokens, best))
        return (best_tokens, np.asarray(seq_lens)[np.arange(b), best])


def _filtered_logits(logits, dp: DecodeParams, counts, gen_lens, tokens,
                     cur):
    """Penalties + min-length + bad-words (the filter half of
    dynamic_decode) — used by the beam path, which selects tokens itself."""
    from .sampling import (apply_min_length, apply_presence_penalty,
                           apply_repetition_penalty, ban_bad_words)
    logits = apply_repetition_penalty(logits, counts, dp.repetition_penalty)
    logits = apply_presence_penalty(logits, counts, dp.presence_penalty)
    logits = apply_min_length(logits, gen_lens, dp.min_length, dp.end_id)
    if dp.bad_words is not None:
        logits = ban_bad_words(logits, tokens, cur, dp.bad_words,
                               dp.bad_word_lens)
    return logits, None
