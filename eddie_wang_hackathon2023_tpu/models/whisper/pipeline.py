"""Whisper inference pipeline: encode -> cross-KV precompute -> on-device
autoregressive decode.

Behavioural counterpart of ``E/whisper/encoding.py`` + ``E/whisper/
decoding.py`` (WhisperDecoding:300, main_loop:785, detect_language:703,
post_process:827, logit filters SuppressBlank:202/SuppressTokens:212/
ApplyTimestampRules:134, GreedyDecoder:274).

TPU-native restructuring: the reference drives the decoder engine from
Python — one engine launch per token plus torch-side logit filtering
(~70 tensors assembled per step, decoding.py:543-634).  Here the *entire*
loop — prefill, per-step decode, every logit filter, greedy/sampled update
and stop tracking — is one jitted program built around
``lax.while_loop``, so a full utterance costs a single device dispatch.
The logit-filter state machine (timestamp pairing rules, non-decreasing
timestamps, max-initial-timestamp) is carried as O(1) loop state instead of
re-scanning token history.
"""
from __future__ import annotations

import dataclasses
import zlib
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...logger import logger
from ...quantization import QuantMode
from ..whisper.config import WhisperConfig
from ..whisper.model import CrossAttnKV, WhisperDecoder, WhisperEncoder
from ...runtime.sampling import (beam_search_step, gather_beams,
                                 update_indirection)
from ...text.tokenizer import Tokenizer, get_tokenizer

CHUNK_LENGTH = 30
NEG_INF = float("-inf")


@dataclasses.dataclass(frozen=True)
class DecodingOptions:
    """ref decoding.py:33-67 (same fields, same defaults)."""
    task: str = "transcribe"
    language: Optional[str] = None
    temperature: float = 0.0
    sample_len: Optional[int] = None
    best_of: Optional[int] = None
    beam_size: Optional[int] = None
    patience: Optional[float] = None
    length_penalty: Optional[float] = None
    prompt: Optional[Union[str, List[int]]] = None
    prefix: Optional[Union[str, List[int]]] = None
    suppress_tokens: Optional[Union[str, Sequence[int]]] = "-1"
    suppress_blank: bool = True
    without_timestamps: bool = False
    max_initial_timestamp: Optional[float] = 1.0


@dataclasses.dataclass(frozen=True)
class DecodingResult:
    """ref decoding.py:69-80."""
    audio_features: Optional[np.ndarray]
    language: str
    language_probs: Optional[Dict[str, float]] = None
    tokens: List[int] = dataclasses.field(default_factory=list)
    text: str = ""
    avg_logprob: float = np.nan
    no_speech_prob: float = np.nan
    temperature: float = np.nan
    compression_ratio: float = np.nan


def _maximum_likelihood_rank(tokens_groups, sum_logprobs_groups,
                             length_penalty: Optional[float]) -> List[int]:
    """ref MaximumLikelihoodRanker (decoding.py:92-115)."""
    selected = []
    for toks, lps in zip(tokens_groups, sum_logprobs_groups):
        scores = []
        for t, lp in zip(toks, lps):
            penalty = (len(t) if length_penalty is None
                       else ((5 + len(t)) / 6) ** length_penalty)
            scores.append(lp / penalty)
        selected.append(int(np.argmax(scores)))
    return selected


class WhisperPipeline:
    """Three jitted stages over one parameter store (the reference's three
    engines), plus host-side tokenizer/post-processing."""

    def __init__(self,
                 config: WhisperConfig,
                 encoder: WhisperEncoder,
                 decoder: WhisperDecoder,
                 cross_kv: CrossAttnKV,
                 options: DecodingOptions = DecodingOptions(),
                 quant_mode: QuantMode = QuantMode(0)):
        self.config = config
        self.encoder = encoder
        self.decoder = decoder
        self.cross_kv = cross_kv
        self.options = options
        self.quant_mode = quant_mode

        multilingual = config.n_vocab >= 51865
        self.tokenizer = get_tokenizer(multilingual,
                                       language=options.language or "en",
                                       task=options.task)
        tok = self.tokenizer
        self.sample_len = options.sample_len or config.n_text_ctx // 2
        self.sot_sequence = tok.sot_sequence
        if options.without_timestamps:
            self.sot_sequence = tok.sot_sequence_including_notimestamps
        self.initial_tokens = self._get_initial_tokens()
        self.sample_begin = len(self.initial_tokens)
        self.sot_index = self.initial_tokens.index(tok.sot)
        # ref decoding.py _verify_options: beam_size and best_of are
        # mutually exclusive; best_of needs sampling; patience needs beams
        if options.beam_size is not None and options.best_of is not None:
            raise ValueError("beam_size and best_of can't be given together")
        if options.temperature == 0 and options.best_of is not None:
            raise ValueError("best_of with greedy sampling is not compatible")
        if options.patience is not None and options.beam_size is None:
            raise ValueError("patience requires beam_size to be given")
        if options.patience is not None and options.patience != 1.0:
            raise NotImplementedError(
                "patience != 1 is not supported (finished beams are kept "
                "in-beam with frozen scores; extra finished-candidate "
                "collection is not implemented)")
        self.beam = options.beam_size or 1     # real beam search (not best_of)
        self.n_group = options.beam_size or options.best_of or 1

        # -- static filter tables (host-precomputed, device-resident) -----
        v = config.n_vocab
        suppress = np.zeros((v,), np.float32)
        suppress[list(self._get_suppress_tokens())] = NEG_INF
        self._suppress_mask = suppress                     # SuppressTokens
        blank = np.zeros((v,), np.float32)
        blank[tok.encode(" ") + [tok.eot]] = NEG_INF
        self._blank_mask = blank                           # SuppressBlank
        self.max_initial_timestamp_index = 0
        if options.max_initial_timestamp:
            precision = CHUNK_LENGTH / config.n_audio_ctx
            self.max_initial_timestamp_index = round(
                options.max_initial_timestamp / precision)

        # -- jitted stages -------------------------------------------------
        self._params_enc = None
        self._params_dec = None
        self._params_ckv = None

        self._encode_fn = jax.jit(
            lambda p, mel: self.encoder.apply(p, mel))
        self._cross_fn = jax.jit(
            lambda p, xa: self.cross_kv.apply(p, xa))
        self._generate_fn = jax.jit(
            partial(self._generate_impl),
            static_argnames=("prompt_len", "max_new"))
        self._detect_fn = jax.jit(self._detect_impl)
        # fixed-language fast path: mel -> text in ONE program (each extra
        # dispatch+fetch pays a device round trip — see main_loop note)
        self._e2e_fn = jax.jit(self._e2e_impl,
                               static_argnames=("prompt_len", "max_new"))

    # -- parameter management ---------------------------------------------

    def bind_params(self, enc_state=None, dec_state=None, ckv_state=None):
        """Capture device-resident state dicts once (they are jit args, so
        they stay wherever they were placed — host-sharded for TP)."""
        self._params_enc = enc_state if enc_state is not None else self.encoder.state_dict()
        self._params_dec = dec_state if dec_state is not None else self.decoder.state_dict()
        self._params_ckv = ckv_state if ckv_state is not None else self.cross_kv.state_dict()
        self._mk_blobs = None

    def _megakernel_blobs(self, batch: int = 1):
        """Packed weight image for the whole-decoder-layer megakernel
        (ops/pallas_decoder_layer.py), built once per bound params and
        passed as a jit arg so the decode loop streams it directly.  None
        when the recipe/structure doesn't qualify — including batch >
        megakernel_max_batch (device A/B: batch-8 throughput belongs to
        the scanned path's weight-amortising GEMMs; don't even pack the
        weight image there)."""
        from ...plugin import get_plugin_config
        if not get_plugin_config().use_decode_megakernel():
            return None
        if batch > get_plugin_config().get_megakernel_max_batch():
            return None
        if not self.decoder.megakernel_eligible():
            return None
        from ...ops.pallas_decoder_layer import params_cross_device_sharded
        if params_cross_device_sharded(self._params_dec):
            # pspec-sharded TP/DP state: the megakernel is a single-core
            # program — sharded models take the scanned path (XLA
            # partitions its einsums over the mesh)
            return None
        if getattr(self, "_mk_blobs", None) is None:
            from ...ops.pallas_decoder_layer import pack_decoder_blobs
            c = self.config
            state = {k[len("blocks."):]: v
                     for k, v in self._params_dec.items()
                     if k.startswith("blocks.")}
            pack = partial(pack_decoder_blobs, n_layer=c.n_text_layer,
                           hidden=c.n_text_state, n_head=c.n_text_head,
                           head_dim=c.head_dim,
                           ffn=self.decoder.blocks.mlp1.out_features,
                           with_cross=True)
            self._mk_blobs = jax.jit(pack)(state)
        return self._mk_blobs

    def _ensure_params(self):
        if self._params_dec is None:
            self.bind_params()

    # -- initial tokens (ref _get_initial_tokens, decoding.py:482-513) ----

    def _get_initial_tokens(self) -> Tuple[int, ...]:
        tok = self.tokenizer
        tokens = list(self.sot_sequence)
        if self.options.prefix:
            prefix = self.options.prefix
            prefix_tokens = (tok.encode(" " + prefix.strip())
                             if isinstance(prefix, str) else list(prefix))
            if self.sample_len is not None:
                max_prefix_len = self.config.n_text_ctx // 2 - self.sample_len
                if max_prefix_len > 0:
                    prefix_tokens = prefix_tokens[-max_prefix_len:]
            tokens = tokens + prefix_tokens
        if self.options.prompt:
            prompt = self.options.prompt
            prompt_tokens = (tok.encode(" " + prompt.strip())
                             if isinstance(prompt, str) else list(prompt))
            tokens = ([tok.sot_prev]
                      + prompt_tokens[-(self.config.n_text_ctx // 2 - 1):]
                      + tokens)
        return tuple(tokens)

    def _get_suppress_tokens(self) -> Tuple[int, ...]:
        """ref decoding.py:394-421."""
        tok = self.tokenizer
        suppress = self.options.suppress_tokens
        if isinstance(suppress, str):
            suppress = [int(t) for t in suppress.split(",")]
        suppress = list(suppress) if suppress else []
        if -1 in suppress:
            suppress = [t for t in suppress if t >= 0]
            suppress.extend(tok.non_speech_tokens)
        suppress.extend([tok.transcribe, tok.translate, tok.sot,
                         tok.sot_prev, tok.sot_lm])
        if tok.no_speech is not None:
            suppress.append(tok.no_speech)
        return tuple(sorted(set(suppress)))

    # -- logit filters (vectorised; ref decoding.py:134-221) --------------

    def _apply_filters(self, logits, cur_len, last_tok, penult_tok, last_ts,
                       has_ts):
        """logits [B, V] fp32; cur_len = tokens generated so far *including*
        the prompt; state per batch row.  Returns filtered logits."""
        tok = self.tokenizer
        v = self.config.n_vocab
        ts_begin = tok.timestamp_begin
        is_first = cur_len == self.sample_begin

        if self.options.suppress_blank:
            logits = logits + jnp.where(is_first, self._blank_mask, 0.0)
        if self.options.suppress_tokens:
            logits = logits + self._suppress_mask

        if not self.options.without_timestamps:
            col = jax.lax.broadcasted_iota(jnp.int32, (1, v), 1)
            # suppress <|notimestamps|>
            logits = jnp.where(col == tok.no_timestamps, NEG_INF, logits)
            last_was_ts = jnp.logical_and(cur_len > self.sample_begin,
                                          last_tok >= ts_begin)
            penult_was_ts = jnp.logical_or(
                cur_len - self.sample_begin < 2, penult_tok >= ts_begin)
            # pairs rule
            mask_ts = jnp.logical_and(last_was_ts, penult_was_ts)[:, None]
            mask_text = jnp.logical_and(last_was_ts,
                                        jnp.logical_not(penult_was_ts))[:, None]
            logits = jnp.where(jnp.logical_and(mask_ts, col >= ts_begin),
                               NEG_INF, logits)
            logits = jnp.where(jnp.logical_and(mask_text, col < tok.eot),
                               NEG_INF, logits)
            # non-decreasing timestamps: forbid ts < timestamp_last
            ts_last = jnp.where(
                jnp.logical_and(last_was_ts, jnp.logical_not(penult_was_ts)),
                last_ts, last_ts + 1)
            lo = jnp.where(has_ts, ts_last, ts_begin)[:, None]
            logits = jnp.where(
                jnp.logical_and(has_ts[:, None],
                                jnp.logical_and(col >= ts_begin, col < lo)),
                NEG_INF, logits)
            # first sampled position: timestamps only, bounded start
            logits = jnp.where(jnp.logical_and(is_first, col < ts_begin),
                               NEG_INF, logits)
            if self.max_initial_timestamp_index:
                last_allowed = ts_begin + self.max_initial_timestamp_index
                logits = jnp.where(
                    jnp.logical_and(is_first, col > last_allowed),
                    NEG_INF, logits)
            # if total timestamp probability beats any text token -> timestamp
            logprobs = jax.nn.log_softmax(logits, axis=-1)
            ts_logprob = jax.nn.logsumexp(logprobs[:, ts_begin:], axis=-1)
            max_text = jnp.max(logprobs[:, :ts_begin], axis=-1)
            force_ts = (ts_logprob > max_text)[:, None]
            logits = jnp.where(jnp.logical_and(force_ts, col < ts_begin),
                               NEG_INF, logits)
        return logits

    # -- the generate program (one jit) -----------------------------------

    def _generate_impl(self, dec_params, init_tokens, cross_kv, rng,
                       prompt_len: int, max_new: int, mk_blobs=None):
        """init_tokens [B, prompt_len] int32 -> (tokens [B, max_total],
        lengths [B], sum_logprobs [B], no_speech_probs [B]).

        With ``options.beam_size`` this runs REAL on-device beam search
        (ref openai BeamSearchDecoder, decoding.py:274+): rows come in
        groups of ``beam`` per audio, all beams of a group expand jointly
        by cumulative logprob, carried state (tokens, timestamp filter
        state) is reordered by parent each step while the KV cache stays
        put behind a cache_indirection row map, finished beams
        propagate frozen EOS continuations, and the final group ranking is
        the shared MaximumLikelihoodRanker in post_process."""
        tok = self.tokenizer
        b = init_tokens.shape[0]
        beam = self.beam
        c = self.config
        max_total = prompt_len + max_new
        ts_begin = tok.timestamp_begin

        # K-step deferred KV-store tail (ops.attention write_tail_kv):
        # greedy/sampling only — the beam path reads history through the
        # cache_indirection row map, which the tail read does not compose
        # with
        from ...plugin import get_plugin_config
        kt = get_plugin_config().get_decode_tail() if beam == 1 else 0
        # kt columns of slack so the once-per-K merge never clamps
        cache = self.decoder.new_kv_cache(
            b, self.config.n_text_ctx + kt if kt else None)

        def dec(tokens, cache, widx, seqlen, tail=None, tail_len=None,
                beam_ind=None):
            if tail is not None:
                return self.decoder.apply(dec_params, tokens, cache,
                                          cross_kv, widx, seqlen,
                                          kv_tail=tail, tail_len=tail_len,
                                          megakernel_blobs=mk_blobs)
            if beam_ind is not None:
                return self.decoder.apply(dec_params, tokens, cache,
                                          cross_kv, widx, seqlen,
                                          beam_indirection=beam_ind)
            return self.decoder.apply(dec_params, tokens, cache, cross_kv,
                                      widx, seqlen,
                                      megakernel_blobs=mk_blobs)

        # prefill
        seqlen0 = jnp.full((b,), prompt_len, jnp.int32)
        logits_all, cache = dec(init_tokens, cache, 0, seqlen0)
        probs_at_sot = jax.nn.softmax(
            logits_all[:, self.sot_index].astype(jnp.float32), axis=-1)
        no_speech_probs = probs_at_sot[:, tok.no_speech]
        logits = logits_all[:, -1].astype(jnp.float32)

        tokens_buf = jnp.full((b, max_total), tok.eot, jnp.int32)
        tokens_buf = jax.lax.dynamic_update_slice(tokens_buf, init_tokens,
                                                  (0, 0))

        init_state = dict(
            logits=logits,
            tokens=tokens_buf,
            cur_len=jnp.asarray(prompt_len, jnp.int32),
            cache=cache,
            sum_logprobs=jnp.zeros((b,), jnp.float32),
            finished=jnp.zeros((b,), jnp.bool_),
            last_ts=jnp.zeros((b,), jnp.int32),
            has_ts=jnp.zeros((b,), jnp.bool_),
            rng=rng,
        )
        if kt:
            from ...ops.attention import new_tail_kv
            init_state["tail"] = new_tail_kv(cache, kt)
            init_state["tail_len"] = jnp.asarray(0, jnp.int32)
        if beam > 1:
            # rows arrive pre-tiled in groups of `beam`; before the first
            # expansion only beam 0 of each group may win (all beams are
            # identical copies of the prefill), so the rest start at -inf
            assert b % beam == 0
            mask0 = (jnp.arange(b) % beam) != 0
            init_state["sum_logprobs"] = jnp.where(mask0, -1e9, 0.0)
            # cache_indirection row map (ops/runtime update_indirection):
            # the CACHE stays put; only this [ng, beam, S] map advances.
            # (Physically re-gathering the whole stacked cache by parent
            # each step — the round-2 formulation — over-committed v5e
            # HBM with gather temporaries and crashed the axon worker,
            # the same failure mode as beam_bench's deleted gather mode.)
            init_state["ind"] = jnp.broadcast_to(
                jnp.arange(beam, dtype=jnp.int32)[None, :, None],
                (b // beam, beam, self.config.n_text_ctx))
        ng = b // beam

        def cond(s):
            return jnp.logical_and(s["cur_len"] < max_total,
                                   jnp.logical_not(jnp.all(s["finished"])))

        def body(s):
            cur = s["cur_len"]
            bidx = jnp.arange(b)
            last_tok = s["tokens"][bidx, cur - 1]
            penult_tok = s["tokens"][bidx, cur - 2]
            logits = self._apply_filters(s["logits"], cur, last_tok,
                                         penult_tok, s["last_ts"], s["has_ts"])
            if beam > 1:
                # ref BeamSearchDecoder.update: joint expansion of each
                # group's beams by cumulative logprob, frozen-EOS carry
                logprobs = jax.nn.log_softmax(logits, axis=-1)
                parent, tok_b, cum, fin = beam_search_step(
                    logprobs.reshape(ng, beam, -1),
                    s["sum_logprobs"].reshape(ng, beam),
                    s["finished"].reshape(ng, beam), beam, tok.eot)
                # carried per-beam state follows the surviving beams; the
                # KV cache does NOT move — the indirection row map does
                reord = gather_beams(
                    dict(tokens=s["tokens"].reshape(ng, beam, -1),
                         last_ts=s["last_ts"].reshape(ng, beam),
                         has_ts=s["has_ts"].reshape(ng, beam)),
                    parent)
                tokens = reord["tokens"].reshape(b, -1)
                last_ts_p = reord["last_ts"].reshape(b)
                has_ts_p = reord["has_ts"].reshape(b)
                cache_in = s["cache"]
                beam_ind = update_indirection(s["ind"], parent, cur)
                next_tok = tok_b.reshape(b)
                was_finished = jnp.take_along_axis(
                    s["finished"].reshape(ng, beam), parent, axis=1
                ).reshape(b)
                finished = fin.reshape(b)
                sum_lp = cum.reshape(b)
                next_tok = jnp.where(was_finished, tok.eot, next_tok)
                rng = s["rng"]
            else:
                if self.options.temperature == 0:
                    next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    rng = s["rng"]
                else:
                    rng, sub = jax.random.split(s["rng"])
                    next_tok = jax.random.categorical(
                        sub,
                        logits / self.options.temperature).astype(jnp.int32)
                logprobs = jax.nn.log_softmax(logits, axis=-1)
                cur_lp = logprobs[bidx, next_tok]
                # ref GreedyDecoder.update: accumulate while previous !=
                # eot, and freeze token to eot once finished
                sum_lp = s["sum_logprobs"] + jnp.where(s["finished"], 0.0,
                                                       cur_lp)
                next_tok = jnp.where(s["finished"], tok.eot, next_tok)
                was_finished = s["finished"]
                finished = jnp.logical_or(s["finished"], next_tok == tok.eot)
                tokens = s["tokens"]
                last_ts_p = s["last_ts"]
                has_ts_p = s["has_ts"]
                cache_in = s["cache"]
            is_ts = next_tok >= ts_begin
            live_ts = jnp.logical_and(is_ts, jnp.logical_not(was_finished))
            last_ts = jnp.where(live_ts, next_tok, last_ts_p)
            has_ts = jnp.logical_or(has_ts_p, live_ts)
            tokens = tokens.at[bidx, cur].set(next_tok)
            # next decode step
            seqlen = jnp.full((b,), cur + 1, jnp.int32)
            if kt:
                # tail mode: the big cache rides the carry UNTOUCHED (a
                # carry pass-through aliases; any in-body cache write
                # forces XLA to copy the whole buffer every step — both a
                # one-column dynamic-update-slice and a lax.cond merge
                # measured ~0.28 ms/step on large-v2).  The merge happens
                # once per K steps in the OUTER loop below.
                step_logits, _, tail = dec(
                    next_tok[:, None], cache_in, cur, seqlen,
                    tail=s["tail"], tail_len=s["tail_len"])
                return dict(logits=step_logits[:, -1].astype(jnp.float32),
                            tokens=tokens, cur_len=cur + 1, cache=cache_in,
                            sum_logprobs=sum_lp, finished=finished,
                            last_ts=last_ts, has_ts=has_ts, rng=rng,
                            tail=tail, tail_len=s["tail_len"] + 1)
            step_logits, cache = dec(next_tok[:, None], cache_in, cur,
                                     seqlen,
                                     beam_ind=(beam_ind if beam > 1
                                               else None))
            out = dict(logits=step_logits[:, -1].astype(jnp.float32),
                       tokens=tokens, cur_len=cur + 1, cache=cache,
                       sum_logprobs=sum_lp, finished=finished,
                       last_ts=last_ts, has_ts=has_ts, rng=rng)
            if beam > 1:
                out["ind"] = beam_ind
            return out

        if kt:
            from ...ops.attention import merge_tail_kv

            def inner_cond(t):
                return jnp.logical_and(t["tail_len"] < kt, cond(t))

            def outer_body(s):
                cur0 = s["cur_len"]
                t = jax.lax.while_loop(inner_cond, body, s)
                # unconditional once-per-chunk merge: always the full Kmax
                # block at cur0 (columns past the valid tail are garbage in
                # the slack/masked region and get overwritten next chunk)
                cache = merge_tail_kv(t["cache"], t["tail"], cur0)
                return {**t, "cache": cache,
                        "tail_len": jnp.asarray(0, jnp.int32)}

            final = jax.lax.while_loop(cond, outer_body, init_state)
        else:
            final = jax.lax.while_loop(cond, body, init_state)
        return (final["tokens"], final["cur_len"], final["sum_logprobs"],
                no_speech_probs)

    def _e2e_impl(self, enc_params, ckv_params, dec_params, mel, init_tokens,
                  rng, prompt_len: int, max_new: int, mk_blobs=None):
        """encode -> cross-KV warping -> full generate, one program."""
        xa = self.encoder.apply(enc_params, mel)
        cross_kv = self.cross_kv.apply(ckv_params, xa)
        if self.n_group > 1:
            if isinstance(cross_kv, tuple):
                cross_kv = (jnp.repeat(cross_kv[0], self.n_group, axis=1),
                            cross_kv[1])
            else:
                cross_kv = jnp.repeat(cross_kv, self.n_group, axis=1)
        out = self._generate_impl(dec_params, init_tokens, cross_kv, rng,
                                  prompt_len, max_new, mk_blobs=mk_blobs)
        return out + (xa,)

    def _detect_impl(self, dec_params, cross_kv):
        """ref detect_language (decoding.py:703-743): single [sot] step,
        mask to language tokens."""
        tok = self.tokenizer
        b = (cross_kv[0] if isinstance(cross_kv, tuple)
             else cross_kv).shape[1]
        cache = self.decoder.new_kv_cache(b)
        x = jnp.full((b, 1), tok.sot, jnp.int32)
        logits, _ = self.decoder.apply(dec_params, x, cache, cross_kv, 0,
                                       jnp.ones((b,), jnp.int32))
        logits = logits[:, 0].astype(jnp.float32)
        v = self.config.n_vocab
        lang_ids = jnp.asarray(tok.all_language_tokens)
        mask = jnp.full((v,), NEG_INF).at[lang_ids].set(0.0)
        logits = logits + mask
        lang_tokens = jnp.argmax(logits, axis=-1)
        lang_probs = jax.nn.softmax(logits, axis=-1)[:, lang_ids]
        return lang_tokens, lang_probs

    # -- public API --------------------------------------------------------

    def get_audio_features(self, mel) -> jax.Array:
        """ref encoding.py:48-77."""
        self._ensure_params()
        mel = jnp.asarray(mel, dtype=self.encoder.conv1.weight.dtype)
        if mel.ndim == 2:
            mel = mel[None]
        return self._encode_fn(self._params_enc, mel)

    def precompute_cross_kv(self, audio_features) -> jax.Array:
        """The cross_kv_cache_warping call (ref xa2cross_key_value:515)."""
        self._ensure_params()
        return self._cross_fn(self._params_ckv, audio_features)

    def detect_language(self, audio_features, cross_kv=None):
        self._ensure_params()
        tok = self.tokenizer
        if self.options.language is not None and self.options.task != "lang_id":
            return ([self.options.language] * audio_features.shape[0], None)
        if cross_kv is None:
            cross_kv = self.precompute_cross_kv(audio_features)
        lang_tokens, lang_probs = self._detect_fn(self._params_dec, cross_kv)
        lang_probs = np.asarray(lang_probs)
        probs = [
            {c: float(lang_probs[i, j])
             for j, c in enumerate(tok.all_language_codes)}
            for i in range(lang_probs.shape[0])
        ]
        languages = [max(p, key=p.get) for p in probs]
        return languages, probs

    def main_loop(self, audio_features, cross_kv=None, seed: int = 0,
                  languages: Optional[List[str]] = None):
        """ref main_loop (decoding.py:785-826): returns (tokens [B, T] np,
        lengths, sum_logprobs, no_speech_probs).  ``languages`` (from
        detect_language) overwrites the language slot of the prompt, the
        reference's ``self.tokens[:, sot_index+1] = language_tokens``."""
        self._ensure_params()
        if cross_kv is None:
            cross_kv = self.precompute_cross_kv(audio_features)
        b = (cross_kv[0] if isinstance(cross_kv, tuple)
             else cross_kv).shape[1]
        init = np.tile(np.asarray(self.initial_tokens, np.int32), (b, 1))
        if languages is not None and self.options.language is None:
            from ...text.languages import LANGUAGES
            for i, lang in enumerate(languages):
                init[i, self.sot_index + 1] = (self.tokenizer.sot + 1 +
                                               list(LANGUAGES).index(lang))
        if self.n_group > 1:
            # best_of: n_group independent trajectories per audio (ref
            # decoding.py:786 repeat_interleave + MaximumLikelihoodRanker)
            init = np.repeat(init, self.n_group, axis=0)
            if isinstance(cross_kv, tuple):
                cross_kv = (jnp.repeat(cross_kv[0], self.n_group, axis=1),
                            cross_kv[1])
            else:
                cross_kv = jnp.repeat(cross_kv, self.n_group, axis=1)
        # ONE batched device->host fetch: each individual np.asarray on a
        # device array is a full tunnel round trip (~25 ms on axon) —
        # sequential fetches were costing more than the decode itself
        tokens, lengths, sum_lp, ns_probs = jax.device_get(self._generate_fn(
            self._params_dec, jnp.asarray(init), cross_kv,
            jax.random.PRNGKey(seed), prompt_len=len(self.initial_tokens),
            max_new=self.sample_len,
            mk_blobs=self._megakernel_blobs(batch=init.shape[0])))
        lengths = np.full((tokens.shape[0],), int(lengths),
                          np.int32)                     # shared loop counter
        return tokens, lengths, sum_lp, ns_probs

    @staticmethod
    def compression_ratio(text: str) -> float:
        tb = text.encode("utf-8")
        return len(tb) / len(zlib.compress(tb))

    def post_process(self, tokens, lengths, sum_logprobs, no_speech_probs,
                     languages, audio_features=None) -> List[DecodingResult]:
        """ref post_process (decoding.py:827-877): reshape trajectories to
        (n_audio, n_group), rank, and decode the winners."""
        tok = self.tokenizer
        if audio_features is not None:
            audio_features = np.asarray(audio_features)   # one fetch, not B
        g = self.n_group
        if g > 1:
            n_audio = tokens.shape[0] // g
            groups_t, groups_lp = [], []
            for i in range(n_audio):
                rows = []
                for j in range(g):
                    seq = tokens[i * g + j,
                                 self.sample_begin:lengths[i * g + j]]
                    eot_pos = np.nonzero(seq == tok.eot)[0]
                    rows.append(seq[:eot_pos[0]] if eot_pos.size else seq)
                groups_t.append(rows)
                groups_lp.append([float(sum_logprobs[i * g + j])
                                  for j in range(g)])
            best = _maximum_likelihood_rank(groups_t, groups_lp,
                                            self.options.length_penalty)
            idx = [i * g + best[i] for i in range(n_audio)]
            tokens = tokens[idx]
            lengths = np.asarray(lengths)[idx]
            sum_logprobs = np.asarray(sum_logprobs)[idx]
            no_speech_probs = np.asarray(no_speech_probs)[idx]
        results = []
        for i in range(tokens.shape[0]):
            seq = tokens[i, self.sample_begin:lengths[i]]
            eot_pos = np.nonzero(seq == tok.eot)[0]
            if eot_pos.size:
                seq = seq[:eot_pos[0]]
            toks = [int(t) for t in seq]
            text = tok.decode(toks).strip()
            lp = float(sum_logprobs[i])
            results.append(DecodingResult(
                audio_features=(None if audio_features is None
                                else np.asarray(audio_features[i])),
                language=languages[i],
                tokens=toks,
                text=text,
                avg_logprob=lp / (len(toks) + 1),
                no_speech_prob=float(no_speech_probs[i]),
                temperature=self.options.temperature,
                compression_ratio=self.compression_ratio(text),
            ))
        return results

    def transcribe_long(self, audio, seed: int = 0) -> Dict:
        """Long-form (>30 s) transcription — the capability the reference
        simply skips (summarize.py:118-119 drops clips over 30 s): slide a
        30 s window over the audio and advance it by the last *paired*
        timestamp token of each decode (openai transcribe.py seek
        semantics), so windows start where speech actually stopped.

        audio: 1-D float waveform at 16 kHz (any length).
        Returns {"text", "segments": [{start, end, text}], "language"}.
        """
        import numpy as np
        from ...audio import HOP_LENGTH, SAMPLE_RATE, log_mel_spectrogram
        tok = self.tokenizer
        ts_begin = tok.timestamp_begin
        mel = np.asarray(log_mel_spectrogram(audio))        # [80, T]
        n_frames_total = mel.shape[-1]
        # window geometry from the model config (stride-2 encoder conv:
        # 2 mel frames per audio position; 3000 frames/30 s on large-v2)
        n_frames = 2 * self.config.n_audio_ctx
        input_stride = 2                                    # frames/pos
        time_precision = input_stride * HOP_LENGTH / SAMPLE_RATE  # s/pos
        seek = 0
        segments: List[Dict] = []
        texts: List[str] = []
        language = self.options.language or "en"
        while seek < n_frames_total:
            window = mel[:, seek:seek + n_frames]
            pad = n_frames - window.shape[-1]
            if pad > 0:
                window = np.pad(window, ((0, 0), (0, pad)))
            time_offset = seek * HOP_LENGTH / SAMPLE_RATE
            result = self.transcribe(window[None], seed=seed)[0]
            language = result.language
            tokens = np.asarray(result.tokens)
            is_ts = tokens >= ts_begin
            # a CONSECUTIVE timestamp pair closes a segment and opens the
            # next (openai transcribe.py); each slice ends at the first
            # timestamp of a pair
            consecutive = np.where(is_ts[:-1] & is_ts[1:])[0] + 1
            if len(consecutive):
                last_slice = 0
                for c in consecutive:
                    seg = tokens[last_slice:c]
                    ts_in = seg[seg >= ts_begin]
                    if len(ts_in) >= 2:
                        segments.append(dict(
                            start=time_offset + float(ts_in[0] - ts_begin)
                            * time_precision,
                            end=time_offset + float(ts_in[-1] - ts_begin)
                            * time_precision,
                            text=tok.decode([int(t) for t in seg
                                             if t < tok.eot]).strip()))
                    last_slice = c
                seek_units = int(tokens[consecutive[-1]] - ts_begin)
                seek += (seek_units * input_stride if seek_units > 0
                         else n_frames)       # degenerate: avoid stalling
            else:
                # no closing pair: consume the whole window; use trailing
                # timestamps for the segment span when present
                ts_in = tokens[is_ts]
                end = (time_offset + float(ts_in[-1] - ts_begin)
                       * time_precision if len(ts_in)
                       else time_offset + min(
                           n_frames, n_frames_total - seek) * HOP_LENGTH
                       / SAMPLE_RATE)
                text = tok.decode([int(t) for t in tokens
                                   if t < tok.eot]).strip()
                if text:
                    segments.append(dict(start=time_offset, end=end,
                                         text=text))
                seek += n_frames
            if segments and segments[-1]["text"]:
                texts.append(segments[-1]["text"])
        return dict(text=" ".join(t for t in (s["text"] for s in segments)
                                  if t).strip(),
                    segments=segments, language=language)

    def transcribe(self, mel, seed: int = 0, fused: Optional[bool] = None,
                   keep_audio_features: bool = False) -> List[DecodingResult]:
        """Full pipeline for a batch of 30 s mel windows [B, n_mels, 3000]
        (ref run.py generate():31-63).

        ``fused=True`` runs mel->tokens as ONE jitted program (fixed
        language only).  Measured on v5e it is NOT the default: the saved
        dispatch round trips (~30 ms) are outweighed by XLA choosing worse
        intermediate layouts for the cross-KV inside the single program
        (~+95 ms on large-v2); at a program boundary the cross tensor is
        materialised in the seq-minor layout the decode loop wants.
        Re-measured round 4 with the megakernel: fused 7.38 vs staged
        7.48 utt/s — the staged path stays the default (the gap is now
        small because the megakernel consumes the cross cache as a
        kernel arg, but the layout penalty still exceeds the saved
        dispatches).  ``fused=None`` consults PluginConfig.fused_transcribe
        (env EWT_FUSED_E2E)."""
        self._ensure_params()
        if fused is None:
            from ...plugin import get_plugin_config
            fused = get_plugin_config().use_fused_transcribe()
        if fused and self.options.language is not None \
                and self.options.task != "lang_id":
            b = mel.shape[0]
            init = np.tile(np.asarray(self.initial_tokens, np.int32), (b, 1))
            if self.n_group > 1:
                init = np.repeat(init, self.n_group, axis=0)
            mel_j = jnp.asarray(np.asarray(mel),
                                dtype=self.encoder.conv1.weight.value.dtype)
            out = self._e2e_fn(self._params_enc, self._params_ckv,
                               self._params_dec, mel_j, jnp.asarray(init),
                               jax.random.PRNGKey(seed),
                               prompt_len=len(self.initial_tokens),
                               max_new=self.sample_len,
                               mk_blobs=self._megakernel_blobs(
                                   batch=init.shape[0]))
            tokens, cur_len, sum_lp, ns = jax.device_get(out[:4])
            xa = out[4]
            lengths = np.full((tokens.shape[0],), int(cur_len), np.int32)
            languages = [self.options.language] * b
            return self.post_process(tokens, lengths, sum_lp, ns, languages,
                                     xa if keep_audio_features else None)
        xa = self.get_audio_features(mel)
        cross_kv = self.precompute_cross_kv(xa)
        languages, probs = self.detect_language(xa, cross_kv)
        tokens, lengths, sum_lp, ns = self.main_loop(xa, cross_kv, seed,
                                                     languages=languages)
        # fetching audio features costs a multi-MB device->host transfer
        # per call; only pay it when the caller wants them in the results
        return self.post_process(tokens, lengths, sum_lp, ns, languages,
                                 xa if keep_audio_features else None)
