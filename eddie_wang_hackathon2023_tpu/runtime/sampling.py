"""Sampling / decoding kernels.

TPU-native counterpart of the reference's C++/CUDA sampling stack:
DynamicDecodeLayer (``cpp/tensorrt_llm/layers/dynamicDecodeLayer.cpp:154``)
dispatching to topK/topP kernels (samplingTopKKernels.cu, ~1300 LoC topP),
penalty kernels (samplingPenaltyKernels.cu), ban/stop kernels
(banBadWords.cu, stop-criteria kernels) and online beam search — all
expressed here as jnp ops that XLA fuses into the decode step, so sampling
lives *inside* the generation loop on device instead of being a separate
enqueue per step.

Per-request parameters (the reference's per-batch-entry SamplingConfig,
``GptManager.h:48``) are carried as [B]-shaped device arrays in
:class:`DecodeParams`; they are *traced* jit arguments, so changing
temperatures/top-k/ban-lists between calls never recompiles the decode
program (only shape changes do).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = float("-inf")

Scalar = Union[int, float]
PerRequest = Union[Scalar, Sequence[Scalar], np.ndarray]


@dataclasses.dataclass
class SamplingConfig:
    """ref tensorrt_llm/runtime/generation.py:120-139.

    Every sampling knob accepts either a scalar (applied to all rows) or a
    length-B sequence/array (per-request, ref GptManager per-entry configs).
    ``bad_words_list`` bans the last token of each word whenever the
    sequence ends with its prefix (ref kernels/banBadWords.cu);
    ``stop_words_list`` finishes a row when its sequence ends with any word
    (ref stop-criteria kernels).
    """
    end_id: int = 50256
    pad_id: int = 50256
    num_beams: int = 1
    temperature: PerRequest = 1.0
    top_k: PerRequest = 1
    top_p: PerRequest = 0.0
    length_penalty: float = 1.0
    repetition_penalty: PerRequest = 1.0
    presence_penalty: PerRequest = 0.0
    min_length: PerRequest = 0
    random_seed: int = 0
    bad_words_list: Optional[List[List[int]]] = None
    stop_words_list: Optional[List[List[int]]] = None

    def cache_key(self, batch_size: int):
        """Hashable trace signature: decode programs recompile only when
        this changes (shapes/staticness), not when values change."""
        def shp(x):
            return "v" if np.ndim(x) else "s"
        words = tuple(
            (None if w is None else tuple(len(x) for x in w))
            for w in (self.bad_words_list, self.stop_words_list))
        return (batch_size, self.num_beams, shp(self.temperature),
                shp(self.top_k), shp(self.top_p),
                shp(self.repetition_penalty), shp(self.presence_penalty),
                shp(self.min_length), int(_max_top_k(self.top_k)),
                bool(_all_greedy(self)), words)


def _max_top_k(top_k) -> int:
    """Static top-k working-set size, bucketed to powers of two so that
    changing k between calls almost never recompiles the decode program
    (the per-row kernel clips k to this bound)."""
    if np.ndim(top_k):
        raw = int(max(int(np.max(np.asarray(top_k))), 1))
    else:
        raw = max(int(top_k), 1)
    if raw <= 1:
        return 1
    b = 8
    while b < raw:
        b *= 2
    return b


def _all_greedy(sc: SamplingConfig) -> bool:
    """True when every row is provably greedy from host-side values."""
    t = np.asarray(sc.temperature, np.float32)
    k = np.asarray(sc.top_k, np.int32)
    p = np.asarray(sc.top_p, np.float32)
    return bool(np.all((t == 0.0) | ((k <= 1) & (p <= 0.0))))


def pack_words(words: Optional[List[List[int]]]):
    """[[ids...], ...] -> (padded [N, M] int32, lengths [N] int32)."""
    if not words:
        return None, None
    m = max(len(w) for w in words)
    arr = np.zeros((len(words), m), np.int32)
    lens = np.zeros((len(words),), np.int32)
    for i, w in enumerate(words):
        arr[i, :len(w)] = w
        lens[i] = len(w)
    return jnp.asarray(arr), jnp.asarray(lens)


def _row(x, b, dtype):
    """Broadcast a scalar-or-[B] host value to a [B] device array."""
    a = jnp.asarray(x, dtype)
    return jnp.broadcast_to(a.reshape(-1), (b,)) if a.ndim else jnp.full(
        (b,), a, dtype)


@dataclasses.dataclass(frozen=True)
class DecodeParams:
    """Device-side per-request sampling state (a jit-traced pytree; the
    static fields below are trace metadata)."""
    temperature: jnp.ndarray            # [B] f32
    top_k: jnp.ndarray                  # [B] i32
    top_p: jnp.ndarray                  # [B] f32
    repetition_penalty: jnp.ndarray     # [B] f32
    presence_penalty: jnp.ndarray       # [B] f32
    min_length: jnp.ndarray             # [B] i32
    end_id: jnp.ndarray                 # [B] i32
    bad_words: Optional[jnp.ndarray] = None        # [N, M] i32
    bad_word_lens: Optional[jnp.ndarray] = None    # [N] i32
    stop_words: Optional[jnp.ndarray] = None       # [S, M] i32
    stop_word_lens: Optional[jnp.ndarray] = None   # [S] i32
    max_top_k: int = 1                  # static
    greedy: bool = True                 # static: all rows provably greedy

    @classmethod
    def from_config(cls, sc: SamplingConfig, batch_size: int,
                    end_id=None) -> "DecodeParams":
        b = batch_size
        bw, bwl = pack_words(sc.bad_words_list)
        sw, swl = pack_words(sc.stop_words_list)
        return cls(
            temperature=_row(sc.temperature, b, jnp.float32),
            top_k=_row(sc.top_k, b, jnp.int32),
            top_p=_row(sc.top_p, b, jnp.float32),
            repetition_penalty=_row(sc.repetition_penalty, b, jnp.float32),
            presence_penalty=_row(sc.presence_penalty, b, jnp.float32),
            min_length=_row(sc.min_length, b, jnp.int32),
            end_id=_row(sc.end_id if end_id is None else end_id, b,
                        jnp.int32),
            bad_words=bw, bad_word_lens=bwl,
            stop_words=sw, stop_word_lens=swl,
            max_top_k=_max_top_k(sc.top_k),
            greedy=_all_greedy(sc))


jax.tree_util.register_dataclass(
    DecodeParams,
    data_fields=["temperature", "top_k", "top_p", "repetition_penalty",
                 "presence_penalty", "min_length", "end_id", "bad_words",
                 "bad_word_lens", "stop_words", "stop_word_lens"],
    meta_fields=["max_top_k", "greedy"])


# ---------------------------------------------------------------------------
# penalty / filter kernels (scalar python values OR [B] traced arrays)
# ---------------------------------------------------------------------------

def _col(x):
    """[B] -> [B,1] for broadcasting over the vocab axis."""
    x = jnp.asarray(x)
    return x.reshape(-1, 1) if x.ndim == 1 else x


def apply_repetition_penalty(logits, token_counts, penalty):
    """CTRL-style: seen tokens' logits divided (positive) / multiplied
    (negative) by the penalty (ref samplingPenaltyKernels.cu semantics).
    token_counts: [B, V] int32 occurrence counts."""
    if isinstance(penalty, (int, float)) and penalty == 1.0:
        return logits
    p = _col(jnp.asarray(penalty, jnp.float32))
    seen = token_counts > 0
    scaled = jnp.where(logits > 0, logits / p, logits * p)
    return jnp.where(seen, scaled, logits)


def apply_presence_penalty(logits, token_counts, penalty):
    if isinstance(penalty, (int, float)) and penalty == 0.0:
        return logits
    p = _col(jnp.asarray(penalty, jnp.float32))
    return logits - p * (token_counts > 0).astype(logits.dtype)


def apply_min_length(logits, cur_lengths, min_length, end_id):
    """Suppress EOS until min_length tokens were generated
    (ref min-length penalty kernel)."""
    if isinstance(min_length, int) and min_length <= 0:
        return logits
    too_short = _col(cur_lengths < jnp.asarray(min_length, jnp.int32))
    v = logits.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, v), 1)
    eos = col == _col(jnp.asarray(end_id, jnp.int32))
    return jnp.where(jnp.logical_and(too_short, eos), NEG_INF, logits)


def apply_top_k(logits, k, max_k: Optional[int] = None):
    """Mask everything below the k-th logit (ref samplingTopKKernels.cu).

    ``k`` scalar int: fixed k for all rows.  ``k`` [B] array: per-row k
    (rows with k <= 0 are left unfiltered); ``max_k`` must then be a static
    python int >= max(k)."""
    if isinstance(k, int):
        if k <= 0:
            return logits
        kth = jax.lax.top_k(logits, min(k, logits.shape[-1]))[0][..., -1:]
        return jnp.where(logits < kth, NEG_INF, logits)
    k = jnp.asarray(k, jnp.int32)
    assert max_k is not None, "per-row top_k needs static max_k"
    max_k = min(max_k, logits.shape[-1])   # tiny-vocab models
    vals = jax.lax.top_k(logits, max_k)[0]                # [B, max_k]
    idx = jnp.clip(k, 1, max_k) - 1
    kth = jnp.take_along_axis(vals, idx[:, None], axis=-1)
    enabled = _col(k > 0)
    return jnp.where(jnp.logical_and(enabled, logits < kth), NEG_INF,
                     logits)


def apply_top_p(logits, p):
    """Nucleus: keep the smallest prefix of the sorted distribution with
    cumulative probability >= p (ref samplingTopPKernels.cu).  ``p`` scalar
    or per-row [B] (rows with p <= 0 or >= 1 unfiltered)."""
    if isinstance(p, (int, float)) and (p <= 0.0 or p >= 1.0):
        return logits
    pa = _col(jnp.asarray(p, jnp.float32))
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens while the cumulative mass *before* them is < p
    keep_sorted = (cum - probs) < pa
    kth_idx = jnp.sum(keep_sorted.astype(jnp.int32), axis=-1,
                      keepdims=True) - 1
    threshold = jnp.take_along_axis(sorted_logits,
                                    jnp.maximum(kth_idx, 0), axis=-1)
    enabled = jnp.logical_and(pa > 0.0, pa < 1.0)
    return jnp.where(jnp.logical_and(enabled, logits < threshold), NEG_INF,
                     logits)


def ban_bad_words(logits, tokens, cur, words, word_lens):
    """Ban the final token of every bad word whose prefix matches the tail
    of the sequence (ref kernels/banBadWords.cu).

    tokens: [B, T] full sequence buffer (prompt + generated), valid up to
    position ``cur`` (exclusive — the next token will land at ``cur``).
    ``cur`` may be a scalar or per-row [B] (continuous batching).
    words: [N, M] int32 padded (shared across rows) or [B, N, M]
    (per-request lists); word_lens [N] or [B, N] to match.  A length-1
    word is always banned; length-0 rows are inert padding."""
    if words is None:
        return logits
    b, v = logits.shape
    if words.ndim == 2:
        words_b = jnp.broadcast_to(words[None], (b,) + words.shape)
        lens_b = jnp.broadcast_to(word_lens[None], (b,) + word_lens.shape)
    else:
        words_b, lens_b = words, word_lens                 # [B,N,M], [B,N]
    n, m = words_b.shape[1:]
    t = tokens.shape[1]
    mm1 = max(m - 1, 1)
    j = jnp.arange(mm1)[None, None, :]                     # [1,1,M-1]
    cur3 = jnp.reshape(jnp.asarray(cur, jnp.int32), (-1, 1, 1))
    lens3 = lens_b[..., None]                              # [B,N,1]
    # prefix of word i occupies sequence positions cur-(L-1) .. cur-1
    idx = cur3 - (lens3 - 1) + j                           # [B,N,M-1]
    fits = jnp.logical_and((cur3 - (lens3 - 1))[..., 0] >= 0,
                           lens_b > 0)                     # [B,N]
    hist = jnp.take_along_axis(
        jnp.broadcast_to(tokens[:, None, :], (b, n, t)),
        jnp.clip(idx, 0, t - 1), axis=2)                   # [B,N,M-1]
    pad = j >= (lens3 - 1)
    match = jnp.all(jnp.logical_or(hist == words_b[..., :mm1], pad),
                    axis=-1)                               # [B,N]
    match = jnp.logical_and(match, fits)
    ban_tok = jnp.take_along_axis(
        words_b, jnp.maximum(lens3 - 1, 0), axis=2)[..., 0]  # [B,N]
    banned = jnp.zeros((b, v), jnp.bool_).at[
        jnp.arange(b)[:, None], ban_tok].max(match)
    return jnp.where(banned, NEG_INF, logits)


def match_stop_words(tokens, cur, words, word_lens):
    """[B] bool: sequence (valid through position ``cur`` inclusive) ends
    with any stop word (ref stop-criteria kernels).

    words: [N, M] shared across rows, or [B, N, M] per-request tables
    (continuous batching); word_lens [N] or [B, N] to match; ``cur``
    scalar or per-row [B].  Zero-length rows are inert padding."""
    if words is None:
        return jnp.zeros((tokens.shape[0],), jnp.bool_)
    b, t = tokens.shape
    if words.ndim == 2:
        n, m = words.shape
        j = jnp.arange(m)[None, :]
        idx = cur - word_lens[:, None] + 1 + j             # [N, M]
        fits = jnp.logical_and((cur - word_lens + 1) >= 0, word_lens > 0)
        hist = tokens[:, jnp.clip(idx, 0, t - 1)]          # [B, N, M]
        pad = j >= word_lens[:, None]
        match = jnp.all(jnp.logical_or(hist == words[None], pad[None]),
                        axis=-1)
        match = jnp.logical_and(match, fits[None, :])
        return jnp.any(match, axis=-1)
    n, m = words.shape[1:]
    j = jnp.arange(m)[None, None, :]                       # [1, 1, M]
    cur3 = jnp.reshape(jnp.asarray(cur, jnp.int32), (-1, 1, 1))
    lens3 = word_lens[..., None]                           # [B, N, 1]
    idx = cur3 - lens3 + 1 + j                             # [B, N, M]
    fits = jnp.logical_and((cur3 - lens3 + 1)[..., 0] >= 0,
                           word_lens > 0)                  # [B, N]
    hist = jnp.take_along_axis(
        jnp.broadcast_to(tokens[:, None, :], (b, n, t)),
        jnp.clip(idx, 0, t - 1), axis=2)                   # [B, N, M]
    pad = j >= lens3
    match = jnp.all(jnp.logical_or(hist == words, pad), axis=-1)
    return jnp.any(jnp.logical_and(match, fits), axis=-1)


# ---------------------------------------------------------------------------
# one fused decode step (the DynamicDecodeLayer equivalent)
# ---------------------------------------------------------------------------

def dynamic_decode(logits, rng, p: DecodeParams, token_counts=None,
                   cur_lengths=None, tokens=None, cur=None):
    """One sampling step on [B, V] fp32 logits with per-request params.

    Mirrors DynamicDecodeLayer::forward (dynamicDecodeLayer.cpp:154):
    penalties -> min-length -> bad-words ban -> top-k/top-p or greedy.
    Returns ([B] int32 tokens, [B] f32 logprobs of the chosen tokens).
    Rows where (temperature == 0) or (top_k <= 1 and top_p <= 0) are
    greedy; others sample.  Pure function; jit/scan-safe."""
    logits = logits.astype(jnp.float32)
    if token_counts is not None:
        logits = apply_repetition_penalty(logits, token_counts,
                                          p.repetition_penalty)
        logits = apply_presence_penalty(logits, token_counts,
                                        p.presence_penalty)
    if cur_lengths is not None:
        logits = apply_min_length(logits, cur_lengths, p.min_length,
                                  p.end_id)
    if tokens is not None and p.bad_words is not None:
        logits = ban_bad_words(logits, tokens, cur, p.bad_words,
                               p.bad_word_lens)
    b = logits.shape[0]
    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if p.greedy:
        tok = greedy_tok
    else:
        temp = jnp.maximum(_col(p.temperature), 1e-6)
        scaled = logits / temp
        scaled = apply_top_k(scaled, p.top_k, p.max_top_k)
        scaled = apply_top_p(scaled, p.top_p)
        sampled = jax.random.categorical(rng, scaled).astype(jnp.int32)
        greedy_row = jnp.logical_or(
            p.temperature <= 0.0,
            jnp.logical_and(p.top_k <= 1, p.top_p <= 0.0))
        tok = jnp.where(greedy_row, greedy_tok, sampled)
    lp = jax.nn.log_softmax(logits, axis=-1)[jnp.arange(b), tok]
    return tok, lp


def sample_step(logits, rng, config: SamplingConfig, token_counts=None,
                cur_lengths=None):
    """Legacy scalar-config entry point (kept for API stability)."""
    p = DecodeParams.from_config(config, logits.shape[0])
    return dynamic_decode(logits, rng, p, token_counts, cur_lengths)


# ---------------------------------------------------------------------------
# beam search
# ---------------------------------------------------------------------------

def beam_search_step(logprobs, cum_log_probs, finished, num_beams: int,
                     end_id: int, length_penalty: float = 1.0,
                     cur_len=None):
    """One beam-search expansion (ref onlineBeamSearchLayer.cu semantics).

    logprobs: [B, beam, V] log-softmax; cum_log_probs [B, beam];
    finished [B, beam] bool.
    Returns (parent [B, beam] int32, token [B, beam] int32,
             new_cum [B, beam], new_finished [B, beam]).
    Finished beams propagate a single EOS continuation with frozen score.
    With ``length_penalty != 1`` and ``cur_len`` (generated length *before*
    this expansion), candidates are *ranked* by the GNMT-normalised score
    cum/((5+len)/6)^a during the search — the reference's online beam
    search scores finished candidates with the penalty as they are
    produced — while the carried cum_log_probs stay raw."""
    b, k, v = logprobs.shape
    # finished beams: only EOS continuation, score unchanged.  ``end_id``
    # may be a python int (offline sessions) or a per-slot [B] array
    # (serving: every request carries its own end id)
    end = jnp.asarray(end_id, jnp.int32)
    end3 = end.reshape(-1, 1, 1) if end.ndim else end
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, v), 2)
    frozen = jnp.where(col == end3, 0.0, NEG_INF)
    step_scores = jnp.where(finished[..., None], frozen, logprobs)
    total = cum_log_probs[..., None] + step_scores            # [B, beam, V]
    flat = total.reshape(b, k * v)
    if length_penalty != 1.0 and cur_len is not None:
        new_len = jnp.asarray(cur_len, jnp.float32) + 1.0
        penalty = ((5.0 + new_len) / 6.0) ** length_penalty
        rank = flat / jnp.maximum(penalty, 1e-9)
        _, top_idx = jax.lax.top_k(rank, k)
        top_scores = jnp.take_along_axis(flat, top_idx, axis=-1)
    else:
        top_scores, top_idx = jax.lax.top_k(flat, k)          # [B, beam]
    parent = (top_idx // v).astype(jnp.int32)
    token = (top_idx % v).astype(jnp.int32)
    end2 = end.reshape(-1, 1) if end.ndim else end
    new_finished = jnp.take_along_axis(finished, parent, axis=1) | (
        token == end2)
    return parent, token, top_scores, new_finished


def gather_beams(tree, parent):
    """Reorder any [B, beam, ...] pytree along the beam axis by parent
    indices — the TPU replacement for the reference's cache_indirection
    pointer trick plus final gather_tree (decodingKernels.cu): by
    reordering carried state every step, the final beams are already
    contiguous."""
    def _g(x):
        idx = parent
        while idx.ndim < x.ndim:
            idx = idx[..., None]
        return jnp.take_along_axis(x, jnp.broadcast_to(
            idx, idx.shape[:2] + x.shape[2:]), axis=1)
    return jax.tree.map(_g, tree)


def update_indirection(indirection, parent, cur):
    """Advance a beam cache-indirection table one step (the reference's
    cache_indirection, ref T/functional.py:2738 plugin args + gptSession
    ping-pong buffers): ``indirection [B, beam, S]`` maps (beam, position)
    -> physical cache row.  After choosing ``parent`` [B, beam], beam k's
    history (< cur) is its parent's history, and position ``cur`` (about to
    be written by the model step) is beam k's own physical row.  ``cur``
    may be a scalar (offline: all rows in lockstep) or a per-slot [B]
    array (serving: every slot is at its own length)."""
    b, k, s = indirection.shape
    hist = jnp.take_along_axis(indirection, parent[..., None], axis=1)
    own = jnp.broadcast_to(jnp.arange(k, dtype=indirection.dtype)[None, :, None],
                           (b, k, 1))
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s), 2)
    cur = jnp.asarray(cur, jnp.int32)
    cur3 = cur.reshape(-1, 1, 1) if cur.ndim else cur
    return jnp.where(pos == cur3, own, hist)


def finalize_beams(tokens, cum_log_probs, lengths, length_penalty: float = 1.0):
    """Pick the best beam per batch row with GNMT length penalty
    (ref MaximumLikelihoodRanker / gatherTree finalisation)."""
    penalty = ((5.0 + lengths.astype(jnp.float32)) / 6.0) ** length_penalty
    scores = cum_log_probs / jnp.maximum(penalty, 1e-9)
    best = jnp.argmax(scores, axis=1)
    b = tokens.shape[0]
    return tokens[jnp.arange(b), best], best
