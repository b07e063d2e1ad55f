"""Sampling / decoding kernels.

TPU-native counterpart of the reference's C++/CUDA sampling stack:
DynamicDecodeLayer (``cpp/tensorrt_llm/layers/dynamicDecodeLayer.cpp:154``)
dispatching to topK/topP kernels (samplingTopKKernels.cu, ~1300 LoC topP),
penalty kernels (samplingPenaltyKernels.cu) and online beam search — all
expressed here as jnp ops that XLA fuses into the decode step, so sampling
lives *inside* the generation loop on device instead of being a separate
enqueue per step.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


@dataclasses.dataclass
class SamplingConfig:
    """ref tensorrt_llm/runtime/generation.py:120-139."""
    end_id: int = 50256
    pad_id: int = 50256
    num_beams: int = 1
    temperature: float = 1.0
    top_k: int = 1
    top_p: float = 0.0
    length_penalty: float = 1.0
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    min_length: int = 0
    random_seed: int = 0


def apply_repetition_penalty(logits, token_counts, penalty: float):
    """CTRL-style: seen tokens' logits divided (positive) / multiplied
    (negative) by the penalty (ref samplingPenaltyKernels.cu semantics).
    token_counts: [B, V] int32 occurrence counts."""
    if penalty == 1.0:
        return logits
    seen = token_counts > 0
    scaled = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, scaled, logits)


def apply_presence_penalty(logits, token_counts, penalty: float):
    if penalty == 0.0:
        return logits
    return logits - penalty * (token_counts > 0).astype(logits.dtype)


def apply_min_length(logits, cur_lengths, min_length: int, end_id: int):
    """Suppress EOS until min_length tokens were generated
    (ref banRepeatNGram / min-length penalty kernel)."""
    if min_length <= 0:
        return logits
    too_short = (cur_lengths < min_length)[:, None]
    v = logits.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, v), 1)
    return jnp.where(jnp.logical_and(too_short, col == end_id), NEG_INF,
                     logits)


def apply_top_k(logits, k: int):
    """Mask everything below the k-th logit (ref samplingTopKKernels.cu)."""
    if k <= 0:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits, p: float):
    """Nucleus: keep the smallest prefix of the sorted distribution with
    cumulative probability >= p (ref samplingTopPKernels.cu)."""
    if p <= 0.0 or p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens while the cumulative mass *before* them is < p
    keep_sorted = (cum - probs) < p
    kth_idx = jnp.sum(keep_sorted.astype(jnp.int32), axis=-1,
                      keepdims=True) - 1
    threshold = jnp.take_along_axis(sorted_logits, kth_idx, axis=-1)
    return jnp.where(logits < threshold, NEG_INF, logits)


def sample_step(logits, rng, config: SamplingConfig, token_counts=None,
                cur_lengths=None):
    """One sampling step on [B, V] fp32 logits -> ([B] int32 tokens,
    [B] fp32 logprobs).  Pure function; jit/scan-safe."""
    logits = logits.astype(jnp.float32)
    if token_counts is not None:
        logits = apply_repetition_penalty(logits, token_counts,
                                          config.repetition_penalty)
        logits = apply_presence_penalty(logits, token_counts,
                                        config.presence_penalty)
    if cur_lengths is not None:
        logits = apply_min_length(logits, cur_lengths, config.min_length,
                                  config.end_id)
    greedy = (config.top_k in (0, 1) and config.top_p == 0.0
              and config.temperature in (0.0, 1.0)) or config.temperature == 0.0
    if greedy and config.top_k <= 1 and config.top_p == 0.0:
        tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
    else:
        scaled = logits / jnp.maximum(config.temperature, 1e-6)
        scaled = apply_top_k(scaled, config.top_k)
        scaled = apply_top_p(scaled, config.top_p)
        tokens = jax.random.categorical(rng, scaled).astype(jnp.int32)
        logprobs = jax.nn.log_softmax(scaled, axis=-1)
    b = logits.shape[0]
    lp = logprobs[jnp.arange(b), tokens]
    return tokens, lp


def beam_search_step(logprobs, cum_log_probs, finished, num_beams: int,
                     end_id: int, length_penalty: float = 1.0,
                     cur_len=None):
    """One beam-search expansion (ref onlineBeamSearchLayer.cu semantics).

    logprobs: [B, beam, V] log-softmax; cum_log_probs [B, beam];
    finished [B, beam] bool.
    Returns (parent [B, beam] int32, token [B, beam] int32,
             new_cum [B, beam], new_finished [B, beam]).
    Finished beams propagate a single EOS continuation with frozen score.
    """
    b, k, v = logprobs.shape
    # finished beams: only EOS continuation, score unchanged
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, v), 2)
    frozen = jnp.where(col == end_id, 0.0, NEG_INF)
    step_scores = jnp.where(finished[..., None], frozen, logprobs)
    total = cum_log_probs[..., None] + step_scores            # [B, beam, V]
    flat = total.reshape(b, k * v)
    top_scores, top_idx = jax.lax.top_k(flat, k)              # [B, beam]
    parent = (top_idx // v).astype(jnp.int32)
    token = (top_idx % v).astype(jnp.int32)
    new_finished = jnp.take_along_axis(finished, parent, axis=1) | (
        token == end_id)
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


def finalize_beams(tokens, cum_log_probs, lengths, length_penalty: float = 1.0):
    """Pick the best beam per batch row with GNMT length penalty
    (ref MaximumLikelihoodRanker / gatherTree finalisation)."""
    penalty = ((5.0 + lengths.astype(jnp.float32)) / 6.0) ** length_penalty
    scores = cum_log_probs / jnp.maximum(penalty, 1e-9)
    best = jnp.argmax(scores, axis=1)
    b = tokens.shape[0]
    return tokens[jnp.arange(b), best], best
