"""Attention compute ops.

TPU-native replacements for the reference's attention stack:

* explicit-math path  -> :func:`multihead_attention`
  (ref ``tensorrt_llm/layers/attention.py:363-398``: fp32 QK^T, /sqrt(d),
  additive bias, fp32 softmax)
* GPTAttention plugin generation phase (in-place KV append + masked MHA,
  ``cpp/.../gptAttentionCommon.cpp:650 enqueueGeneration`` and the
  decoderMaskedMultiheadAttention CUDA kernels)
  -> :func:`append_kv` + :func:`cached_decode_attention` over a
  preallocated [B, 2, H, S_max, D] cache updated with
  ``lax.dynamic_update_slice`` (donated under jit, so truly in place), with
  optional int8 KV quant/dequant (ref attention.py:283-290,338-348).

These are XLA formulations; profiling on v5e shows the attention reads
fused at 70-86% of HBM bandwidth, so no hand-written Pallas decode kernel
is needed (the Pallas flash kernel in .flash_attention covers the context
phase, where score materialisation would otherwise dominate).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..functional import round_half_away


def quantize_cache_values(kv, cache_dtype, kv_orig_quant_scale):
    """Cast fresh K/V values into the cache dtype: int8 (round-half-away,
    ref quantize_tensor) or fp8 e4m3 (IEEE-saturating cast, ref fp8 KV mode
    FP8_KV_CACHE); float dtypes pass through."""
    if cache_dtype == jnp.int8:
        assert kv_orig_quant_scale is not None
        scaled = kv.astype(jnp.float32) * kv_orig_quant_scale
        return jnp.clip(round_half_away(scaled), -128, 127).astype(jnp.int8)
    if cache_dtype == jnp.float8_e4m3fn:
        assert kv_orig_quant_scale is not None
        scaled = kv.astype(jnp.float32) * kv_orig_quant_scale
        return scaled.astype(jnp.float8_e4m3fn)
    return kv.astype(cache_dtype)


def dequantize_cache_values(x, kv_quant_orig_scale, out_dtype):
    """Inverse of quantize_cache_values for int8/fp8 caches."""
    if x.dtype in (jnp.int8, jnp.float8_e4m3fn):
        assert kv_quant_orig_scale is not None
        return (x.astype(jnp.float32) * kv_quant_orig_scale).astype(out_dtype)
    return x.astype(out_dtype)


def length_mask_bias(lengths, max_len: int, dtype=jnp.float32):
    """Additive bias [B, 1, 1, max_len]: 0 for positions < length, -inf after.

    Replaces the reference's masked_tokens / padding-mask tensors."""
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, max_len), 3)
    return jnp.where(pos < lengths[:, None, None, None], 0.0,
                     -jnp.inf).astype(dtype)


def multihead_attention(q, k, v, bias=None, scale: Optional[float] = None,
                        fp32_softmax: bool = True):
    """q [B,H,Lq,D], k/v [B,H,Lk,D] -> [B,H,Lq,D].

    Matches the reference explicit path numerics: scores and softmax in
    float32 (``with precision('float32')``, attention.py:386-398), then the
    probs are cast back to the value dtype for the PV matmul (the reference
    leaves the TRT cast to the engine; we cast explicitly so the MXU runs
    bf16xbf16->fp32)."""
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    acc_t = jnp.float32
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=acc_t) * jnp.asarray(scale, acc_t)
    if bias is not None:
        scores = scores + bias.astype(acc_t)
    if fp32_softmax:
        probs = jax.nn.softmax(scores, axis=-1)
    else:
        probs = jax.nn.softmax(scores.astype(q.dtype).astype(acc_t), axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=acc_t)
    return ctx.astype(q.dtype)


def append_kv(cache, k_new, v_new, write_index,
              kv_orig_quant_scale=None) -> jnp.ndarray:
    """Write new K/V into a preallocated cache at ``write_index`` (in place
    under jit via donation).

    cache: [B, 2, H, D, S_max] (fp16/bf16, or int8 when quantised).
    LAYOUT: the sequence axis is LAST.  With head_dim=64 as the minor axis
    a bf16 (16,128) tile is half empty, so every cache read ran at ~25-38%
    of HBM bandwidth; seq-minor puts full 128-lane rows under the decode
    matvecs (measured ~1.7x faster reads on v5e).
    k_new/v_new: [B, H, L_new, D]
    write_index: scalar int32 — current sequence length before the write.

    int8 mode (ref attention.py:338-348 quantize_tensor): x*scale, round
    half-away-from-zero, clip to [-128,127], cast int8.
    """
    kv = jnp.stack([k_new, v_new], axis=1).transpose(0, 1, 2, 4, 3)
    kv = quantize_cache_values(kv, cache.dtype, kv_orig_quant_scale)
    if getattr(write_index, "ndim", 0) >= 1:
        # per-row write positions (continuous batching: every slot is at its
        # own length — the reference's in-flight-batching host pointer
        # tables become a vmapped dynamic_update_slice)
        return jax.vmap(
            lambda c, u, i: jax.lax.dynamic_update_slice(c, u, (0, 0, 0, i))
        )(cache, kv, write_index.astype(jnp.int32))
    return jax.lax.dynamic_update_slice(
        cache, kv, (0, 0, 0, 0, write_index))


def append_kv_stacked(full_cache, k_new, v_new, layer_idx, write_index,
                      kv_orig_quant_scale=None) -> jnp.ndarray:
    """Write one layer's fresh K/V into the FULL stacked cache
    [n_layer, B, 2, H, D, S_max] at (layer_idx, ..., write_index)
    (seq-minor layout — see append_kv).

    This is the bandwidth-shaped alternative to slicing a per-layer cache
    out of the stack, updating it, and re-stacking (what a scan with the
    cache as xs/ys does): profiling the large-v2 decode step showed that
    pattern costs ~4 copies of the 2.3 MB layer cache per layer per step
    (~0.8 ms/step of pure copies).  Here the write is just the new token's
    K/V (a few KB in decode) into the carried buffer — XLA keeps the
    carry in place, so nothing else moves."""
    kv = jnp.stack([k_new, v_new], axis=1).transpose(0, 1, 2, 4, 3)[None]
    kv = quantize_cache_values(kv, full_cache.dtype, kv_orig_quant_scale)
    layer_idx = jnp.asarray(layer_idx, jnp.int32)
    if getattr(write_index, "ndim", 0) >= 1:
        # per-row positions (continuous batching): vmap over batch
        def upd(cache_b, kv_b, i):
            # cache_b [L,2,H,D,S]; kv_b [2,H,D,L_new]
            return jax.lax.dynamic_update_slice(
                cache_b, kv_b[None], (layer_idx, 0, 0, 0, i))
        return jax.vmap(upd, in_axes=(1, 0, 0), out_axes=1)(
            full_cache, kv[0], write_index.astype(jnp.int32))
    return jax.lax.dynamic_update_slice(
        full_cache, kv, (layer_idx, 0, 0, 0, 0, write_index))


def cast_kv_for_cache(k, v, cache_dtype, kv_orig_quant_scale=None):
    """Cast/quantize fresh K/V [B,H,L,D] exactly as a cache write would
    and transpose to the cache's seq-minor layout [B,H,D,L] (used by the
    deferred-write path so numerics match write-then-read)."""
    k = k.transpose(0, 1, 3, 2)
    v = v.transpose(0, 1, 3, 2)
    return (quantize_cache_values(k, cache_dtype, kv_orig_quant_scale),
            quantize_cache_values(v, cache_dtype, kv_orig_quant_scale))


def write_fresh_kv(full_cache, kv_new, write_index) -> jnp.ndarray:
    """One batched store of every layer's fresh K/V (deferred-write mode).

    full_cache [L,B,2,H,D,S]; kv_new [L,B,2,H,D,L_new] already in cache
    dtype (seq-minor); write_index scalar or per-row [B]."""
    if getattr(write_index, "ndim", 0) >= 1:
        def upd(cache_b, kv_b, i):      # [L,2,H,D,S], [L,2,H,D,L_new]
            return jax.lax.dynamic_update_slice(cache_b, kv_b, (0, 0, 0, 0, i))
        return jax.vmap(upd, in_axes=(1, 1, 0), out_axes=1)(
            full_cache, kv_new, write_index.astype(jnp.int32))
    return jax.lax.dynamic_update_slice(
        full_cache, kv_new, (0, 0, 0, 0, 0, write_index))


def new_tail_kv(full_cache, kmax: int) -> jnp.ndarray:
    """Allocate the K-step deferred tail buffer for a stacked cache
    [L,B,2,H,D,S]: shape [Kmax, L, B, 2, H, D], TAIL-MAJOR so the per-step
    append is one contiguous slab write (the seq-minor cache layout would
    make it a strided one-column store — the exact cost this buffer
    exists to amortise)."""
    L, B, two, H, D, _ = full_cache.shape
    return jnp.zeros((kmax, L, B, two, H, D), full_cache.dtype)


def write_tail_kv(tail, kv_new, tail_len) -> jnp.ndarray:
    """Append this step's all-layer fresh K/V to the tail at column
    ``tail_len``: kv_new [L,B,2,H,D] (cache dtype), tail [Kmax,L,B,2,H,D].
    A contiguous [1,L,B,2,H,D] slab write — ~free vs the strided cache
    store."""
    return jax.lax.dynamic_update_slice(
        tail, kv_new[None], (jnp.asarray(tail_len, jnp.int32), 0, 0, 0, 0, 0))


def merge_tail_kv(full_cache, tail, cache_len) -> jnp.ndarray:
    """Flush the FULL tail into the big cache at sequence position
    ``cache_len`` (strided seq-minor store of Kmax columns — paid once per
    Kmax steps instead of every step).  tail [Kmax,L,B,2,H,D] -> transposed
    to the cache's [L,B,2,H,D,Kmax] block."""
    block = jnp.transpose(tail, (1, 2, 3, 4, 5, 0))
    return jax.lax.dynamic_update_slice(
        full_cache, block,
        (0, 0, 0, 0, 0, jnp.asarray(cache_len, jnp.int32)))


def layer_tail_views(tail, layer_idx) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slice one layer's tail K and V [Kmax,B,H,D] out of [Kmax,L,B,2,H,D]
    (cf. layer_kv_views: two separate slices so each fuses into its
    einsum)."""
    l = jnp.asarray(layer_idx, jnp.int32)
    zero = jnp.zeros((), jnp.int32)
    kmax, n_layer, b, _, h, d = tail.shape
    k = jax.lax.dynamic_slice(tail, (zero, l, zero, zero, zero, zero),
                              (kmax, 1, b, 1, h, d))[:, 0, :, 0]
    v = jax.lax.dynamic_slice(
        tail, (zero, l, zero, jnp.ones((), jnp.int32), zero, zero),
        (kmax, 1, b, 1, h, d))[:, 0, :, 0]
    return k, v


def layer_kv_views(full_cache, layer_idx) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slice one layer's K and V [B,H,D,S] (seq-minor) out of the stacked
    cache as two separate dynamic-slices.  Each feeds exactly one einsum,
    so XLA fuses the slice into the matmul read instead of materialising
    the full [B,2,H,D,S] layer view (profiling showed the fused view costs
    ~0.5 ms/step on large-v2)."""
    l = jnp.asarray(layer_idx, jnp.int32)
    zero = jnp.zeros((), jnp.int32)
    n_layer, b, _, h, d, s = full_cache.shape
    k = jax.lax.dynamic_slice(full_cache, (l, zero, zero, zero, zero, zero),
                              (1, b, 1, h, d, s))[0, :, 0]
    v = jax.lax.dynamic_slice(
        full_cache, (l, zero, jnp.ones((), jnp.int32), zero, zero, zero),
        (1, b, 1, h, d, s))[0, :, 0]
    return k, v


def cached_decode_attention(q, cache, seq_len, scale: Optional[float] = None,
                            kv_quant_orig_scale=None,
                            causal_offset: Optional[jnp.ndarray] = None,
                            start_index=None, bias=None, fresh_kv=None,
                            tail_kv=None, group: int = 1):
    """Masked attention of q [B,H,Lq,D] against a full-size seq-minor cache
    [B,2,H,D,S_max], attending only to positions < seq_len (+ query offset
    for Lq>1 causal prefill).

    ``fresh_kv``: optional (k_new, v_new) [B,H,Lq,D] for the *current*
    tokens when their write into the cache is deferred (all layers' writes
    are batched into one update after the layer scan — each in-loop
    one-token dynamic-update-slice costs ~1 us of launch overhead on TPU,
    ~0.6 ms/step over 2x32 layers).  The cache is then treated as holding
    only the first seq_len - Lq positions and the fresh tokens contribute
    their own score/value columns.  Requires bias=None (an ALiBi column
    for the fresh position would need per-row bias plumbing).

    ``tail_kv``: optional (k_t, v_t, tail_len) — the K-step deferred tail
    (see write_tail_kv): k_t/v_t [Kmax, B, H, D] TAIL-MAJOR in cache dtype
    hold the last ``tail_len`` tokens' K/V, not yet merged into the big
    cache; ``tail_len`` scalar int32.  Amortises the strided one-column
    cache store (~0.3 ms/step at ~0% bw on large-v2) over Kmax steps: the
    per-step store becomes a contiguous slab write into the small tail and
    the strided merge happens once per Kmax steps.

    ``seq_len`` is the total valid length *after* the current tokens were
    appended.  For Lq == 1 (generation step) this reduces to the reference's
    masked-MHA kernel semantics; for Lq > 1 with ``causal_offset`` it covers
    the context/prefill phase.

    int8 KV is dequantised on the fly (ref attention.py:283-290).

    MQA/GQA: a cache with fewer KV heads than the query is consumed
    WITHOUT a materialised head repeat.  MQA (1 KV head) rides the
    einsums' size-1 broadcast; GQA (1 < Hkv < H) folds the query head
    groups onto the q-length axis (``group`` is the internal recursion
    marker) — the grouped rows of one KV head share a single decode
    token, so masks index positions by ``row % true_lq``.  ALiBi is
    per-QUERY-head and is rejected with GQA.
    """
    b, h, lq, d = q.shape
    if isinstance(cache, tuple):
        k, v = cache        # pre-sliced seq-minor views (layer_kv_views)
    else:
        k, v = cache[:, 0], cache[:, 1]    # [B,H,D,S]
    if group == 1 and k.shape[1] not in (h, 1):
        g = h // k.shape[1]
        assert g * k.shape[1] == h, (h, k.shape)
        assert bias is None, "per-head bias (ALiBi) unsupported with GQA"
        out = cached_decode_attention(
            q.reshape(b, k.shape[1], g * lq, d), (k, v), seq_len,
            scale=scale, kv_quant_orig_scale=kv_quant_orig_scale,
            causal_offset=causal_offset, start_index=start_index,
            bias=None, fresh_kv=fresh_kv, tail_kv=tail_kv, group=g)
        return out.reshape(b, h, lq, d)
    lq_t = lq // group      # true token count (== lq unless grouped)
    s_max = k.shape[3]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    if k.dtype in (jnp.int8, jnp.float8_e4m3fn):
        k = dequantize_cache_values(k, kv_quant_orig_scale, q.dtype)
        v = dequantize_cache_values(v, kv_quant_orig_scale, q.dtype)
    acc_t = jnp.float32
    scores = jnp.einsum("bhqd,bhds->bhqs", q, k,
                        preferred_element_type=acc_t) * jnp.asarray(scale, acc_t)
    if bias is not None:                    # e.g. ALiBi [1,H,1,s_max]
        assert fresh_kv is None, "deferred write not supported with bias"
        scores = scores + bias.astype(acc_t)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, s_max), 3)
    cache_len = jnp.reshape(seq_len, (-1, 1, 1, 1)).astype(jnp.int32)
    if fresh_kv is not None:
        cache_len = cache_len - lq_t        # current tokens not in cache yet
    if tail_kv is not None:
        cache_len = cache_len - tail_kv[2]  # tail tokens not in cache either
    valid = kpos < cache_len
    if start_index is not None:
        # left-padded prompts: positions before start are invalid
        valid = jnp.logical_and(
            valid, kpos >= jnp.reshape(start_index, (-1, 1, 1, 1)))
    if lq_t > 1 and causal_offset is not None:
        # causal within the freshly appended block: query row i may attend
        # keys <= causal_offset + i (None => bidirectional prefill, e.g. GLM);
        # grouped rows (GQA) share a token per ``row % lq_t``
        qpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lq, 1), 2) % lq_t
        offset = jnp.reshape(causal_offset, (-1, 1, 1, 1)).astype(jnp.int32)
        valid = jnp.logical_and(valid, kpos <= qpos + offset)
    # finite mask value: a fully-masked row (e.g. a left-pad query position)
    # must yield finite (garbage) probs, not NaN, or it would poison the
    # KV cache it writes at the next layer
    scores = jnp.where(valid, scores, jnp.asarray(-1e30, scores.dtype))
    if fresh_kv is not None:
        k_f, v_f = fresh_kv                 # [B,H,D,Lq] seq-minor, cache dtype
        k_f = dequantize_cache_values(k_f, kv_quant_orig_scale, q.dtype)
        v_f = dequantize_cache_values(v_f, kv_quant_orig_scale, q.dtype)
        s_f = jnp.einsum("bhqd,bhds->bhqs", q, k_f,
                         preferred_element_type=acc_t) * jnp.asarray(scale, acc_t)
        if lq_t > 1:
            # causal among the fresh tokens themselves
            qpos = jax.lax.broadcasted_iota(jnp.int32,
                                            (1, 1, lq, 1), 2) % lq_t
            fpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, lq_t), 3)
            s_f = jnp.where(fpos <= qpos, s_f,
                            jnp.asarray(-1e30, s_f.dtype))
        if tail_kv is None:
            all_scores = jnp.concatenate([scores, s_f], axis=-1)
            probs = jax.nn.softmax(all_scores, axis=-1)
            p_c, p_f = probs[..., :s_max], probs[..., s_max:]
            ctx = jnp.einsum("bhqs,bhds->bhqd", p_c.astype(v.dtype), v,
                             preferred_element_type=acc_t) + \
                jnp.einsum("bhqs,bhds->bhqd", p_f.astype(v_f.dtype), v_f,
                           preferred_element_type=acc_t)
            return ctx.astype(q.dtype)
        k_t, v_t, tail_len = tail_kv        # [Kmax,B,H,D] tail-major
        kmax = k_t.shape[0]
        k_t = dequantize_cache_values(k_t, kv_quant_orig_scale, q.dtype)
        v_t = dequantize_cache_values(v_t, kv_quant_orig_scale, q.dtype)
        s_t = jnp.einsum("bhqd,kbhd->bhqk", q, k_t,
                         preferred_element_type=acc_t) * \
            jnp.asarray(scale, acc_t)
        tpos = jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 3)
        s_t = jnp.where(tpos < tail_len, s_t, jnp.asarray(-1e30, s_t.dtype))
        all_scores = jnp.concatenate([scores, s_t, s_f], axis=-1)
        probs = jax.nn.softmax(all_scores, axis=-1)
        p_c = probs[..., :s_max]
        p_t = probs[..., s_max:s_max + kmax]
        p_f = probs[..., s_max + kmax:]
        ctx = jnp.einsum("bhqs,bhds->bhqd", p_c.astype(v.dtype), v,
                         preferred_element_type=acc_t) + \
            jnp.einsum("bhqk,kbhd->bhqd", p_t.astype(v_t.dtype), v_t,
                       preferred_element_type=acc_t) + \
            jnp.einsum("bhqs,bhds->bhqd", p_f.astype(v_f.dtype), v_f,
                       preferred_element_type=acc_t)
        return ctx.astype(q.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqs,bhds->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=acc_t)
    return ctx.astype(q.dtype)


def grouped_cross_attention(q, k, v, kv_quant_orig_scale, scale):
    """Full-length unmasked cross attention where the KV batch DIVIDES
    the query batch: beam/best_of rows share their audio's cross K/V
    ([B_kv, H, D, S] seq-minor views), so the cache is read once per
    GROUP instead of once per beam (a jnp.repeat'd cross cache cost
    beam x the cross-KV HBM bytes every decode step — ~0.6 ms/step at
    beam 5 on large-v2 int8).  Numerics match cached_decode_attention's
    full-length path (fp32 scores/softmax, probs cast to the V dtype)."""
    b, h, lq, d = q.shape
    kb = k.shape[0]
    assert b % kb == 0, (b, kb)
    g = b // kb
    if k.dtype in (jnp.int8, jnp.float8_e4m3fn):
        k = dequantize_cache_values(k, kv_quant_orig_scale, q.dtype)
        v = dequantize_cache_values(v, kv_quant_orig_scale, q.dtype)
    acc_t = jnp.float32
    qg = q.reshape(kb, g, h, lq, d)
    s = jnp.einsum("bghld,bhds->bghls", qg, k,
                   preferred_element_type=acc_t) * jnp.asarray(scale, acc_t)
    p = jax.nn.softmax(s, axis=-1)
    ctx = jnp.einsum("bghls,bhds->bghld", p.astype(v.dtype), v,
                     preferred_element_type=acc_t)
    return ctx.reshape(b, h, lq, d).astype(q.dtype)


def beam_indirect_decode_attention(q, cache, seq_len, indirection,
                                   scale: Optional[float] = None,
                                   kv_quant_orig_scale=None,
                                   start_index=None, fresh_kv=None):
    """One-token attention through a cache_indirection row map WITHOUT
    materialising the reordered cache (ref cache_indirection,
    T/functional.py:2738 — the CUDA masked-MHA kernel composes the
    indirection into its cache READ; this is the XLA equivalent).

    q [B, H, 1, D] with B = groups*beams (grouped by slot); ``cache``
    (k, v) [B, H, D, S] RAW physical seq-minor views (layer_kv_views);
    ``indirection`` [groups, beams, S] maps each (query-beam, position)
    to the physical beam row whose K/V wrote that position.

    The naive formulation gathers K and V into a reordered copy
    (take_along_axis): 2x the cache bytes written + re-read per layer
    per step — measured 13.2 ms/tok at beam=4/ctx=2048/24-layer on v5e.
    Here the selection rides the SCORES instead: compute every
    (query-beam x source-beam) score (beams x more MXU work on a tiny
    GEMM — ~0.5 GFLOP/layer at beam 4), zero the non-selected sources
    per position, and accumulate V per source beam with the masked
    probabilities.  The cache is read ONCE and nothing is written; the
    selected terms are bit-identical to the gather formulation (the
    masked-out terms are exact fp zeros), only the fp32 accumulation
    order of the PV sum differs.

    ``fresh_kv`` (k_f, v_f) [B, H, D, 1] is per-row — the current
    token's K/V belong to the beam that computed them; no indirection.
    """
    b, h, lq, d = q.shape
    assert lq == 1, "beam-indirect attention is a generation-step op"
    k, v = cache if isinstance(cache, tuple) else (cache[:, 0], cache[:, 1])
    s_max = k.shape[3]
    bg, bw, s_ind = indirection.shape
    assert bg * bw == b, (indirection.shape, b)
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    if k.dtype in (jnp.int8, jnp.float8_e4m3fn):
        k = dequantize_cache_values(k, kv_quant_orig_scale, q.dtype)
        v = dequantize_cache_values(v, kv_quant_orig_scale, q.dtype)
    acc_t = jnp.float32
    ind = indirection
    if s_ind < s_max:            # positions past S are masked by seq_len
        ind = jnp.pad(ind, ((0, 0), (0, 0), (0, s_max - s_ind)))
    k5 = k.reshape(bg, bw, h, d, s_max)
    v5 = v.reshape(bg, bw, h, d, s_max)
    q4 = q[:, :, 0, :].reshape(bg, bw, h, d)
    # all (query-beam, source-beam) scores: [g, qb, kb, H, S]
    s_all = jnp.einsum("gqhd,gkhds->gqkhs", q4, k5,
                       preferred_element_type=acc_t) * \
        jnp.asarray(scale, acc_t)
    sel = (ind[:, :, None, :] ==
           jnp.arange(bw, dtype=ind.dtype)[None, None, :, None])
    scores = jnp.sum(jnp.where(sel[:, :, :, None, :], s_all, 0.0),
                     axis=2).reshape(b, h, 1, s_max)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, s_max), 3)
    cache_len = jnp.reshape(seq_len, (-1, 1, 1, 1)).astype(jnp.int32)
    if fresh_kv is not None:
        cache_len = cache_len - 1           # current token not in cache yet
    valid = kpos < cache_len
    if start_index is not None:
        valid = jnp.logical_and(
            valid, kpos >= jnp.reshape(start_index, (-1, 1, 1, 1)))
    scores = jnp.where(valid, scores, jnp.asarray(-1e30, scores.dtype))
    if fresh_kv is not None:
        k_f, v_f = fresh_kv
        k_f = dequantize_cache_values(k_f, kv_quant_orig_scale, q.dtype)
        v_f = dequantize_cache_values(v_f, kv_quant_orig_scale, q.dtype)
        s_f = jnp.einsum("bhqd,bhds->bhqs", q, k_f,
                         preferred_element_type=acc_t) * \
            jnp.asarray(scale, acc_t)
        probs = jax.nn.softmax(jnp.concatenate([scores, s_f], axis=-1),
                               axis=-1)
        p_c, p_f = probs[..., :s_max], probs[..., s_max:]
        p_m = jnp.where(sel[:, :, :, None, :],
                        p_c.reshape(bg, bw, 1, h, s_max), 0.0)
        ctx = jnp.einsum("gqkhs,gkhds->gqhd", p_m.astype(v.dtype), v5,
                         preferred_element_type=acc_t) \
            .reshape(b, h, 1, d) + \
            jnp.einsum("bhqs,bhds->bhqd", p_f.astype(v_f.dtype), v_f,
                       preferred_element_type=acc_t)
        return ctx.astype(q.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    p_m = jnp.where(sel[:, :, :, None, :],
                    probs.reshape(bg, bw, 1, h, s_max), 0.0)
    ctx = jnp.einsum("gqkhs,gkhds->gqhd", p_m.astype(v.dtype), v5,
                     preferred_element_type=acc_t).reshape(b, h, 1, d)
    return ctx.astype(q.dtype)
