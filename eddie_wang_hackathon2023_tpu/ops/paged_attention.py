"""Block-paged KV-cache attention.

TPU-native counterpart of the reference's paged-KV mode (GPTAttention
plugin with ``paged_kv_cache`` — D/gpt_attention.md:168-200 — consuming the
pointer arrays built by T/runtime/kv_cache_manager.py:154
``get_pointer_array``).  On GPU the cache blocks are scattered heap
allocations addressed via device pointers; on TPU there is one preallocated
pool tensor and the "pointers" are int32 block indices into it — kernels
index, they don't chase pointers.

Pool layout: ``[num_blocks, 2, H, T, D]`` (T = tokens_per_block).
Block tables come from runtime.kv_cache_manager (python) or
native.batch_runtime.NativeKVCacheManager (C++), shape [B, max_blocks],
-1 padded (beams flattened into B by the caller).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..functional import round_half_away


@dataclasses.dataclass(frozen=True)
class PagedKV:
    """Per-attention-call paged-cache bundle threaded through a layer scan:
    the full stacked pool [L, N, 2, H, T, D], the batch's block tables
    [B, max_blocks] (int32, -1 padded) and the scanned layer index."""
    pool: jnp.ndarray
    block_table: jnp.ndarray
    layer_idx: jnp.ndarray


jax.tree_util.register_dataclass(
    PagedKV, data_fields=["pool", "block_table", "layer_idx"],
    meta_fields=[])


@dataclasses.dataclass(frozen=True)
class PagedCacheState:
    """The serving runtime's cache argument in paged mode (replaces the
    dense stacked [L, B, 2, H, D, S] array): one pool tensor + the current
    block tables.  ref D/gpt_attention.md:168-200 paged_kv_cache."""
    pool: jnp.ndarray            # [L, N, 2, H, T, D]
    block_table: jnp.ndarray     # [B, max_blocks] int32


jax.tree_util.register_dataclass(
    PagedCacheState, data_fields=["pool", "block_table"], meta_fields=[])


def new_block_pool(num_blocks: int, num_kv_heads: int, tokens_per_block: int,
                   head_dim: int, dtype=jnp.bfloat16,
                   num_layers: Optional[int] = None) -> jnp.ndarray:
    shape = (num_blocks, 2, num_kv_heads, tokens_per_block, head_dim)
    if num_layers is not None:
        shape = (num_layers,) + shape
    return jnp.zeros(shape, dtype)


def paged_append_kv(pool, k_new, v_new, block_table, write_pos,
                    kv_orig_quant_scale=None, layer_idx=None) -> jnp.ndarray:
    """Scatter one new token's K/V per sequence into the pool (in place
    under jit via donation).

    pool        [N, 2, H, T, D] (or [L, N, 2, H, T, D] with ``layer_idx``)
    k_new/v_new [B, H, 1, D]  (decode step)
    block_table [B, max_blocks] int32
    write_pos   [B] int32 — token position this write lands at.
    """
    n, _, h, t, d = pool.shape[-5:]
    kv = jnp.stack([k_new[:, :, 0], v_new[:, :, 0]], axis=1)  # [B,2,H,D]
    if pool.dtype == jnp.int8:
        assert kv_orig_quant_scale is not None
        scaled = kv.astype(jnp.float32) * kv_orig_quant_scale
        kv = jnp.clip(round_half_away(scaled), -128, 127).astype(jnp.int8)
    else:
        kv = kv.astype(pool.dtype)
    write_pos = write_pos.astype(jnp.int32)
    block_of = jnp.take_along_axis(
        block_table, (write_pos // t)[:, None], axis=1)[:, 0]   # [B]
    offset = write_pos % t                                      # [B]
    # unallocated table slots (-1) become out-of-range indices and the
    # scatter drops them — no masking read, no write hazard
    block_of = jnp.where(block_of >= 0, block_of, n)
    if layer_idx is not None:
        return pool.at[layer_idx, block_of, :, :, offset].set(kv,
                                                              mode="drop")
    return pool.at[block_of, :, :, offset].set(kv, mode="drop")


def paged_decode_attention(q, pool, block_table, seq_len,
                           scale: Optional[float] = None,
                           kv_quant_orig_scale=None,
                           causal_offset=None,
                           beam_indirection=None) -> jnp.ndarray:
    """q [B, H, Lq, D] against block-paged KV; returns [B, H, Lq, D].

    Lq == 1 is the generation phase.  Lq > 1 with ``causal_offset`` [B]
    is the mixed context+generation window (ref ibGptAttention mixed
    enqueue): query row i of sequence b attends keys at positions
    <= causal_offset[b] + i (the window's K/V must already be in the
    pool — the caller appends before the read, matching the in-place
    gpt_attention plugin semantics).

    ``beam_indirection`` [Bg, W, S] (B == Bg*W rows grouped by slot):
    paged beam search.  Every beam row APPENDS into its own private block
    chain; the indirection redirects the READ of each history position to
    the ancestor beam that wrote it (the reference composes its
    cache_indirection with per-beam pointer arrays the same way inside
    the masked-MHA plugin) — beam reorders never move blocks or tables.

    Numerics match ops.attention.cached_decode_attention (fp32 scores +
    softmax) — the equivalence test drives both against the same tokens.
    """
    b, h, lq, d = q.shape
    assert lq == 1 or causal_offset is not None, \
        "multi-token paged queries need per-row causal offsets"
    n, _, hk, t, _ = pool.shape
    max_blocks = block_table.shape[1]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    table = jnp.maximum(block_table, 0)
    # gather each sequence's blocks: [B, max_blocks, 2, H, T, D]
    blocks = pool[table]
    k = blocks[:, :, 0].transpose(0, 2, 1, 3, 4).reshape(b, hk, max_blocks * t, d)
    v = blocks[:, :, 1].transpose(0, 2, 1, 3, 4).reshape(b, hk, max_blocks * t, d)
    if pool.dtype == jnp.int8:
        assert kv_quant_orig_scale is not None
        k = (k.astype(jnp.float32) * kv_quant_orig_scale).astype(q.dtype)
        v = (v.astype(jnp.float32) * kv_quant_orig_scale).astype(q.dtype)
    else:
        k = k.astype(q.dtype)
        v = v.astype(q.dtype)
    acc_t = jnp.float32
    if beam_indirection is not None:
        # masked cross-beam scores instead of take_along_axis — XLA
        # lowered the gather to a materialised reordered K/V copy (2x the
        # gathered bytes written + re-read); see
        # ops.attention.beam_indirect_decode_attention for the math
        assert lq == 1, "paged beam indirection is a generation-step path"
        bg, bw, s_ind = beam_indirection.shape
        assert bg * bw == b, (beam_indirection.shape, b)
        s_b = max_blocks * t
        ind = beam_indirection
        if s_ind < s_b:          # positions past S are masked by seq_len
            ind = jnp.pad(ind, ((0, 0), (0, 0), (0, s_b - s_ind)))
        k5 = k.reshape(bg, bw, hk, s_b, d)
        v5 = v.reshape(bg, bw, hk, s_b, d)
        q4 = q[:, :, 0, :].reshape(bg, bw, hk, d)
        s_all = jnp.einsum("gqhd,gkhsd->gqkhs", q4, k5,
                           preferred_element_type=acc_t) * \
            jnp.asarray(scale, acc_t)
        sel = (ind[:, :, None, :s_b] ==
               jnp.arange(bw, dtype=ind.dtype)[None, None, :, None])
        scores = jnp.sum(jnp.where(sel[:, :, :, None, :], s_all, 0.0),
                         axis=2).reshape(b, hk, 1, s_b)
        kpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, s_b), 3)
        valid = kpos < jnp.reshape(seq_len, (-1, 1, 1, 1)).astype(jnp.int32)
        scores = jnp.where(valid, scores, jnp.asarray(-1e30, scores.dtype))
        probs = jax.nn.softmax(scores, axis=-1)
        p_m = jnp.where(sel[:, :, :, None, :],
                        probs.reshape(bg, bw, 1, hk, s_b), 0.0)
        ctx = jnp.einsum("gqkhs,gkhsd->gqhd", p_m.astype(v.dtype), v5,
                         preferred_element_type=acc_t).reshape(b, hk, 1, d)
        return ctx.astype(q.dtype)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=acc_t) * jnp.asarray(scale, acc_t)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, max_blocks * t), 3)
    valid = kpos < jnp.reshape(seq_len, (-1, 1, 1, 1)).astype(jnp.int32)
    if lq > 1:
        qpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lq, 1), 2)
        offset = jnp.reshape(causal_offset, (-1, 1, 1, 1)).astype(jnp.int32)
        valid = jnp.logical_and(valid, kpos <= qpos + offset)
    scores = jnp.where(valid, scores, jnp.asarray(-1e30, scores.dtype))
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=acc_t)
    return ctx.astype(q.dtype)


def paged_append_window(pool, k_new, v_new, block_table, write_pos,
                        kv_orig_quant_scale=None, layer_idx=None):
    """Scatter a W-token window's K/V per sequence into the pool at
    per-row start offsets (mixed context+generation admission: prompt
    chunks land at write_pos..write_pos+W-1, block-alignment NOT assumed).

    pool        [N, 2, H, T, D] (or [L, N, 2, H, T, D] with ``layer_idx``)
    k_new/v_new [B, H, W, D]
    block_table [B, max_blocks] int32 (-1 padded)
    write_pos   [B] int32 — the window's first token position per row.

    Lanes mapping past a row's allocation (unallocated -1 table slots —
    e.g. pad lanes beyond the chunk's ``valid`` length) go out of range
    and are dropped by the scatter; pad lanes that DO land in allocated
    blocks write dead KV beyond sequence_length that later real tokens
    overwrite before it is ever attended (same contract as the dense
    mixed path, runtime/batch_manager._mixed_step_impl).
    """
    b, h, w, d = k_new.shape
    n, _, hk, t, _ = pool.shape[-5:]
    kv = jnp.stack([k_new, v_new], axis=1)  # [B,2,H,W,D]
    if pool.dtype == jnp.int8:
        assert kv_orig_quant_scale is not None
        scaled = kv.astype(jnp.float32) * kv_orig_quant_scale
        kv = jnp.clip(round_half_away(scaled), -128, 127).astype(jnp.int8)
    else:
        kv = kv.astype(pool.dtype)
    pos = write_pos.astype(jnp.int32)[:, None] + \
        jnp.arange(w, dtype=jnp.int32)[None, :]            # [B, W]
    block_idx = jnp.take_along_axis(block_table, pos // t, axis=1)
    block_idx = jnp.where(block_idx >= 0, block_idx, n)
    offset = pos % t
    bidx = block_idx.reshape(-1)                           # [B*W]
    oidx = offset.reshape(-1)
    upd = kv.transpose(0, 3, 1, 2, 4).reshape(b * w, 2, h, d)
    if layer_idx is not None:
        return pool.at[layer_idx, bidx, :, :, oidx].set(upd, mode="drop")
    return pool.at[bidx, :, :, oidx].set(upd, mode="drop")


def paged_prefill(pool, k, v, block_table, kv_orig_quant_scale=None,
                  layer_idx=None):
    """Write a whole prompt's K/V into the pool (context phase).

    k/v [B, H, P, D]; block_table [B, max_blocks]; positions 0..P-1.
    pool [N, 2, H, T, D] or stacked [L, N, 2, H, T, D] with ``layer_idx``.
    The prompt attention itself runs on the contiguous fresh K/V (flash
    path) — only the cache write is paged, mirroring the reference where
    the context FMHA reads the unpaged QKV and the kernel stores to blocks.
    """
    b, h, p, d = k.shape
    n, _, hk, t, _ = pool.shape[-5:]
    kv = jnp.stack([k, v], axis=1)  # [B,2,H,P,D]
    if pool.dtype == jnp.int8:
        assert kv_orig_quant_scale is not None
        scaled = kv.astype(jnp.float32) * kv_orig_quant_scale
        kv = jnp.clip(round_half_away(scaled), -128, 127).astype(jnp.int8)
    else:
        kv = kv.astype(pool.dtype)
    pos = jnp.arange(p, dtype=jnp.int32)
    block_idx = jnp.take_along_axis(
        block_table, (pos // t)[None, :].repeat(b, 0), axis=1)  # [B, P]
    # tokens past a row's allocation (-1 slots, e.g. right-padding beyond
    # the true prompt) map out of range and are dropped by the scatter
    block_idx = jnp.where(block_idx >= 0, block_idx, n)
    offset = pos % t
    bidx = block_idx.reshape(-1)                       # [B*P]
    oidx = jnp.tile(offset, b)                         # [B*P]
    upd = kv.transpose(0, 3, 1, 2, 4).reshape(b * p, 2, h, d)
    if layer_idx is not None:
        return pool.at[layer_idx, bidx, :, :, oidx].set(upd, mode="drop")
    return pool.at[bidx, :, :, oidx].set(upd, mode="drop")
