"""Fused single-token decode attention (Pallas).

The hand kernel the survey called the hard part (SURVEY.md §7) — the
TPU counterpart of the reference's decoderMaskedMultiheadAttention CUDA
family (``C/tensorrt_llm/kernels/decoderMaskedMultiheadAttention/``,
~6.5k LoC): for one query token per sequence, read the cached K/V,
dequantize (int8/fp8) on the fly, compute masked scores, softmax in fp32
and accumulate V — all in ONE kernel per layer, straight out of the
STACKED cache.

Shape strategy: the grid is ``(B, S/CHUNK)`` — one batch row per major
cell, the sequence axis split into CHUNK-column panels so Mosaic
double-buffers the K/V DMA against the previous chunk's compute (a
single whole-cache block left the DMA exposed: the large-v2 cross
kernel measured 11 µs/layer against a 4.7 µs HBM floor).  Softmax is
accumulated ONLINE across chunks (running max / rescaled sum, exactly
the flash-attention recurrence) in fp32 VMEM scratch.  Chunks entirely
past the valid length are SKIPPED: the BlockSpec index map clamps their
block index (same index ⇒ Mosaic elides the DMA) and ``pl.when``
guards the compute, so a mostly-empty self-attention cache costs reads
proportional to the actual sequence length, not S_max.  All H heads are
processed as one batched ``dot_general`` pair per chunk.  Quantized
caches are consumed at their storage dtype and the per-tensor scale is
applied to the (linear) score/context results, so no fp32 copy of the
cache is ever materialised in VMEM.

Layout contract (matches ops.attention): stacked cache
``[L, B, 2, H, D, S]`` — SEQ-MINOR; the layer index is a scalar-prefetch
argument consumed by the BlockSpec index maps, so no layer slice is ever
materialised in HBM.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(layer_ref, seqlen_ref, start_ref, kscale_ref, tlen_ref,
            q_ref, kv_ref,
            *rest, scale: float, quant: bool, with_fresh: bool,
            with_tail: bool, with_proj: bool, proj_quant: bool,
            proj_bias: bool, proj_nk: bool, with_xq: bool, xq_quant: bool,
            xq_bias: bool, with_xqkv: bool, with_res: bool, with_ln: bool,
            ln_eps: float, cache_dt,
            cdt, cs: int, n_chunks: int, s_max: int):
    # positional order: scalar-prefetch refs, input refs, output ref(s),
    # scratch refs (running max / denom / context accumulator, + the
    # computed q (and k/v in xqkv mode) buffers)
    m_ref, d_ref, acc_ref = rest[-3:]
    n_scr = 3 + (1 if (with_xq or with_xqkv) else 0) + (2 if with_xqkv else 0)
    qs_ref = rest[-4] if (with_xq or with_xqkv) else None
    ks_ref = rest[-6] if with_xqkv else None
    vs_ref = rest[-5] if with_xqkv else None
    n_out = 3 if with_xqkv else 1
    o_ref = rest[-(n_scr + n_out)]
    if with_xqkv:
        ok_ref, ov_ref = rest[-(n_scr + 2)], rest[-(n_scr + 1)]
    extra = rest[:-(n_scr + n_out)]
    # residual / prologue-LN operands ride at the very end of the inputs
    if with_res:
        res_ref = extra[-1]
        extra = extra[:-1]
    if with_ln:
        lng_ref, lnb_ref = extra[-2:]
        extra = extra[:-2]
    if with_xq or with_xqkv:
        # q(kv)-projection operands ride last: weight block
        # [1, dm, H, D] (xq) / [1, dm, 3H, D] (xqkv)
        # (+ scale, same trailing shape) (+ bias); q_ref is the raw
        # hidden state x [1, 1, dm] instead of the projected query
        n_xq = 1 + (1 if xq_quant else 0) + (1 if xq_bias else 0)
        xq_refs = extra[-n_xq:]
        extra = extra[:-n_xq]
    if with_proj:
        # out-projection operands ride at the tail of the inputs:
        # weight block [1, H, D, N] (+ scale [1, N]) (+ bias [1, N])
        n_proj = 1 + (1 if proj_quant else 0) + (1 if proj_bias else 0)
        proj_refs = extra[-n_proj:]
        extra = extra[:-n_proj]

    def emit(ctx):
        """ctx [H, D] fp32 -> output store (plain context, or the fused
        out-projection: per-head [1,D]x[D,N] batched dot, sum over heads —
        numerically the same chain as weight_only_quant_matmul: cast to
        the activation dtype, int8 weight cast (not scaled) into the MXU,
        fp32 accumulation, per-out-channel scale after)."""
        if not with_proj:
            o_ref[0] = ctx.astype(o_ref.dtype)
            return
        pw = proj_refs[0]
        ctx_a = ctx.astype(cdt)                            # [H, D]
        # per-head [1,D]x[D,N] dots, statically unrolled (Mosaic has no
        # batched-3D dot or [H,D]->[1,H*D] shape cast; static sublane
        # slices + 2D matmuls lower cleanly), summed over heads.
        # proj_nk: the weight rides in the Linear layer's native [N, K]
        # layout (bf16 dense — transposing it per step would copy the
        # whole stacked weight); the per-head dot contracts both minors
        # ("NT" gemm)
        out = None
        for h in range(ctx_a.shape[0]):
            if proj_nk:
                part = jax.lax.dot_general(
                    ctx_a[h:h + 1, :], pw[0, :, h].astype(cdt),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)    # [1, N]
            else:
                part = jax.lax.dot(
                    ctx_a[h:h + 1, :], pw[0, h].astype(cdt),
                    preferred_element_type=jnp.float32)    # [1, N]
            out = part if out is None else out + part
        i = 1
        if proj_quant:
            out = out * proj_refs[i][...]
            i += 1
        if proj_bias:
            out = out + proj_refs[i][...]
        if with_res:
            # fused residual add (the block's x + attn_out): one less
            # elementwise dispatch per layer per step
            out = out + res_ref[...].astype(jnp.float32)
        o_ref[...] = out.astype(o_ref.dtype)
    b = pl.program_id(0)
    c = pl.program_id(1)
    kscale = kscale_ref[0] if quant else 1.0
    seq_len = seqlen_ref[b]
    cache_len = seq_len - 1 if (with_fresh or with_xqkv) else seq_len
    if with_tail:
        cache_len = cache_len - tlen_ref[0]
    n_need = jnp.maximum(jax.lax.div(cache_len + cs - 1, cs), 1)

    @pl.when(c == 0)
    def _init():
        m_ref[...] = jnp.full(m_ref.shape, NEG, m_ref.dtype)
        d_ref[...] = jnp.zeros(d_ref.shape, d_ref.dtype)
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
        if with_xq or with_xqkv:
            # fused q(kv)-projection: (x @ W) * scale + bias, computed
            # once per batch row into scratch; per-head 2D dots (see emit
            # for the Mosaic rationale), same numeric chain as
            # weight_only_quant_matmul (fp32 accum, per-channel scale).
            # xqkv additionally computes K and V (weight rows H..2H-1 and
            # 2H..3H-1), casts them to the cache dtype exactly like
            # cast_kv_for_cache, stores them for the fresh-token math and
            # emits them through the extra outputs for the deferred write
            xw = xq_refs[0]
            i = 1
            xsc = None
            if xq_quant:
                xsc = xq_refs[i][0].astype(jnp.float32)    # [(3)H, D]
                i += 1
            xb = xq_refs[i][0].astype(cdt) if xq_bias else None
            xa = q_ref[0].astype(jnp.float32)              # [1, dm]
            if with_ln:
                # fused pre-LN (functional.layer_norm numerics: fp32
                # statistics, affine, then cast) — the LN dispatch leaves
                # the XLA stream and rides the prologue
                mu = jnp.mean(xa, axis=-1, keepdims=True)
                var = jnp.mean(jnp.square(xa - mu), axis=-1, keepdims=True)
                xa = (xa - mu) * jax.lax.rsqrt(var + ln_eps)
                xa = xa * lng_ref[...].astype(jnp.float32) + \
                    lnb_ref[...].astype(jnp.float32)
            xa = xa.astype(cdt)
            H = qs_ref.shape[0]

            def proj_row(r):
                ph = jax.lax.dot(
                    xa, xw[0, :, r, :].astype(cdt),
                    preferred_element_type=jnp.float32)    # [1, D]
                if xsc is not None:
                    ph = ph * xsc[r:r + 1, :]
                ph = ph.astype(cdt)
                if xb is not None:
                    ph = ph + xb[r:r + 1, :]
                return ph

            for h in range(H):
                # qs scratch is [H, 1, D]; qs_ref[h] views the [1, D] row
                qs_ref[h] = proj_row(h).astype(qs_ref.dtype)
            if with_xqkv:
                for h in range(H):
                    kh = proj_row(H + h).astype(cache_dt)
                    vh = proj_row(2 * H + h).astype(cache_dt)
                    ks_ref[h:h + 1, :] = kh
                    vs_ref[h:h + 1, :] = vh
                ok_ref[0] = ks_ref[...]
                ov_ref[0] = vs_ref[...]

    def read_q():
        # q rides the whole kernel as [H, 1, D]: Mosaic on this libtpu
        # rejects the [H,D]->[H,1,D] shape cast on packed (bf16) vectors
        # ("infer-vector-layout: unsupported shape cast"), so the unit dim
        # must come from the ref slice / scratch shape, never a reshape
        if with_xq or with_xqkv:
            return qs_ref[...].astype(cdt)                 # [H, 1, D]
        return q_ref[0].astype(cdt)                        # [H, 1, D]

    @pl.when(c < n_need)
    def _chunk():
        q = read_q()                                       # [H, 1, D]
        kv = kv_ref[0, 0]                                  # [2, H, D, CS]
        k = kv[0].astype(cdt)                              # [H, D, CS]
        v = kv[1].astype(cdt)
        if s_max % cs:
            # the final panel reads past S: its padding columns hold
            # garbage that may be NaN/inf in float caches — the masked
            # probs are 0 there, but NaN*0 would still poison the PV
            # contraction, so zero the padded V columns explicitly
            col = c * cs + jax.lax.broadcasted_iota(jnp.int32, v.shape, 2)
            v = jnp.where(col < s_max, v, 0)
        # batched over heads: [H,1,D] x [H,D,CS] -> [H,1,CS] fp32
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        s = s * (scale * kscale)
        pos = c * cs + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        valid = jnp.logical_and(pos < cache_len, pos >= start_ref[b])
        s = jnp.where(valid, s, NEG)
        m_prev = m_ref[:, :]                               # [H, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=2))
        # a fully-masked chunk must contribute nothing (exp(NEG-NEG)=1
        # would poison the denominator), hence the explicit where
        p = jnp.where(valid, jnp.exp(s - m_new[:, :, None]), 0.0)
        alpha = jnp.exp(m_prev - m_new)                    # [H, 1]
        d_ref[:, :] = d_ref[:, :] * alpha + jnp.sum(p, axis=2)
        # [H,D,CS] x [H,1,CS] -> [H,D,1]
        pv = jax.lax.dot_general(
            v, p.astype(cdt),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, :, 0]   # [H, D]
        acc_ref[:, :] = acc_ref[:, :] * alpha + pv
        m_ref[:, :] = m_new

    @pl.when(c == n_chunks - 1)
    def _finalize():
        m = m_ref[:, :]                                    # [H, 1]
        d = d_ref[:, :]
        acc = acc_ref[:, :]                                # [H, D]
        if with_fresh or with_xqkv:
            if with_xqkv:
                q32 = qs_ref[...].astype(jnp.float32)      # [H, 1, D]
                # f32 unit-dim insert (packed-dtype shape casts are the
                # ones Mosaic rejects; 32-bit lowers)
                fk3 = ks_ref[...].astype(jnp.float32)[:, None, :]
                fv = vs_ref[...].astype(jnp.float32)       # [H, D]
                s_f = jnp.sum(q32 * fk3, axis=-1) * (scale * kscale)
            else:
                q32 = q_ref[0].astype(jnp.float32)         # [H, 1, D]
                fk_ref, fv_ref = extra[-2], extra[-1]
                fv = fv_ref[0, :, :, 0].astype(jnp.float32)    # [H, D]
                # [H,1,D] x [H,D,1] (contract D, batch H) -> [H,1,1]
                s_f = jax.lax.dot_general(
                    q32, fk_ref[0].astype(jnp.float32),
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)[:, :, 0] \
                    * (scale * kscale)                     # [H, 1]
            if with_tail:
                # K-step deferred tail block [Kmax,1,1,2,H,D] tail-major
                # (see ops.attention write_tail_kv): masked extra columns
                t_ref = extra[0]
                q = read_q()
                # [K,H,D] -> [H,K,D]: Mosaic's matmul needs lhs/rhs batch
                # dims in the same position; the K,H leading-axis swap is
                # cheap at tail size (~20 KB)
                tk = jnp.transpose(t_ref[:, 0, 0, 0], (1, 0, 2)).astype(cdt)
                tv = jnp.transpose(t_ref[:, 0, 0, 1], (1, 0, 2)).astype(cdt)
                # [H,1,D] x [H,K,D] (contract D, batch H) -> [H,1,K]
                s_t = jax.lax.dot_general(
                    q, tk,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                s_t = s_t * (scale * kscale)
                tpos = jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 2)
                tmask = tpos < tlen_ref[0]
                s_t = jnp.where(tmask, s_t, NEG)
                m_fin = jnp.maximum(jnp.maximum(m, jnp.max(s_t, axis=2)),
                                    s_f)                   # [H, 1]
                alpha = jnp.exp(m - m_fin)
                p_t = jnp.where(tmask, jnp.exp(s_t - m_fin[:, :, None]), 0.0)
                p_f = jnp.exp(s_f - m_fin)                 # [H, 1]
                denom = d * alpha + jnp.sum(p_t, axis=2) + p_f
                # [H,1,K] x [H,K,D] (contract K, batch H) -> [H,1,D]
                ctx_t = jax.lax.dot_general(
                    p_t.astype(cdt), tv,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)[:, 0, :]   # [H, D]
                ctx = (acc * alpha + ctx_t) * kscale + fv * (kscale * p_f)
                emit(ctx / denom)
                return
            m_fin = jnp.maximum(m, s_f)                    # [H, 1]
            alpha = jnp.exp(m - m_fin)
            p_f = jnp.exp(s_f - m_fin)                     # [H, 1]
            denom = d * alpha + p_f
            ctx = acc * alpha * kscale + fv * (kscale * p_f)
            emit(ctx / denom)
        else:
            emit(acc * (kscale / d))


def _default_chunk(S: int) -> int:
    from ..plugin import get_plugin_config
    return get_plugin_config().get_decode_chunk(S)


def fused_decode_attention(full_cache, layer_idx, q, seq_len,
                           scale: float,
                           kv_quant_orig_scale=None,
                           fresh_kv: Optional[Tuple] = None,
                           start_index=None,
                           tail_kv: Optional[Tuple] = None,
                           proj: Optional[Tuple] = None,
                           xq: Optional[Tuple] = None,
                           xqkv: Optional[Tuple] = None,
                           residual=None,
                           ln: Optional[Tuple] = None,
                           chunk: Optional[int] = None,
                           interpret: bool = False):
    """One-token attention against one layer of the stacked cache.

    full_cache [L, B, 2, H, D, S] (bf16/int8/fp8 seq-minor);
    layer_idx scalar int32; q [B, H, 1, D]; seq_len [B] int32 — total valid
    length INCLUDING the current token.  ``fresh_kv``: (k, v) [B, H, D, 1]
    in cache dtype for the deferred-write mode (current token's K/V not in
    the cache yet).  ``tail_kv``: (tail, tail_len) — the K-step deferred
    tail [Kmax, L, B, 2, H, D] (the FULL stacked tail in tail-major
    layout; this layer's [Kmax,1,1,2,H,D] block is selected by the
    BlockSpec index map) holding the last ``tail_len`` (scalar int32)
    tokens not yet merged into the cache; requires fresh_kv.
    ``start_index`` [B] int32 (or scalar) masks keys at positions < start
    (left-padded ragged prompts, runtime/generation.py).
    ``proj``: (weight, scale, bias) — fuse the attention OUT-PROJECTION
    into the kernel epilogue: weight [H*D, N] per-layer, or the FULL
    stacked [L, H*D, N] (layer picked by ``layer_idx`` in the index_map —
    preferred inside a layer scan: the panel is DMA'd straight from the
    stacked array with no per-layer HBM slice copy); int8
    weight-only-quantised with per-out-channel ``scale`` [N] fp32, or
    bf16/f32 with scale None; bias [N] or None.  The weight is DMA'd once per grid row and its read
    overlaps the cache streaming; the final context never round-trips to
    HBM.  Removes the separate dense GEMV launch per layer (the three
    1.6 MB GEMVs measured at 53% HBM bw vs 77-90% for the larger ones —
    launch-overhead-bound).  Returns [B, N] (dense output, bias applied)
    instead of the [B, H, 1, D] context.
    ``xq``: (x, weight, scale, bias) — fuse the Q-PROJECTION into the
    kernel prologue (cached-only mode, i.e. cross-attention decode): pass
    the raw hidden state ``x`` [B, 1, d_model] as ``q`` and the q_linear
    operands (weight [d_model, H*D] per-layer or stacked
    [L, d_model, H*D]; int8 WOQ scale [H*D] fp32 or None; bias [H*D] or
    None).  q is computed once per batch row into VMEM scratch with the
    weight_only_quant_matmul numeric chain — the 1.6 MB GEMV and its
    launch leave the XLA dispatch stream and ride the kernel's DMA
    pipeline.  Incompatible with fresh_kv/tail_kv.
    ``xqkv``: (x, weight, scale, bias) — SELF-attention decode analogue
    of ``xq``: the fused QKV projection runs in the prologue (weight
    [d_model, 3*H*D] per-layer or stacked [L, ...]; rows 0..H-1 = Q,
    H..2H-1 = K, 2H..3H-1 = V), the fresh K/V are cast to the cache
    dtype in-kernel (cast_kv_for_cache chain, float caches only) and
    returned as extra outputs for the deferred write.  Replaces
    ``fresh_kv`` (mutually exclusive); composes with ``tail_kv`` and
    ``proj``.  Return value becomes (attn_out, k_fresh [B,H,D],
    v_fresh [B,H,D]).
    ``chunk``: sequence-panel width (default 256, env EWT_DECODE_CHUNK);
    the kernel streams the cache in [2,H,D,chunk] panels with online
    softmax, skipping panels past the valid length.
    Returns ctx [B, H, 1, D] in q.dtype.

    Note on the cache APPEND: it stays OUTSIDE this kernel (one XLA
    dynamic-update-slice batches all layers' fresh columns per step, see
    ops.attention.write_fresh_kv).  An in-kernel append was tried and is
    not expressible: a one-column scatter into the seq-minor cache slices
    the 128-lane axis to size 1, which Mosaic rejects for tiled memrefs in
    every memory space (VMEM block, ANY/HBM async-DMA source and
    destination alike), and a read-modify-write of the surrounding
    128-column tile would add ~20 MB/step of traffic for large-v2 —
    more than the store it replaces.
    """
    L, B, _, H, D, S = full_cache.shape
    quant = full_cache.dtype in (jnp.int8, jnp.float8_e4m3fn)
    with_fresh = fresh_kv is not None
    with_tail = tail_kv is not None
    with_xq = xq is not None
    with_xqkv = xqkv is not None
    assert not (with_tail and not (with_fresh or with_xqkv)), \
        "tail mode requires fresh K/V (operand or fused-QKV)"
    assert not (with_xq and with_fresh), \
        "fused q-projection is cached-only (cross-attention decode)"
    assert not (with_xqkv and (with_fresh or with_xq)), \
        "fused QKV replaces fresh_kv/xq"
    assert not (with_xqkv and quant), \
        "fused QKV supports float caches only (in-kernel cast)"
    if with_xq:
        q = xq[0]                                # [B, 1, d_model]
    if with_xqkv:
        q = xqkv[0]                              # [B, 1, d_model]
    if not interpret:
        # off-TPU (CPU tests with the knob forced on) run the interpreter
        from .._utils import runtime_platform
        interpret = runtime_platform() != "tpu"
    cs = min(chunk or _default_chunk(S), S)
    n_chunks = -(-S // cs)

    layer_arr = jnp.reshape(jnp.asarray(layer_idx, jnp.int32), (1,))
    seqlen_arr = jnp.asarray(seq_len, jnp.int32).reshape(-1)
    if seqlen_arr.shape[0] != B:
        seqlen_arr = jnp.broadcast_to(seqlen_arr, (B,))
    if kv_quant_orig_scale is None:
        kscale_arr = jnp.ones((1,), jnp.float32)
    else:
        kscale_arr = jnp.asarray(kv_quant_orig_scale,
                                 jnp.float32).reshape(-1)[:1]
    if start_index is None:
        start_arr = jnp.zeros((B,), jnp.int32)
    else:
        start_arr = jnp.broadcast_to(
            jnp.asarray(start_index, jnp.int32).reshape(-1), (B,))
    if with_tail:
        tail_arr, tail_len = tail_kv
        tlen_arr = jnp.reshape(jnp.asarray(tail_len, jnp.int32), (1,))
        KT = tail_arr.shape[0]
    else:
        tlen_arr = jnp.zeros((1,), jnp.int32)

    # index maps receive (grid ids..., scalar-prefetch refs...).  The kv
    # map clamps the chunk index to the last chunk that holds valid
    # columns: clamped iterations repeat the previous block index, which
    # Mosaic recognises and skips the DMA entirely.
    def kv_map(b, c, lref, sref, stref, kref, tref):
        sl = sref[b] - (1 if with_fresh else 0) - \
            (tref[0] if with_tail else 0)
        n_need = jnp.maximum(jax.lax.div(sl + cs - 1, cs), 1)
        return (lref[0], b, 0, 0, 0, jnp.minimum(c, n_need - 1))

    def q_map(b, c, lref, sref, stref, kref, tref):
        return (b, 0, 0, 0)

    def x_map(b, c, lref, sref, stref, kref, tref):
        return (b, 0, 0)

    def o_map(b, c, lref, sref, stref, kref, tref):
        # 3-D [B,H,D] output block: storing the scratch-sourced [H,D]
        # context through a (1,H,1,D) block needs a 2D->4D vector shape
        # cast Mosaic's layout inference rejects; the query dim is
        # reattached outside the kernel
        return (b, 0, 0)

    def o_proj_map(b, c, lref, sref, stref, kref, tref):
        return (b, 0)

    def tail_map(b, c, lref, sref, stref, kref, tref):
        return (0, lref[0], b, 0, 0, 0)

    in_specs = [
        (pl.BlockSpec((1, 1, q.shape[-1]), x_map, memory_space=pltpu.VMEM)
         if (with_xq or with_xqkv) else
         pl.BlockSpec((1, H, 1, D), q_map, memory_space=pltpu.VMEM)),
        pl.BlockSpec((1, 1, 2, H, D, cs), kv_map, memory_space=pltpu.VMEM),
    ]
    args = [q, full_cache]
    if with_tail:
        in_specs += [
            pl.BlockSpec((KT, 1, 1, 2, H, D), tail_map,
                         memory_space=pltpu.VMEM),
        ]
        args += [tail_arr]
    if with_fresh:
        fk, fv = fresh_kv
        in_specs += [
            pl.BlockSpec((1, H, D, 1), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, D, 1), q_map, memory_space=pltpu.VMEM),
        ]
        args += [fk, fv]

    with_proj = proj is not None
    proj_quant = proj_bias = False
    proj_nk = False
    if with_proj:
        if len(proj) == 4:
            pw, pscale, pbias, layout = proj
            proj_nk = layout == "nk"
        else:
            pw, pscale, pbias = proj
        if proj_nk:
            # bf16 dense: the Linear layer's native [N, K] ([L, N, K]
            # stacked) layout — per-step transposition would copy the
            # whole weight, so the kernel contracts the minor dims instead
            N = pw.shape[-2]
            assert pw.shape[-1] == H * D, \
                f"proj weight [..., N, {H*D}], got {pw.shape}"
            pw = pw.reshape(-1, N, H, D)         # free view: K contiguous
        else:
            N = pw.shape[-1]
            assert pw.shape[-2] == H * D, \
                f"proj weight [..., {H*D}, N], got {pw.shape}"
            # [K, N] per-layer slice, or the FULL stacked [L, K, N] weight:
            # a stacked operand + layer index_map makes the layer panel a
            # direct HBM->VMEM DMA — passing the slice instead costs a
            # materialised per-layer HBM copy every step (profiled 0.24
            # ms/step as constant_dynamic-slice fusions on large-v2)
            pw = pw.reshape(-1, H, D, N)         # free view: K contiguous
        stacked_w = pw.shape[0] > 1
        proj_quant = pscale is not None
        proj_bias = pbias is not None

        def w_map(b, c, lref, sref, stref, kref, tref):
            return (lref[0] if stacked_w else 0, 0, 0, 0)

        def s_map(b, c, lref, sref, stref, kref, tref):
            return (0, 0)

        in_specs += [pl.BlockSpec(
            (1, N, H, D) if proj_nk else (1, H, D, N), w_map,
            memory_space=pltpu.VMEM)]
        args += [pw]
        if proj_quant:
            in_specs += [pl.BlockSpec((1, N), s_map,
                                      memory_space=pltpu.VMEM)]
            args += [jnp.asarray(pscale, jnp.float32).reshape(1, N)]
        if proj_bias:
            in_specs += [pl.BlockSpec((1, N), s_map,
                                      memory_space=pltpu.VMEM)]
            args += [jnp.asarray(pbias, jnp.float32).reshape(1, N)]
        out_spec = pl.BlockSpec((1, N), o_proj_map, memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, N), q.dtype)
    else:
        out_spec = pl.BlockSpec((1, H, D), o_map, memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, H, D), q.dtype)

    cdt = q.dtype if q.dtype in (jnp.float32, jnp.bfloat16) else jnp.bfloat16
    xq_quant = xq_bias = False
    if with_xq or with_xqkv:
        _, xw, xsc, xb = xq if with_xq else xqkv
        dm = q.shape[-1]
        n_rows = H if with_xq else 3 * H
        assert xw.shape[-2] == dm and xw.shape[-1] == n_rows * D, \
            f"q(kv) weight [..., {dm}, {n_rows * D}], got {xw.shape}"
        # [dm, (3)H, D] so the per-head panel is a static middle-index
        # slice (a lane slice of [dm, H*D] at h*D would hit Mosaic
        # relayouts)
        xw = xw.reshape(-1, dm, n_rows, D)
        xq_stacked = xw.shape[0] > 1
        xq_quant = xsc is not None
        xq_bias = xb is not None

        def xw_map(b, c, lref, sref, stref, kref, tref):
            return (lref[0] if xq_stacked else 0, 0, 0, 0)

        def xs_map(b, c, lref, sref, stref, kref, tref):
            return (0, 0, 0)

        in_specs += [pl.BlockSpec((1, dm, n_rows, D), xw_map,
                                  memory_space=pltpu.VMEM)]
        args += [xw]
        if xq_quant:
            in_specs += [pl.BlockSpec((1, n_rows, D), xs_map,
                                      memory_space=pltpu.VMEM)]
            args += [jnp.asarray(xsc, jnp.float32).reshape(1, n_rows, D)]
        if xq_bias:
            in_specs += [pl.BlockSpec((1, n_rows, D), xs_map,
                                      memory_space=pltpu.VMEM)]
            args += [jnp.asarray(xb).reshape(1, n_rows, D)]

    # fused pre-LN of the prologue's hidden state (``ln`` = (gamma, beta,
    # eps)) and fused residual add into the proj epilogue (``residual``
    # [B, N] or [B, 1, N]) — the small-op-floor fusions (round-3): each
    # removes one elementwise dispatch per layer per step
    with_ln = ln is not None
    ln_eps = 0.0
    if with_ln:
        assert with_xq or with_xqkv, \
            "fused LN applies to the q(kv) prologue's hidden state"
        lng, lnb, ln_eps = ln
        dm = q.shape[-1]

        def ln_map(b, c, lref, sref, stref, kref, tref):
            return (0, 0)

        in_specs += [pl.BlockSpec((1, dm), ln_map, memory_space=pltpu.VMEM),
                     pl.BlockSpec((1, dm), ln_map, memory_space=pltpu.VMEM)]
        args += [jnp.asarray(lng).reshape(1, dm),
                 jnp.asarray(lnb).reshape(1, dm)]
    with_res = residual is not None
    if with_res:
        assert with_proj, "fused residual applies to the proj epilogue"
        res = jnp.asarray(residual).reshape(B, -1)
        assert res.shape[1] == N, (res.shape, N)
        in_specs += [pl.BlockSpec((1, N), o_proj_map,
                                  memory_space=pltpu.VMEM)]
        args += [res]

    if with_xqkv:
        out_spec = [out_spec,
                    pl.BlockSpec((1, H, D), o_map, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, H, D), o_map, memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((B, H, D), full_cache.dtype),
                     jax.ShapeDtypeStruct((B, H, D), full_cache.dtype)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(B, n_chunks),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=(
            [pltpu.VMEM((H, D), full_cache.dtype),   # computed fresh K
             pltpu.VMEM((H, D), full_cache.dtype)]   # computed fresh V
            if with_xqkv else []) + (
            [pltpu.VMEM((H, 1, D), cdt)]             # computed q [H,1,D]
            if (with_xq or with_xqkv) else []) + [
            pltpu.VMEM((H, 1), jnp.float32),   # running max
            pltpu.VMEM((H, 1), jnp.float32),   # running denom
            pltpu.VMEM((H, D), jnp.float32),   # context accumulator
        ],
    )
    kernel = functools.partial(
        _kernel, scale=float(scale), quant=quant, with_fresh=with_fresh,
        with_tail=with_tail, with_proj=with_proj, proj_quant=proj_quant,
        proj_bias=proj_bias, proj_nk=proj_nk, with_xq=with_xq,
        xq_quant=xq_quant, xq_bias=xq_bias, with_xqkv=with_xqkv,
        with_res=with_res, with_ln=with_ln, ln_eps=float(ln_eps),
        cache_dt=full_cache.dtype,
        cdt=cdt, cs=cs, n_chunks=n_chunks, s_max=S)
    bytes_cost = 2 * H * D * S * full_cache.dtype.itemsize * B
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * D * S, bytes_accessed=bytes_cost,
            transcendentals=B * H * S),
        interpret=interpret,
    )(layer_arr, seqlen_arr, start_arr, kscale_arr, tlen_arr, *args)
    if with_xqkv:
        attn, fk_out, fv_out = out
        if not with_proj:
            attn = attn[:, :, None, :]
        return attn, fk_out, fv_out
    if with_proj:
        return out                               # [B, N]
    return out[:, :, None, :]
