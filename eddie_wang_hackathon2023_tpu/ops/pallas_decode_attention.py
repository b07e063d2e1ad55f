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
            proj_bias: bool,
            cdt, cs: int, n_chunks: int, s_max: int):
    # positional order: scalar-prefetch refs, input refs, output ref,
    # scratch refs (running max / denom / context accumulator).
    # (Round-3 device A/Bs deleted two prologue modes that once rode here:
    # a fused q-projection (760.6 vs 152.7 ms/utt — the per-head
    # [1,dm]x[dm,D] dot loop is MXU-hostile) and a fused QKV projection
    # (scoped-VMEM compile OOM).  The projections stay in XLA's
    # dequant-GEMM stream; only the OUT-projection epilogue survived its
    # A/B.)
    m_ref, d_ref, acc_ref = rest[-3:]
    o_ref = rest[-4]
    extra = rest[:-4]
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
        # slices + 2D matmuls lower cleanly), summed over heads
        out = None
        for h in range(ctx_a.shape[0]):
            part = jax.lax.dot(
                ctx_a[h:h + 1, :], pw[0, h].astype(cdt),
                preferred_element_type=jnp.float32)        # [1, N]
            out = part if out is None else out + part
        i = 1
        if proj_quant:
            out = out * proj_refs[i][...]
            i += 1
        if proj_bias:
            out = out + proj_refs[i][...]
        o_ref[...] = out.astype(o_ref.dtype)
    b = pl.program_id(0)
    c = pl.program_id(1)
    kscale = kscale_ref[0] if quant else 1.0
    seq_len = seqlen_ref[b]
    cache_len = seq_len - 1 if with_fresh else seq_len
    if with_tail:
        cache_len = cache_len - tlen_ref[0]
    n_need = jnp.maximum(jax.lax.div(cache_len + cs - 1, cs), 1)

    @pl.when(c == 0)
    def _init():
        m_ref[...] = jnp.full(m_ref.shape, NEG, m_ref.dtype)
        d_ref[...] = jnp.zeros(d_ref.shape, d_ref.dtype)
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    def read_q():
        # q rides the whole kernel as [H, 1, D]: Mosaic on this libtpu
        # rejects the [H,D]->[H,1,D] shape cast on packed (bf16) vectors
        # ("infer-vector-layout: unsupported shape cast"), so the unit dim
        # must come from the ref slice, never a reshape
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
        if with_fresh:
            q32 = q_ref[0].astype(jnp.float32)             # [H, 1, D]
            fk_ref, fv_ref = extra[-2], extra[-1]
            fv = fv_ref[0, :, :, 0].astype(jnp.float32)    # [H, D]
            # [H,1,D] x [H,D,1] (contract D, batch H) -> [H,1,1]
            s_f = jax.lax.dot_general(
                q32, fk_ref[0].astype(jnp.float32),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)[:, :, 0] \
                * (scale * kscale)                         # [H, 1]
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


def _beam_kernel(layer_ref, seqlen_ref, start_ref, kscale_ref,
                 q_ref, kv_ref, ind_ref, fk_ref, fv_ref, o_ref,
                 m_ref, d_ref, acc_ref,
                 *, scale: float, quant: bool, bw: int,
                 cdt, cs: int, n_chunks: int, s_max: int):
    """Beam-search decode attention with the cache_indirection applied
    IN-KERNEL (ref gptAttentionCommon.cpp:650 — the CUDA masked-MHA
    kernel composes the indirection into its cache read; this is the
    Pallas equivalent of ops.attention.beam_indirect_decode_attention).

    Grid (groups, chunks): one cell streams ALL ``bw`` physical beam
    rows' [2,H,D,cs] panels of a group ONCE, computes every
    (query-beam x source-beam) score as ``bw`` batched dots with the
    query-beam axis riding the dot's row dimension
    ([H,BW,D] x [H,D,cs] -> [H,BW,cs] — better MXU rows than the
    non-beam kernel's [H,1,D] matvecs), masks the non-selected source
    rows per position with the streamed [BW,cs] indirection panel, and
    runs the flash recurrence per query beam in [H,BW(,D)] scratch.
    The cache is read once per GROUP and nothing is written; selected
    terms match the XLA formulation exactly (masked-out terms are exact
    fp zeros), only the fp32 PV accumulation order differs.

    Beam rows of a group share seq_len/start (generation.py advances
    beams together) — row ``g*bw`` speaks for the group.
    """
    g = pl.program_id(0)
    c = pl.program_id(1)
    kscale = kscale_ref[0] if quant else 1.0
    base = g * bw
    cache_len = seqlen_ref[base] - 1          # fresh token not in cache
    start = start_ref[base]
    n_need = jnp.maximum(jax.lax.div(cache_len + cs - 1, cs), 1)

    @pl.when(c == 0)
    def _init():
        m_ref[...] = jnp.full(m_ref.shape, NEG, m_ref.dtype)
        d_ref[...] = jnp.zeros(d_ref.shape, d_ref.dtype)
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    def read_q():
        # [BW, H, D] -> [H, BW, D]: leading-axis transpose (cheap; the
        # beam axis becomes the dot's row dim)
        return jnp.transpose(q_ref[:, :, 0, :], (1, 0, 2)).astype(cdt)

    @pl.when(c < n_need)
    def _chunk():
        q = read_q()                                        # [H, BW, D]
        ind = ind_ref[0]                                    # [BW, cs]
        pos = c * cs + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, cs), 2)
        valid = jnp.logical_and(pos < cache_len, pos >= start)
        col = None
        if s_max % cs:
            col = c * cs + jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, cs), 2)
        s_sel = jnp.zeros((q.shape[0], bw, cs), jnp.float32)
        for kb in range(bw):
            k = kv_ref[0, kb, 0].astype(cdt)                # [H, D, cs]
            s_all = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)         # [H, BW, cs]
            sel = (ind == kb)[None]                         # [1, BW, cs]
            s_sel = s_sel + jnp.where(sel, s_all, 0.0)
        s = jnp.where(valid, s_sel * (scale * kscale), NEG)
        m_prev = m_ref[...]                                 # [H, BW]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=2))
        p = jnp.where(valid, jnp.exp(s - m_new[:, :, None]), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        d_ref[...] = d_ref[...] * alpha + jnp.sum(p, axis=2)
        ind2 = ind_ref[0]
        pv = jnp.zeros(acc_ref.shape, jnp.float32)          # [H, BW, D]
        for kb in range(bw):
            v = kv_ref[0, kb, 1].astype(cdt)                # [H, D, cs]
            if col is not None:
                v = jnp.where(col < s_max, v, 0)
            p_kb = jnp.where((ind2 == kb)[None], p, 0.0)
            pv = pv + jax.lax.dot_general(
                p_kb.astype(cdt), v,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)         # [H, BW, D]
        acc_ref[...] = acc_ref[...] * alpha[:, :, None] + pv
        m_ref[...] = m_new

    @pl.when(c == n_chunks - 1)
    def _finalize():
        # fresh token: each beam attends its OWN row's fresh K/V (no
        # indirection — the current token belongs to the beam that
        # computed it)
        q32 = jnp.transpose(q_ref[:, :, 0, :], (1, 0, 2)).astype(
            jnp.float32)                                    # [H, BW, D]
        fk = jnp.transpose(fk_ref[:, :, :, 0], (1, 0, 2)).astype(
            jnp.float32)
        fv = jnp.transpose(fv_ref[:, :, :, 0], (1, 0, 2)).astype(
            jnp.float32)
        s_f = jnp.sum(q32 * fk, axis=2) * (scale * kscale)  # [H, BW]
        m = m_ref[...]
        d = d_ref[...]
        m_fin = jnp.maximum(m, s_f)
        alpha = jnp.exp(m - m_fin)
        p_f = jnp.exp(s_f - m_fin)
        denom = d * alpha + p_f
        ctx = (acc_ref[...] * alpha[:, :, None] * kscale
               + fv * (kscale * p_f)[:, :, None]) / denom[:, :, None]
        o_ref[...] = jnp.transpose(ctx, (1, 0, 2)).astype(o_ref.dtype)


def _beam_call(full_cache, layer_idx, q, seq_len, scale,
               kv_quant_orig_scale, fresh_kv, start_index,
               beam_indirection, chunk, interpret):
    """pallas_call assembly for the beam-indirection decode kernel."""
    L, B_kv, _, H, D, S = full_cache.shape
    B = q.shape[0]
    assert B_kv == B, "beam decode needs per-beam physical cache rows"
    bg, bw, s_ind = beam_indirection.shape
    assert bg * bw == B, (beam_indirection.shape, B)
    assert s_ind <= S
    quant = full_cache.dtype in (jnp.int8, jnp.float8_e4m3fn)
    cs = min(chunk or _default_chunk(S), S)
    # VMEM: the kv block holds all bw beams' panels — keep it <= ~4 MB
    itemsize = full_cache.dtype.itemsize
    while bw * 2 * H * D * cs * itemsize > 4 * 1024 * 1024 and cs > 128:
        cs //= 2
    n_chunks = -(-S // cs)

    ind = jnp.asarray(beam_indirection, jnp.int32)
    if s_ind < S:
        ind = jnp.pad(ind, ((0, 0), (0, 0), (0, S - s_ind)))

    layer_arr = jnp.reshape(jnp.asarray(layer_idx, jnp.int32), (1,))
    seqlen_arr = jnp.broadcast_to(
        jnp.asarray(seq_len, jnp.int32).reshape(-1), (B,))
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

    def kv_map(g, c, lref, sref, stref, kref):
        sl = sref[g * bw] - 1
        n_need = jnp.maximum(jax.lax.div(sl + cs - 1, cs), 1)
        return (lref[0], g, 0, 0, 0, jnp.minimum(c, n_need - 1))

    def ind_map(g, c, lref, sref, stref, kref):
        sl = sref[g * bw] - 1
        n_need = jnp.maximum(jax.lax.div(sl + cs - 1, cs), 1)
        return (g, 0, jnp.minimum(c, n_need - 1))

    def q_map(g, c, *refs):
        return (g, 0, 0, 0)

    def o_map(g, c, *refs):
        return (g, 0, 0)

    fk, fv = fresh_kv
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(bg, n_chunks),
        in_specs=[
            pl.BlockSpec((bw, H, 1, D), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bw, 2, H, D, cs), kv_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bw, cs), ind_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bw, H, D, 1), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bw, H, D, 1), q_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bw, H, D), o_map,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H, bw), jnp.float32),     # running max
            pltpu.VMEM((H, bw), jnp.float32),     # running denom
            pltpu.VMEM((H, bw, D), jnp.float32),  # context accumulator
        ],
    )
    cdt = q.dtype if q.dtype in (jnp.float32, jnp.bfloat16) else jnp.bfloat16
    kernel = functools.partial(
        _beam_kernel, scale=float(scale), quant=quant, bw=bw, cdt=cdt,
        cs=cs, n_chunks=n_chunks, s_max=S)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * bw * H * D * S,
            bytes_accessed=2 * H * D * S * itemsize * B,
            transcendentals=B * H * S),
        interpret=interpret,
    )(layer_arr, seqlen_arr, start_arr, kscale_arr, q, full_cache, ind,
      fk, fv)
    return out[:, :, None, :]


def _gqa_kernel(layer_ref, seqlen_ref, start_ref, kscale_ref, tlen_ref,
                q_ref, kv_ref, *rest,
                scale: float, quant: bool, with_tail: bool,
                cdt, cs: int, n_chunks: int, s_max: int):
    """MQA/GQA decode attention: the KV cache keeps its Hkv heads and
    each group of rep = H//Hkv query heads rides the dot's ROW dimension
    ([Hkv,G,D] x [Hkv,D,cs] -> [Hkv,G,cs]) — the cache is streamed once
    with NO materialised head repeat, matching the reference masked-MHA
    kernel's MQA handling (gptAttentionCommon.cpp:650 plumbs
    qkv-per-head counts into one kernel).  Deferred-write decode
    (fresh K/V required), optional K-step tail; same online-softmax
    panel streaming as _kernel."""
    m_ref, d_ref, acc_ref = rest[-3:]
    o_ref = rest[-4]
    extra = rest[:-4]
    b = pl.program_id(0)
    c = pl.program_id(1)
    kscale = kscale_ref[0] if quant else 1.0
    cache_len = seqlen_ref[b] - 1            # fresh token not in cache
    if with_tail:
        cache_len = cache_len - tlen_ref[0]
    n_need = jnp.maximum(jax.lax.div(cache_len + cs - 1, cs), 1)

    @pl.when(c == 0)
    def _init():
        m_ref[...] = jnp.full(m_ref.shape, NEG, m_ref.dtype)
        d_ref[...] = jnp.zeros(d_ref.shape, d_ref.dtype)
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    @pl.when(c < n_need)
    def _chunk():
        q = q_ref[0].astype(cdt)                           # [Hkv, G, D]
        kv = kv_ref[0, 0]                                  # [2,Hkv,D,cs]
        k = kv[0].astype(cdt)
        v = kv[1].astype(cdt)
        if s_max % cs:
            col = c * cs + jax.lax.broadcasted_iota(jnp.int32, v.shape, 2)
            v = jnp.where(col < s_max, v, 0)
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # [Hkv, G, cs]
        s = s * (scale * kscale)
        pos = c * cs + jax.lax.broadcasted_iota(jnp.int32, (1, 1, cs), 2)
        valid = jnp.logical_and(pos < cache_len, pos >= start_ref[b])
        s = jnp.where(valid, s, NEG)
        m_prev = m_ref[...]                                # [Hkv, G]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=2))
        p = jnp.where(valid, jnp.exp(s - m_new[:, :, None]), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        d_ref[...] = d_ref[...] * alpha + jnp.sum(p, axis=2)
        pv = jax.lax.dot_general(
            p.astype(cdt), v,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # [Hkv, G, D]
        acc_ref[...] = acc_ref[...] * alpha[:, :, None] + pv
        m_ref[...] = m_new

    @pl.when(c == n_chunks - 1)
    def _finalize():
        m = m_ref[...]                                     # [Hkv, G]
        d = d_ref[...]
        acc = acc_ref[...]                                 # [Hkv, G, D]
        q32 = q_ref[0].astype(jnp.float32)                 # [Hkv, G, D]
        fk_ref, fv_ref = extra[-2], extra[-1]
        fk = fk_ref[0, :, :, 0].astype(jnp.float32)        # [Hkv, D]
        fv = fv_ref[0, :, :, 0].astype(jnp.float32)
        # [Hkv,G,D] x [Hkv,D,1] (contract D, batch Hkv) -> [Hkv,G]
        s_f = jax.lax.dot_general(
            q32, fk_ref[0].astype(jnp.float32),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, :, 0] * (scale * kscale)
        if with_tail:
            t_ref = extra[0]                  # [Kmax,1,1,2,Hkv,D]
            q = q_ref[0].astype(cdt)
            tk = jnp.transpose(t_ref[:, 0, 0, 0], (1, 0, 2)).astype(cdt)
            tv = jnp.transpose(t_ref[:, 0, 0, 1], (1, 0, 2)).astype(cdt)
            # [Hkv,G,D] x [Hkv,K,D] (contract D, batch Hkv) -> [Hkv,G,K]
            s_t = jax.lax.dot_general(
                q, tk,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * (scale * kscale)
            tpos = jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 2)
            tmask = tpos < tlen_ref[0]
            s_t = jnp.where(tmask, s_t, NEG)
            m_fin = jnp.maximum(jnp.maximum(m, jnp.max(s_t, axis=2)), s_f)
            alpha = jnp.exp(m - m_fin)
            p_t = jnp.where(tmask, jnp.exp(s_t - m_fin[:, :, None]), 0.0)
            p_f = jnp.exp(s_f - m_fin)
            denom = d * alpha + jnp.sum(p_t, axis=2) + p_f
            # [Hkv,G,K] x [Hkv,K,D] (contract K, batch Hkv) -> [Hkv,G,D]
            ctx_t = jax.lax.dot_general(
                p_t.astype(cdt), tv,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            ctx = ((acc * alpha[:, :, None] + ctx_t) * kscale
                   + fv[:, None, :] * (kscale * p_f)[:, :, None])
            o_ref[0] = (ctx / denom[:, :, None]).astype(o_ref.dtype)
            return
        m_fin = jnp.maximum(m, s_f)
        alpha = jnp.exp(m - m_fin)
        p_f = jnp.exp(s_f - m_fin)                         # [Hkv, G]
        denom = d * alpha + p_f
        ctx = (acc * alpha[:, :, None] * kscale
               + fv[:, None, :] * (kscale * p_f)[:, :, None])
        o_ref[0] = (ctx / denom[:, :, None]).astype(o_ref.dtype)


def _gqa_call(full_cache, layer_idx, q, seq_len, scale,
              kv_quant_orig_scale, fresh_kv, start_index, tail_kv,
              chunk, interpret):
    """pallas_call assembly for the MQA/GQA grouped decode kernel."""
    L, B_kv, _, HKV, D, S = full_cache.shape
    B, H = q.shape[0], q.shape[1]
    assert B_kv == B
    rep = H // HKV
    assert rep * HKV == H, (H, HKV)
    quant = full_cache.dtype in (jnp.int8, jnp.float8_e4m3fn)
    cs = min(chunk or _default_chunk(S), S)
    n_chunks = -(-S // cs)
    with_tail = tail_kv is not None

    qg = q[:, :, 0, :].reshape(B, HKV, rep, D)   # heads h = kv*rep + g

    layer_arr = jnp.reshape(jnp.asarray(layer_idx, jnp.int32), (1,))
    seqlen_arr = jnp.broadcast_to(
        jnp.asarray(seq_len, jnp.int32).reshape(-1), (B,))
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

    def kv_map(b, c, lref, sref, stref, kref, tref):
        sl = sref[b] - 1 - (tref[0] if with_tail else 0)
        n_need = jnp.maximum(jax.lax.div(sl + cs - 1, cs), 1)
        return (lref[0], b, 0, 0, 0, jnp.minimum(c, n_need - 1))

    def q_map(b, c, *refs):
        return (b, 0, 0, 0)

    def tail_map(b, c, *refs):
        return (0, refs[0][0], b, 0, 0, 0)

    in_specs = [
        pl.BlockSpec((1, HKV, rep, D), q_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 2, HKV, D, cs), kv_map,
                     memory_space=pltpu.VMEM),
    ]
    args = [qg, full_cache]
    if with_tail:
        in_specs += [pl.BlockSpec((KT, 1, 1, 2, HKV, D), tail_map,
                                  memory_space=pltpu.VMEM)]
        args += [tail_arr]
    fk, fv = fresh_kv
    in_specs += [
        pl.BlockSpec((1, HKV, D, 1), q_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, HKV, D, 1), q_map, memory_space=pltpu.VMEM),
    ]
    args += [fk, fv]

    cdt = q.dtype if q.dtype in (jnp.float32, jnp.bfloat16) else jnp.bfloat16
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(B, n_chunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, HKV, rep, D), q_map,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((HKV, rep), jnp.float32),     # running max
            pltpu.VMEM((HKV, rep), jnp.float32),     # running denom
            pltpu.VMEM((HKV, rep, D), jnp.float32),  # context accumulator
        ],
    )
    kernel = functools.partial(
        _gqa_kernel, scale=float(scale), quant=quant, with_tail=with_tail,
        cdt=cdt, cs=cs, n_chunks=n_chunks, s_max=S)
    itemsize = full_cache.dtype.itemsize
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, HKV, rep, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * D * S // max(rep, 1),
            bytes_accessed=2 * HKV * D * S * itemsize * B,
            transcendentals=B * H * S),
        interpret=interpret,
    )(layer_arr, seqlen_arr, start_arr, kscale_arr, tlen_arr, *args)
    return out.reshape(B, H, 1, D)


def _paged_kernel(layer_ref, table_ref, seqlen_ref, kscale_ref,
                  q_ref, *rest,
                  scale: float, quant: bool, grp: int, t: int,
                  cdt, n_cells: int):
    """Single-token decode attention straight off the BLOCK POOL: the
    reference consumes its paged pointer arrays inside the fused
    attention plugin (D/gpt_attention.md:168-200); here the block table
    rides as a scalar-prefetch argument consumed by the kv BlockSpec
    index maps, so each pool block is DMA'd directly — no gathered
    [B, max_blocks*T, ...] copy ever materialises (the XLA formulation
    pays that gather every layer every step).

    Grid (B, ceil(max_blocks/grp)); each cell receives ``grp`` pool
    blocks through ``grp`` separate block operands (their index maps
    clamp past the valid length, eliding the DMA), concatenates their
    [Hkv, T, D] panels along T and runs one masked online-softmax
    update.  The current token's K/V is already in the pool (serving
    appends before reading — the in-place gpt_attention contract), so
    there is no fresh-KV operand.  MQA/GQA ride the q rows like
    _gqa_kernel ([Hkv, rep, D])."""
    m_ref, d_ref, acc_ref = rest[-3:]
    o_ref = rest[-4]
    kv_refs = rest[:-4]
    b = pl.program_id(0)
    c = pl.program_id(1)
    kscale = kscale_ref[0] if quant else 1.0
    seq = seqlen_ref[b]
    n_need = jnp.maximum(jax.lax.div(seq + t - 1, t), 1)
    cell_need = jax.lax.div(n_need + grp - 1, grp)

    @pl.when(c == 0)
    def _init():
        m_ref[...] = jnp.full(m_ref.shape, NEG, m_ref.dtype)
        d_ref[...] = jnp.zeros(d_ref.shape, d_ref.dtype)
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    @pl.when(c < cell_need)
    def _cell():
        q = q_ref[0].astype(cdt)                       # [Hkv, rep, D]
        k = jnp.concatenate([r[0, 0, 0].astype(cdt) for r in kv_refs],
                            axis=1)                    # [Hkv, grp*T, D]
        v = jnp.concatenate([r[0, 0, 1].astype(cdt) for r in kv_refs],
                            axis=1)
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # [Hkv, rep, grp*T]
        s = s * (scale * kscale)
        pos = c * grp * t + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, grp * t), 2)
        valid = pos < seq
        s = jnp.where(valid, s, NEG)
        m_prev = m_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=2))
        p = jnp.where(valid, jnp.exp(s - m_new[:, :, None]), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        d_ref[...] = d_ref[...] * alpha + jnp.sum(p, axis=2)
        pv = jax.lax.dot_general(
            p.astype(cdt), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # [Hkv, rep, D]
        acc_ref[...] = acc_ref[...] * alpha[:, :, None] + pv
        m_ref[...] = m_new

    @pl.when(c == n_cells - 1)
    def _finalize():
        ctx = acc_ref[...] * (kscale / d_ref[...])[:, :, None]
        o_ref[0] = ctx.astype(o_ref.dtype)


def paged_decode_attention_pallas(full_pool, layer_idx, q, block_table,
                                  seq_len, scale: float,
                                  kv_quant_orig_scale=None,
                                  blocks_per_cell: int = 0,
                                  interpret: bool = False):
    """q [B, H, 1, D] against the STACKED block pool
    [L, N, 2, Hkv, T, D] via block_table [B, max_blocks] (int32, -1
    padded); seq_len [B] INCLUDING the current token (already appended
    to the pool).  Returns [B, H, 1, D].  See _paged_kernel."""
    L, N, _, HKV, T, D = full_pool.shape
    B, H = q.shape[0], q.shape[1]
    MB = block_table.shape[1]
    rep = H // HKV
    assert rep * HKV == H, (H, HKV)
    quant = full_pool.dtype in (jnp.int8, jnp.float8_e4m3fn)
    if not interpret:
        from .._utils import runtime_platform
        interpret = runtime_platform() != "tpu"
    grp = blocks_per_cell or max(1, min(MB, 512 // T))
    n_cells = -(-MB // grp)

    qg = q[:, :, 0, :].reshape(B, HKV, rep, D)
    layer_arr = jnp.reshape(jnp.asarray(layer_idx, jnp.int32), (1,))
    table_arr = jnp.asarray(block_table, jnp.int32).reshape(-1)  # [B*MB]
    seqlen_arr = jnp.broadcast_to(
        jnp.asarray(seq_len, jnp.int32).reshape(-1), (B,))
    if kv_quant_orig_scale is None:
        kscale_arr = jnp.ones((1,), jnp.float32)
    else:
        kscale_arr = jnp.asarray(kv_quant_orig_scale,
                                 jnp.float32).reshape(-1)[:1]

    def mk_kv_map(i):
        def kv_map(b, c, lref, tref, sref, kref):
            sl = sref[b]
            n_need = jnp.maximum(jax.lax.div(sl + T - 1, T), 1)
            blk_i = jnp.minimum(c * grp + i, n_need - 1)
            blk = tref[b * MB + jnp.minimum(blk_i, MB - 1)]
            return (lref[0], jnp.maximum(blk, 0), 0, 0, 0, 0)
        return kv_map

    def q_map(b, c, *refs):
        return (b, 0, 0, 0)

    in_specs = [pl.BlockSpec((1, HKV, rep, D), q_map,
                             memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec((1, 1, 2, HKV, T, D), mk_kv_map(i),
                              memory_space=pltpu.VMEM)
                 for i in range(grp)]
    cdt = q.dtype if q.dtype in (jnp.float32, jnp.bfloat16) else jnp.bfloat16
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, n_cells),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, HKV, rep, D), q_map,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((HKV, rep), jnp.float32),
            pltpu.VMEM((HKV, rep), jnp.float32),
            pltpu.VMEM((HKV, rep, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _paged_kernel, scale=float(scale), quant=quant, grp=grp, t=T,
        cdt=cdt, n_cells=n_cells)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, HKV, rep, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * D * MB * T // max(rep, 1),
            bytes_accessed=2 * HKV * T * D * MB
            * full_pool.dtype.itemsize * B,
            transcendentals=B * H * MB * T),
        interpret=interpret,
    )(layer_arr, table_arr, seqlen_arr, kscale_arr, qg,
      *([full_pool] * grp))
    return out.reshape(B, H, 1, D)


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
                           beam_indirection=None,
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
    (Two PROLOGUE fusions — a q-projection ``xq=`` and a full QKV
    projection ``xqkv=`` — were built, measured on device in round 3 and
    DELETED: the per-head [1,dm]x[dm,D] prologue dot loop ran the
    large-v2 utterance at 760.6 ms vs 152.7 ms with the projection left
    to XLA's dequant-GEMM, and the stacked QKV weight blew the 16 MiB
    scoped-VMEM compile limit.  Input projections belong to XLA; only
    the out-projection epilogue survived its A/B.)
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
    if not interpret:
        from .._utils import runtime_platform
        _interp = runtime_platform() != "tpu"
    else:
        _interp = True
    if beam_indirection is not None:
        # beam-search mode (ref cache_indirection, gptAttentionCommon
        # :650): the [G, beam, S] physical-row map is applied to the
        # streamed panels in-kernel — see _beam_kernel.  Orthogonal
        # prologue/epilogue fusions are out of scope for beams (XLA's
        # batched GEMV amortises the proj weight across beam rows).
        assert tail_kv is None, "K-step tail not supported with beams"
        assert proj is None, "out-proj fusion is batch-1 only"
        assert fresh_kv is not None, \
            "beam decode is deferred-write only (fresh K/V required)"
        return _beam_call(full_cache, layer_idx, q, seq_len, scale,
                          kv_quant_orig_scale, fresh_kv, start_index,
                          beam_indirection, chunk, _interp)
    L, B_kv, _, H, D, S = full_cache.shape
    B = q.shape[0]
    if q.shape[1] != H:
        # MQA/GQA: query heads outnumber the cache's KV heads — the
        # grouped kernel rides each KV head's rep query heads on the
        # dot's row dimension (no materialised head repeat; see
        # _gqa_kernel).  Out-proj fusion is equal-heads only.
        assert proj is None, "out-proj fusion is equal-heads only"
        assert fresh_kv is not None, \
            "grouped decode is deferred-write only (fresh K/V required)"
        assert B_kv == B
        return _gqa_call(full_cache, layer_idx, q, seq_len, scale,
                         kv_quant_orig_scale, fresh_kv, start_index,
                         tail_kv, chunk, _interp)
    # group-shared cache: beam/best_of rows may SHARE one audio's cross
    # KV — the cache batch divides the query batch and the index map
    # folds each query row onto its group's physical rows (the cache is
    # never replicated; a jnp.repeat'd cross cache cost beam x the
    # cross-KV HBM read every step)
    assert B % B_kv == 0, (B, B_kv)
    kvg = B // B_kv
    quant = full_cache.dtype in (jnp.int8, jnp.float8_e4m3fn)
    with_fresh = fresh_kv is not None
    with_tail = tail_kv is not None
    assert kvg == 1 or not (with_fresh or with_tail), \
        "group-shared cache is cached-only (cross attention)"
    assert not (with_tail and not with_fresh), \
        "tail mode requires fresh K/V"
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
        return (lref[0], b // kvg, 0, 0, 0, jnp.minimum(c, n_need - 1))

    def q_map(b, c, lref, sref, stref, kref, tref):
        return (b, 0, 0, 0)

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
        pl.BlockSpec((1, H, 1, D), q_map, memory_space=pltpu.VMEM),
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
    if with_proj:
        pw, pscale, pbias = proj
        N = pw.shape[-1]
        assert pw.shape[-2] == H * D, \
            f"proj weight [..., {H*D}, N], got {pw.shape}"
        # [K, N] per-layer slice, or the FULL stacked [L, K, N] weight:
        # a stacked operand + layer index_map makes the layer panel a
        # direct HBM->VMEM DMA — passing the slice instead costs a
        # materialised per-layer HBM copy every step (profiled 0.24
        # ms/step as constant_dynamic-slice fusions on large-v2).
        # Float dense weights arrive pre-swapped to [.., K, N] by the
        # layer (a loop-invariant swapaxes XLA hoists) — an in-kernel
        # [N, K] "nk" layout was measured and deleted: its [1, N, H, D]
        # VMEM panel padded (20,64)->(24,128) and OOM'd scoped VMEM.
        pw = pw.reshape(-1, H, D, N)             # free view: K contiguous
        stacked_w = pw.shape[0] > 1
        proj_quant = pscale is not None
        proj_bias = pbias is not None

        def w_map(b, c, lref, sref, stref, kref, tref):
            return (lref[0] if stacked_w else 0, 0, 0, 0)

        def s_map(b, c, lref, sref, stref, kref, tref):
            return (0, 0)

        in_specs += [pl.BlockSpec(
            (1, H, D, N), w_map,
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(B, n_chunks),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((H, 1), jnp.float32),   # running max
            pltpu.VMEM((H, 1), jnp.float32),   # running denom
            pltpu.VMEM((H, D), jnp.float32),   # context accumulator
        ],
    )
    kernel = functools.partial(
        _kernel, scale=float(scale), quant=quant, with_fresh=with_fresh,
        with_tail=with_tail, with_proj=with_proj, proj_quant=proj_quant,
        proj_bias=proj_bias,
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
    if with_proj:
        return out                               # [B, N]
    return out[:, :, None, :]
