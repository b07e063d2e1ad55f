"""Fused Pallas decode-attention kernel vs the XLA formulation
(ops.pallas_decode_attention vs ops.attention.cached_decode_attention) —
interpret mode on CPU; the TPU bench exercises the compiled kernel.

Covers the reference decoderMaskedMultiheadAttention semantics grid
(C/tensorrt_llm/kernels/decoderMaskedMultiheadAttention/): cached-only,
deferred-fresh, K-step tail, int8 KV dequant, left-pad start masking."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

jax.config.update("jax_default_device", jax.devices("cpu")[0])

from eddie_wang_hackathon2023_tpu.ops.attention import (
    cached_decode_attention, layer_kv_views, layer_tail_views, merge_tail_kv,
    new_tail_kv, write_tail_kv)
from eddie_wang_hackathon2023_tpu.ops.pallas_decode_attention import (
    fused_decode_attention)

L, B, H, D, S = 3, 2, 4, 8, 32


def mk(dtype=jnp.float32, seed=0):
    rs = np.random.RandomState(seed)
    cache = rs.randn(L, B, 2, H, D, S).astype(np.float32)
    q = rs.randn(B, H, 1, D).astype(np.float32)
    if dtype == jnp.int8:
        cache = np.clip(np.round(cache * 20), -127, 127).astype(np.int8)
    return jnp.asarray(cache, dtype), jnp.asarray(q)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.int8])
@pytest.mark.parametrize("chunk", [None, 8])
def test_cached_only(dtype, chunk):
    """chunk=8 exercises the multi-panel online-softmax path (S=32 -> 4
    chunks) including the clamp-skip of panels past seq_len (seq 7 needs
    only panel 0)."""
    cache, q = mk(dtype)
    seq = jnp.asarray([7, 12], jnp.int32)
    scale = 1.0 / D ** 0.5
    kscale = 0.05 if dtype == jnp.int8 else None
    for l in range(L):
        ref = cached_decode_attention(q, layer_kv_views(cache, l), seq,
                                      scale=scale, kv_quant_orig_scale=kscale)
        out = fused_decode_attention(cache, l, q, seq, scale,
                                     kv_quant_orig_scale=kscale,
                                     chunk=chunk, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_nondivisible_chunk():
    """S not a multiple of the chunk width: the padded edge panel must
    not poison the output (regression: garbage V columns times zero
    probs gave NaN on the real 1500-column cross cache)."""
    rs = np.random.RandomState(1)
    cache = jnp.asarray(rs.randn(L, B, 2, H, D, 20).astype(np.float32))
    q = jnp.asarray(rs.randn(B, H, 1, D).astype(np.float32))
    seq = jnp.asarray([20, 13], jnp.int32)
    scale = 1.0 / D ** 0.5
    for chunk in (8, 16):
        ref = cached_decode_attention(q, layer_kv_views(cache, 0), seq,
                                      scale=scale)
        out = fused_decode_attention(cache, 0, q, seq, scale,
                                     chunk=chunk, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_fresh_and_start_index():
    cache, q = mk()
    rs = np.random.RandomState(3)
    fk = jnp.asarray(rs.randn(B, H, D, 1).astype(np.float32))
    fv = jnp.asarray(rs.randn(B, H, D, 1).astype(np.float32))
    seq = jnp.asarray([9, 5], jnp.int32)
    start = jnp.asarray([2, 0], jnp.int32)
    scale = 1.0 / D ** 0.5
    for l in range(L):
        ref = cached_decode_attention(q, layer_kv_views(cache, l), seq,
                                      scale=scale, fresh_kv=(fk, fv),
                                      start_index=start)
        out = fused_decode_attention(cache, l, q, seq, scale,
                                     fresh_kv=(fk, fv), start_index=start,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.int8])
@pytest.mark.parametrize("tail_len", [0, 2, 3])
@pytest.mark.parametrize("chunk", [None, 8])
def test_tail_mode(dtype, tail_len, chunk):
    """K-step deferred tail: kernel == XLA op == semantics of a merged
    cache."""
    KT = 4
    cache, q = mk(dtype)
    rs = np.random.RandomState(7)
    tail = rs.randn(KT, L, B, 2, H, D).astype(np.float32)
    fkv = rs.randn(2, B, H, D, 1).astype(np.float32)
    if dtype == jnp.int8:
        tail = np.clip(np.round(tail * 20), -127, 127).astype(np.int8)
        fkv = np.clip(np.round(fkv * 20), -127, 127).astype(np.int8)
    tail = jnp.asarray(tail, dtype)
    fk, fv = (jnp.asarray(fkv[0], dtype), jnp.asarray(fkv[1], dtype))
    cache_lens = np.asarray([6, 11])
    seq = jnp.asarray(cache_lens + tail_len + 1, jnp.int32)
    tl = jnp.asarray(tail_len, jnp.int32)
    scale = 1.0 / D ** 0.5
    kscale = 0.05 if dtype == jnp.int8 else None
    for l in range(L):
        tk, tv = layer_tail_views(tail, l)
        ref = cached_decode_attention(q, layer_kv_views(cache, l), seq,
                                      scale=scale, kv_quant_orig_scale=kscale,
                                      fresh_kv=(fk, fv),
                                      tail_kv=(tk, tv, tl))
        out = fused_decode_attention(cache, l, q, seq, scale,
                                     kv_quant_orig_scale=kscale,
                                     fresh_kv=(fk, fv), tail_kv=(tail, tl),
                                     chunk=chunk, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_tail_equals_merged_cache():
    """Attention over (cache, tail, fresh) == attention over the cache
    after write_tail_kv + merge_tail_kv — the invariant the decode loop
    relies on."""
    KT = 4
    cache, q = mk()
    rs = np.random.RandomState(11)
    cache_len = 10
    seq0 = cache_len
    tail = new_tail_kv(cache, KT)
    merged = cache
    for step in range(KT):
        kv_new = jnp.asarray(rs.randn(L, B, 2, H, D).astype(np.float32))
        tail = write_tail_kv(tail, kv_new, step)
    merged = merge_tail_kv(cache, tail, cache_len)
    fk = jnp.asarray(rs.randn(B, H, D, 1).astype(np.float32))
    fv = jnp.asarray(rs.randn(B, H, D, 1).astype(np.float32))
    seq = jnp.full((B,), seq0 + KT + 1, jnp.int32)
    scale = 1.0 / D ** 0.5
    for l in range(L):
        tk, tv = layer_tail_views(tail, l)
        via_tail = cached_decode_attention(
            q, layer_kv_views(cache, l), seq, scale=scale,
            fresh_kv=(fk, fv), tail_kv=(tk, tv, jnp.asarray(KT, jnp.int32)))
        via_merge = cached_decode_attention(
            q, layer_kv_views(merged, l), seq, scale=scale,
            fresh_kv=(fk, fv))
        np.testing.assert_allclose(np.asarray(via_tail),
                                   np.asarray(via_merge),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("quant_w", [True, False])
def test_fused_out_projection(quant_w):
    """proj= epilogue (the fused dense GEMV): kernel output must equal
    context -> merge-heads -> weight_only_quant_matmul / matmul + bias,
    for the cross (cached-only, int8 cache) and self (fresh+tail) modes."""
    from eddie_wang_hackathon2023_tpu.ops.quant_matmul import (
        quantize_weights_int8, weight_only_quant_matmul)
    N = H * D
    rs = np.random.RandomState(5)
    w = rs.randn(N, N).astype(np.float32) * 0.1
    bias = rs.randn(N).astype(np.float32) * 0.1
    if quant_w:
        qw, sc = quantize_weights_int8(w)
        proj = (jnp.asarray(qw), jnp.asarray(sc), jnp.asarray(bias))

        def dense(x):
            out = weight_only_quant_matmul(x, jnp.asarray(qw),
                                           jnp.asarray(sc))
            return out + jnp.asarray(bias, out.dtype)
    else:
        wj = jnp.asarray(w)
        proj = (wj.T, None, jnp.asarray(bias))

        def dense(x):
            return jnp.matmul(
                x, wj.T,
                preferred_element_type=jnp.float32).astype(x.dtype) \
                + jnp.asarray(bias, x.dtype)

    def merge(ctx):
        return ctx.transpose(0, 2, 1, 3).reshape(B, 1, N)

    # cross: int8 cache, cached-only
    cache, q = mk(jnp.int8)
    seq = jnp.asarray([S, S], jnp.int32)
    scale, kscale = 1.0 / D ** 0.5, 0.05
    ctx = fused_decode_attention(cache, 1, q, seq, scale,
                                 kv_quant_orig_scale=kscale, interpret=True)
    ref = dense(merge(ctx)).reshape(B, N)
    out = fused_decode_attention(cache, 1, q, seq, scale,
                                 kv_quant_orig_scale=kscale, proj=proj,
                                 interpret=True)
    assert out.shape == (B, N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # STACKED weight [L, K, N] (scan-hoisted form): the index_map must
    # pick layer_idx's panel — fill other layers with garbage to prove it
    wstack = jnp.stack([jnp.full_like(proj[0], 99 if quant_w else 99.0),
                        proj[0],
                        jnp.full_like(proj[0], -5 if quant_w else -5.0)])
    out_st = fused_decode_attention(cache, 1, q, seq, scale,
                                    kv_quant_orig_scale=kscale,
                                    proj=(wstack,) + proj[1:],
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(out_st), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # self: float cache, fresh + tail
    cache, q = mk(jnp.float32, seed=7)
    rs2 = np.random.RandomState(8)
    tail = jnp.asarray(rs2.randn(4, L, B, 2, H, D).astype(np.float32))
    fk = jnp.asarray(rs2.randn(B, H, D, 1).astype(np.float32))
    fv = jnp.asarray(rs2.randn(B, H, D, 1).astype(np.float32))
    seq = jnp.asarray([13, 9], jnp.int32)
    tlen = jnp.asarray(2, jnp.int32)
    ctx = fused_decode_attention(cache, 0, q, seq, scale, fresh_kv=(fk, fv),
                                 tail_kv=(tail, tlen), interpret=True)
    ref = dense(merge(ctx)).reshape(B, N)
    out = fused_decode_attention(cache, 0, q, seq, scale, fresh_kv=(fk, fv),
                                 tail_kv=(tail, tlen), proj=proj,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_out_projection_float_dense():
    """proj= epilogue with a FLOAT dense weight (the bf16/f32 fusion):
    the layer pre-swaps the Linear-native [N, K] minors to the kernel's
    [K, N] contract — must equal the XLA dense, single and stacked
    (index-map-selected) weights.  (An in-kernel "nk" layout was deleted:
    its [1,N,H,D] VMEM panel padded (20,64)->(24,128) and OOM'd scoped
    VMEM on device.)"""
    N = H * D
    rs = np.random.RandomState(11)
    w = rs.randn(N, N).astype(np.float32) * 0.1   # [N, K] row-major
    bias = rs.randn(N).astype(np.float32) * 0.1
    wj = jnp.swapaxes(jnp.asarray(w), -1, -2)     # layer-side swap
    cache, q = mk(jnp.int8)
    seq = jnp.asarray([S, S], jnp.int32)
    scale, kscale = 1.0 / D ** 0.5, 0.05
    ctx = fused_decode_attention(cache, 1, q, seq, scale,
                                 kv_quant_orig_scale=kscale, interpret=True)
    merged = ctx.transpose(0, 2, 1, 3).reshape(B, 1, N)
    ref = (jnp.matmul(merged, jnp.asarray(w).T,
                      preferred_element_type=jnp.float32)
           .astype(merged.dtype) + jnp.asarray(bias, merged.dtype))
    out = fused_decode_attention(cache, 1, q, seq, scale,
                                 kv_quant_orig_scale=kscale,
                                 proj=(wj, None, jnp.asarray(bias)),
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref.reshape(B, N)),
                               rtol=2e-5, atol=2e-5)
    wstack = jnp.stack([jnp.full_like(wj, 99.0), wj,
                        jnp.full_like(wj, -5.0)])
    out_st = fused_decode_attention(
        cache, 1, q, seq, scale, kv_quant_orig_scale=kscale,
        proj=(wstack, None, jnp.asarray(bias)), interpret=True)
    np.testing.assert_allclose(np.asarray(out_st),
                               np.asarray(ref.reshape(B, N)),
                               rtol=2e-5, atol=2e-5)




def test_beam_indirect_matches_gather_formulation():
    """beam_indirect_decode_attention (masked cross-beam scores, no
    materialised reorder) must match gathering the cache with
    take_along_axis and running the plain op — int8 and f32 caches,
    ragged lengths, left-pad start, with and without fresh KV."""
    from eddie_wang_hackathon2023_tpu.ops.attention import (
        beam_indirect_decode_attention, cached_decode_attention)
    BG, BW = 2, 4
    BB = BG * BW
    rs = np.random.RandomState(17)
    for dtype in (jnp.float32, jnp.int8):
        cache = rs.randn(BB, 2, H, D, S).astype(np.float32)
        if dtype == jnp.int8:
            cache = np.clip(np.round(cache * 20), -127, 127).astype(np.int8)
        cache = jnp.asarray(cache, dtype)
        q = jnp.asarray(rs.randn(BB, H, 1, D).astype(np.float32))
        fkv = rs.randn(2, BB, H, D, 1).astype(np.float32)
        if dtype == jnp.int8:
            fkv = np.clip(np.round(fkv * 20), -127, 127).astype(np.int8)
        fk, fv = jnp.asarray(fkv[0], dtype), jnp.asarray(fkv[1], dtype)
        seq = jnp.asarray(rs.randint(4, S, (BB,)), jnp.int32)
        start = jnp.asarray(rs.randint(0, 3, (BB,)), jnp.int32)
        ind = jnp.asarray(rs.randint(0, BW, (BG, BW, S)), jnp.int32)
        kscale = 0.05 if dtype == jnp.int8 else None
        scale = 1.0 / D ** 0.5
        k, v = cache[:, 0], cache[:, 1]
        idx = ind[:, :, None, None, :]
        kk = jnp.take_along_axis(k.reshape(BG, BW, H, D, S), idx,
                                 axis=1).reshape(BB, H, D, S)
        vv = jnp.take_along_axis(v.reshape(BG, BW, H, D, S), idx,
                                 axis=1).reshape(BB, H, D, S)
        for fresh in (None, (fk, fv)):
            ref = cached_decode_attention(
                q, (kk, vv), seq, scale=scale, kv_quant_orig_scale=kscale,
                start_index=start, fresh_kv=fresh)
            got = beam_indirect_decode_attention(
                q, (k, v), seq, ind, scale=scale,
                kv_quant_orig_scale=kscale, start_index=start,
                fresh_kv=fresh)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.int8])
@pytest.mark.parametrize("chunk", [None, 8])
def test_beam_kernel_matches_xla_indirection(dtype, chunk):
    """The in-kernel cache_indirection (beam mode of
    fused_decode_attention, _beam_kernel) must match the XLA masked
    cross-beam-score formulation — int8 and f32 caches, multi-chunk
    online softmax, left-pad start, group-uniform lengths (the kernel
    contract: beams advance together)."""
    from eddie_wang_hackathon2023_tpu.ops.attention import (
        beam_indirect_decode_attention)
    BG, BW = 2, 4
    BB = BG * BW
    rs = np.random.RandomState(23)
    for l in range(2):
        cache = rs.randn(L, BB, 2, H, D, S).astype(np.float32)
        if dtype == jnp.int8:
            cache = np.clip(np.round(cache * 20), -127, 127).astype(np.int8)
        cache = jnp.asarray(cache, dtype)
        q = jnp.asarray(rs.randn(BB, H, 1, D).astype(np.float32))
        fkv = rs.randn(2, BB, H, D, 1).astype(np.float32)
        if dtype == jnp.int8:
            fkv = np.clip(np.round(fkv * 20), -127, 127).astype(np.int8)
        fk, fv = jnp.asarray(fkv[0], dtype), jnp.asarray(fkv[1], dtype)
        # group-uniform lengths/starts (rows of a group share them)
        seq = jnp.repeat(jnp.asarray(rs.randint(4, S, (BG,)), jnp.int32),
                         BW)
        start = jnp.repeat(jnp.asarray(rs.randint(0, 3, (BG,)), jnp.int32),
                           BW)
        ind = jnp.asarray(rs.randint(0, BW, (BG, BW, S)), jnp.int32)
        kscale = 0.05 if dtype == jnp.int8 else None
        scale = 1.0 / D ** 0.5
        ref = beam_indirect_decode_attention(
            q, layer_kv_views(cache, l), seq, ind, scale=scale,
            kv_quant_orig_scale=kscale, start_index=start,
            fresh_kv=(fk, fv))
        got = fused_decode_attention(
            cache, l, q, seq, scale, kv_quant_orig_scale=kscale,
            fresh_kv=(fk, fv), start_index=start, beam_indirection=ind,
            chunk=chunk, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_beam_kernel_short_indirection_padded():
    """indirection narrower than S (total_len < S_max cache) pads
    cleanly; positions past seq_len never contribute."""
    from eddie_wang_hackathon2023_tpu.ops.attention import (
        beam_indirect_decode_attention)
    BG, BW = 1, 3
    BB = BG * BW
    rs = np.random.RandomState(29)
    cache = jnp.asarray(rs.randn(L, BB, 2, H, D, S).astype(np.float32))
    q = jnp.asarray(rs.randn(BB, H, 1, D).astype(np.float32))
    fk = jnp.asarray(rs.randn(BB, H, D, 1).astype(np.float32))
    fv = jnp.asarray(rs.randn(BB, H, D, 1).astype(np.float32))
    seq = jnp.full((BB,), 11, jnp.int32)
    ind = jnp.asarray(rs.randint(0, BW, (BG, BW, 16)), jnp.int32)
    scale = 1.0 / D ** 0.5
    ref = beam_indirect_decode_attention(
        q, layer_kv_views(cache, 1), seq, ind, scale=scale,
        fresh_kv=(fk, fv))
    got = fused_decode_attention(
        cache, 1, q, seq, scale, fresh_kv=(fk, fv), beam_indirection=ind,
        chunk=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("hkv", [1, 2])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.int8])
def test_gqa_kernel_matches_xla(hkv, dtype):
    """MQA (1 KV head) and GQA (grouped) decode through the grouped
    kernel vs the XLA grouped/broadcast formulation — fresh K/V, int8
    dequant, left-pad start, multi-chunk."""
    rs = np.random.RandomState(31)
    cache = rs.randn(L, B, 2, hkv, D, S).astype(np.float32)
    if dtype == jnp.int8:
        cache = np.clip(np.round(cache * 20), -127, 127).astype(np.int8)
    cache = jnp.asarray(cache, dtype)
    q = jnp.asarray(rs.randn(B, H, 1, D).astype(np.float32))
    fkv = rs.randn(2, B, hkv, D, 1).astype(np.float32)
    if dtype == jnp.int8:
        fkv = np.clip(np.round(fkv * 20), -127, 127).astype(np.int8)
    fk, fv = jnp.asarray(fkv[0], dtype), jnp.asarray(fkv[1], dtype)
    seq = jnp.asarray([9, 14], jnp.int32)
    start = jnp.asarray([2, 0], jnp.int32)
    kscale = 0.05 if dtype == jnp.int8 else None
    scale = 1.0 / D ** 0.5
    for l in range(L):
        ref = cached_decode_attention(
            q, layer_kv_views(cache, l), seq, scale=scale,
            kv_quant_orig_scale=kscale, start_index=start,
            fresh_kv=(fk, fv))
        got = fused_decode_attention(
            cache, l, q, seq, scale, kv_quant_orig_scale=kscale,
            fresh_kv=(fk, fv), start_index=start, chunk=8,
            interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("hkv", [1, 2])
def test_gqa_kernel_tail_mode(hkv):
    """Grouped kernel with the K-step deferred tail."""
    rs = np.random.RandomState(37)
    cache = jnp.asarray(rs.randn(L, B, 2, hkv, D, S).astype(np.float32))
    q = jnp.asarray(rs.randn(B, H, 1, D).astype(np.float32))
    fk = jnp.asarray(rs.randn(B, hkv, D, 1).astype(np.float32))
    fv = jnp.asarray(rs.randn(B, hkv, D, 1).astype(np.float32))
    kmax, tlen = 4, 3
    tail = jnp.asarray(
        rs.randn(kmax, L, B, 2, hkv, D).astype(np.float32))
    seq = jnp.asarray([12, 15], jnp.int32)
    scale = 1.0 / D ** 0.5
    for l in range(L):
        tk, tv = layer_tail_views(tail, l)
        ref = cached_decode_attention(
            q, layer_kv_views(cache, l), seq, scale=scale,
            fresh_kv=(fk, fv), tail_kv=(tk, tv, tlen))
        got = fused_decode_attention(
            cache, l, q, seq, scale, fresh_kv=(fk, fv),
            tail_kv=(tail, tlen), chunk=8, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
