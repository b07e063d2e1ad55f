"""Layer-level goldens vs torch — mirrors reference ``tests/test_layer.py``
and ``tests/attention/test_gpt_attention.py`` (KV-cache stepping golden)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from eddie_wang_hackathon2023_tpu.layers import (Attention, AttentionMaskType,
                                                 Conv1d, Embedding, GatedMLP,
                                                 Linear, MLP,
                                                 PositionEmbeddingType,
                                                 RowLinear)


def _np(x):
    return np.asarray(x)


def test_linear_matches_torch():
    rs = np.random.RandomState(0)
    lin = Linear(16, 24, dtype="float32")
    lin.weight.value = rs.randn(24, 16).astype(np.float32)
    lin.bias.value = rs.randn(24).astype(np.float32)
    x = rs.randn(3, 5, 16).astype(np.float32)
    ref = torch.nn.functional.linear(
        torch.from_numpy(x), torch.from_numpy(_np(lin.weight.value)),
        torch.from_numpy(_np(lin.bias.value))).numpy()
    np.testing.assert_allclose(_np(lin(jnp.asarray(x))), ref, atol=1e-5)


def test_embedding_gather():
    emb = Embedding(10, 4, dtype="float32")
    emb.weight.value = np.arange(40, dtype=np.float32).reshape(10, 4)
    out = _np(emb(jnp.asarray([[1, 3]])))
    np.testing.assert_array_equal(out[0, 0], [4, 5, 6, 7])
    np.testing.assert_array_equal(out[0, 1], [12, 13, 14, 15])


def _torch_mha(x, wq, bq, wk, bk, wv, bv, wo, bo, n_heads, causal=False,
               kx=None):
    """Explicit torch reference for the attention numerics
    (scores/softmax fp32, scale 1/sqrt(d)) — same math as the reference's
    explicit path (layers/attention.py:363-398)."""
    B, L, D = x.shape
    hd = D // n_heads
    kin = x if kx is None else kx
    q = torch.nn.functional.linear(x, wq, bq).view(B, L, n_heads, hd).transpose(1, 2)
    k = torch.nn.functional.linear(kin, wk, bk).view(B, kin.shape[1], n_heads, hd).transpose(1, 2)
    v = torch.nn.functional.linear(kin, wv, bv).view(B, kin.shape[1], n_heads, hd).transpose(1, 2)
    scores = (q @ k.transpose(-1, -2)) / (hd ** 0.5)
    if causal:
        Lk = kin.shape[1]
        mask = torch.triu(torch.ones(L, Lk, dtype=torch.bool), diagonal=1 + Lk - L)
        scores = scores.masked_fill(mask, float("-inf"))
    probs = torch.softmax(scores, dim=-1)
    ctx = (probs @ v).transpose(1, 2).reshape(B, L, D)
    return torch.nn.functional.linear(ctx, wo, bo)


def _make_attention(d, h, causal, cross=False, rs=None):
    attn = Attention(
        d, h, 64, dtype="float32", cross_attention=cross,
        attention_mask_type=(AttentionMaskType.causal if causal
                             else AttentionMaskType.padding))
    wq = rs.randn(d, d).astype(np.float32)
    wk = rs.randn(d, d).astype(np.float32)
    wv = rs.randn(d, d).astype(np.float32)
    bq = rs.randn(d).astype(np.float32)
    bk = rs.randn(d).astype(np.float32)
    bv = rs.randn(d).astype(np.float32)
    wo = rs.randn(d, d).astype(np.float32)
    bo = rs.randn(d).astype(np.float32)
    hd = d // h
    if cross:
        attn.q_linear.weight.value = wq
        attn.q_linear.bias.value = bq
    else:
        fused = np.stack([wq.reshape(h, hd, d), wk.reshape(h, hd, d),
                          wv.reshape(h, hd, d)], axis=0)
        attn.qkv.weight.value = fused
        attn.qkv.bias.value = np.stack(
            [bq.reshape(h, hd), bk.reshape(h, hd), bv.reshape(h, hd)], axis=0)
    attn.dense.weight.value = wo
    attn.dense.bias.value = bo
    tw = tuple(torch.from_numpy(a) for a in (wq, bq, wk, bk, wv, bv, wo, bo))
    return attn, tw


def test_self_attention_matches_torch_causal():
    rs = np.random.RandomState(1)
    d, h = 32, 4
    attn, (wq, bq, wk, bk, wv, bv, wo, bo) = _make_attention(d, h, True, rs=rs)
    x = rs.randn(2, 6, d).astype(np.float32) * 0.1
    ref = _torch_mha(torch.from_numpy(x), wq, bq, wk, bk, wv, bv, wo, bo, h,
                     causal=True).numpy()
    got = _np(attn(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_cross_attention_matches_torch():
    rs = np.random.RandomState(2)
    d, h = 32, 4
    attn, (wq, bq, wk, bk, wv, bv, wo, bo) = _make_attention(d, h, False,
                                                             cross=True, rs=rs)
    x = rs.randn(1, 3, d).astype(np.float32) * 0.1
    xa = rs.randn(1, 9, d).astype(np.float32) * 0.1
    # precompute cross K/V the way CrossAttn_KV does (model.py:469-555)
    hd = d // h
    k = (torch.from_numpy(xa) @ wk.T + bk).view(1, 9, h, hd).transpose(1, 2)
    v = (torch.from_numpy(xa) @ wv.T + bv).view(1, 9, h, hd).transpose(1, 2)
    cross_kv = jnp.stack([jnp.asarray(k.numpy()), jnp.asarray(v.numpy())], axis=1)
    ref = _torch_mha(torch.from_numpy(x), wq, bq, wk, bk, wv, bv, wo, bo, h,
                     kx=torch.from_numpy(xa)).numpy()
    got = _np(attn(jnp.asarray(x), cross_key_value=cross_kv))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_incremental_decode_matches_full_causal():
    """KV-cache stepping golden — reference test_gpt_attention.py pattern."""
    rs = np.random.RandomState(3)
    d, h, L = 32, 4, 6
    attn, _ = _make_attention(d, h, True, rs=rs)
    x = (rs.randn(1, L, d) * 0.1).astype(np.float32)
    full = _np(attn(jnp.asarray(x)))
    cache = attn.new_kv_cache(1, 16)
    out, cache = attn(jnp.asarray(x[:, :2]), past_key_value=cache,
                      sequence_length=jnp.array([2]), cache_write_index=0,
                      use_cache=True)
    chunks = [_np(out)]
    for i in range(2, L):
        out, cache = attn(jnp.asarray(x[:, i:i + 1]), past_key_value=cache,
                          sequence_length=jnp.array([i + 1]),
                          cache_write_index=i, use_cache=True)
        chunks.append(_np(out))
    np.testing.assert_allclose(np.concatenate(chunks, 1), full, atol=1e-4)


def test_concat_cache_mode_matches_inplace():
    rs = np.random.RandomState(4)
    d, h = 32, 4
    attn, _ = _make_attention(d, h, True, rs=rs)
    x = (rs.randn(1, 4, d) * 0.1).astype(np.float32)
    xstep = (rs.randn(1, 1, d) * 0.1).astype(np.float32)
    # concat mode
    _, present = attn(jnp.asarray(x), use_cache=True)
    out_c, _ = attn(jnp.asarray(xstep), past_key_value=present, use_cache=True)
    # in-place mode
    cache = attn.new_kv_cache(1, 8)
    _, cache = attn(jnp.asarray(x), past_key_value=cache,
                    sequence_length=jnp.array([4]), cache_write_index=0,
                    use_cache=True)
    out_i, _ = attn(jnp.asarray(xstep), past_key_value=cache,
                    sequence_length=jnp.array([5]), cache_write_index=4,
                    use_cache=True)
    np.testing.assert_allclose(_np(out_c), _np(out_i), atol=1e-5)


def test_int8_kv_cache_close_to_fp():
    rs = np.random.RandomState(5)
    d, h = 32, 4
    attn, _ = _make_attention(d, h, True, rs=rs)
    attn_q, _ = _make_attention(d, h, True, rs=np.random.RandomState(5))
    attn_q.use_int8_kv_cache = True
    kv_amax = 8.0  # covers |K|,|V| for these weights (randn W, x*0.1)
    attn_q.kv_orig_quant_scale = __import__(
        "eddie_wang_hackathon2023_tpu").Parameter(
        value=np.asarray([127.0 / kv_amax], np.float32), dtype="float32")
    attn_q.kv_quant_orig_scale = __import__(
        "eddie_wang_hackathon2023_tpu").Parameter(
        value=np.asarray([kv_amax / 127.0], np.float32), dtype="float32")
    x = (rs.randn(1, 5, d) * 0.1).astype(np.float32)
    ref = _np(attn(jnp.asarray(x)))
    cache = attn_q.new_kv_cache(1, 8)
    assert cache.dtype == jnp.int8
    got, cache = attn_q(jnp.asarray(x), past_key_value=cache,
                        sequence_length=jnp.array([5]), cache_write_index=0,
                        use_cache=True)
    # int8 KV introduces bounded quantisation noise (step = amax/127 per
    # element, amplified ~sqrt(d) by the dense projection)
    assert np.abs(_np(got) - ref).max() < 0.5
    assert np.abs(_np(got) - ref).max() / (np.abs(ref).max() + 1e-9) < 0.05


def test_mqa_shapes():
    d, h = 32, 4
    attn = Attention(d, h, 64, dtype="float32", multi_query_mode=True,
                     attention_mask_type=AttentionMaskType.causal)
    attn.random_init(jax.random.PRNGKey(0))
    x = jnp.ones((2, 3, d), jnp.float32)
    out = attn(x)
    assert out.shape == (2, 3, d)
    cache = attn.new_kv_cache(2, 8)
    assert cache.shape == (2, 2, 1, 8, d // h)


def test_rope_attention_runs():
    d, h = 32, 4
    attn = Attention(d, h, 64, dtype="float32",
                     attention_mask_type=AttentionMaskType.causal,
                     position_embedding_type=PositionEmbeddingType.rope)
    attn.random_init(jax.random.PRNGKey(1))
    out = attn(jnp.ones((1, 4, d), jnp.float32))
    assert out.shape == (1, 4, d)


def test_mlp_matches_torch():
    rs = np.random.RandomState(6)
    mlp = MLP(16, 32, hidden_act="gelu", dtype="float32")
    mlp.fc.weight.value = rs.randn(32, 16).astype(np.float32)
    mlp.fc.bias.value = rs.randn(32).astype(np.float32)
    mlp.proj.weight.value = rs.randn(16, 32).astype(np.float32)
    mlp.proj.bias.value = rs.randn(16).astype(np.float32)
    x = rs.randn(2, 3, 16).astype(np.float32)
    xt = torch.from_numpy(x)
    ref = torch.nn.functional.linear(
        torch.nn.functional.gelu(
            torch.nn.functional.linear(
                xt, torch.from_numpy(_np(mlp.fc.weight.value)),
                torch.from_numpy(_np(mlp.fc.bias.value))), approximate="tanh"),
        torch.from_numpy(_np(mlp.proj.weight.value)),
        torch.from_numpy(_np(mlp.proj.bias.value))).numpy()
    np.testing.assert_allclose(_np(mlp(jnp.asarray(x))), ref, atol=1e-4)


def test_gated_mlp_runs():
    m = GatedMLP(16, 32, dtype="float32")
    m.random_init(jax.random.PRNGKey(2))
    assert m(jnp.ones((1, 2, 16))).shape == (1, 2, 16)


def test_alibi_inplace_matches_concat():
    """Regression: the in-place (gpt_attention-plugin) path must apply the
    ALiBi bias exactly like the concat/explicit path does (it was silently
    dropped once; tiny-model HF comparisons couldn't see it at their
    tolerance)."""
    rs = np.random.RandomState(7)
    d, h = 32, 4
    attn = Attention(d, h, 64, dtype="float32",
                     attention_mask_type=AttentionMaskType.causal,
                     position_embedding_type=PositionEmbeddingType.alibi)
    attn.random_init(jax.random.PRNGKey(3), 0.5)
    x = (rs.randn(1, 6, d)).astype(np.float32)
    xstep = (rs.randn(1, 1, d)).astype(np.float32)
    # concat mode (applies alibi in the explicit-math path)
    _, present = attn(jnp.asarray(x), use_cache=True)
    out_c, _ = attn(jnp.asarray(xstep), past_key_value=present,
                    use_cache=True)
    # in-place mode, prefill + one decode step
    cache = attn.new_kv_cache(1, 16)
    pre_i, cache = attn(jnp.asarray(x), past_key_value=cache,
                        sequence_length=jnp.array([6]), cache_write_index=0,
                        use_cache=True)
    out_i, _ = attn(jnp.asarray(xstep), past_key_value=cache,
                    sequence_length=jnp.array([7]), cache_write_index=6,
                    use_cache=True)
    pre_c = attn(jnp.asarray(x))
    np.testing.assert_allclose(_np(pre_c), _np(pre_i), atol=1e-5)
    np.testing.assert_allclose(_np(out_c), _np(out_i), atol=1e-5)
    # and the bias must actually matter at this scale: recompute without
    # alibi and require a visible difference (guards against both paths
    # dropping it in tandem)
    plain = Attention(d, h, 64, dtype="float32",
                      attention_mask_type=AttentionMaskType.causal)
    plain.load_state_dict(dict(attn.state_dict()))
    cache2 = plain.new_kv_cache(1, 16)
    _, cache2 = plain(jnp.asarray(x), past_key_value=cache2,
                      sequence_length=jnp.array([6]), cache_write_index=0,
                      use_cache=True)
    out_p, _ = plain(jnp.asarray(xstep), past_key_value=cache2,
                     sequence_length=jnp.array([7]), cache_write_index=6,
                     use_cache=True)
    assert np.abs(_np(out_p) - _np(out_i)).max() > 1e-3


def test_prompt_tuning_embedding():
    """ref embedding.py:38: ids >= vocab_size gather from the per-task
    prompt table; normal ids from the vocab table."""
    from eddie_wang_hackathon2023_tpu.layers import PromptTuningEmbedding
    rs = np.random.RandomState(9)
    vocab, hid, task_vocab, n_tasks = 10, 4, 3, 2
    emb = PromptTuningEmbedding(vocab, hid, dtype="float32")
    table = rs.randn(vocab, hid).astype(np.float32)
    emb.weight.value = table
    ptable = rs.randn(n_tasks * task_vocab, hid).astype(np.float32)
    # row 0: normal ids; row 1: virtual ids for task 1
    toks = np.array([[1, 5, 9], [10, 11, 12]], np.int32)
    tasks = np.array([[0, 0, 0], [1, 1, 1]], np.int32)
    out = np.asarray(emb(jnp.asarray(toks), jnp.asarray(ptable),
                         jnp.asarray(tasks), task_vocab))
    np.testing.assert_allclose(out[0], table[[1, 5, 9]], atol=1e-6)
    np.testing.assert_allclose(out[1], ptable[[3, 4, 5]], atol=1e-6)
    # without a prompt table it degrades to a plain embedding
    np.testing.assert_allclose(np.asarray(emb(jnp.asarray(toks[:1]))),
                               table[[1, 5, 9]][None], atol=1e-6)
