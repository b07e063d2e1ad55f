"""ChatGLM-6B family: 2D rotary, deepnorm residual, bidirectional-prompt
attention — verified against a from-scratch numpy reference implementing the
semantics of the reference model (T/models/chatglm6b/model.py and the 2D
position scheme of T/runtime/generation.py:1000-1035).  transformers ships no
ChatGLM class, so the golden is handwritten (mirrors how the reference's
chatglm example validates against THUDM modeling code)."""
import math
import types

import jax.numpy as jnp
import numpy as np
import pytest

from eddie_wang_hackathon2023_tpu.models.decoder import DecoderLMHead
from eddie_wang_hackathon2023_tpu.models.families import (chatglm6b_config,
                                                          from_hf_chatglm6b)

HID, LAYERS, HEADS, VOCAB = 32, 2, 4, 61
HEAD_DIM = HID // HEADS                     # 8 -> two rotary halves of 4


def _hf_cfg():
    return types.SimpleNamespace(vocab_size=VOCAB, hidden_size=HID,
                                 num_layers=LAYERS, num_attention_heads=HEADS,
                                 inner_hidden_size=4 * HID,
                                 max_sequence_length=64,
                                 layernorm_epsilon=1e-5)


def _rand_sd(rng):
    """Random weights in THUDM/chatglm-6b state-dict layout."""
    sd = {"transformer.word_embeddings.weight": rng.normal(size=(VOCAB, HID)),
          "transformer.final_layernorm.weight": rng.normal(size=(HID,)),
          "transformer.final_layernorm.bias": rng.normal(size=(HID,)) * 0.1,
          "lm_head.weight": rng.normal(size=(VOCAB, HID))}
    for i in range(LAYERS):
        p = f"transformer.layers.{i}."
        sd.update({
            p + "input_layernorm.weight": rng.normal(size=(HID,)),
            p + "input_layernorm.bias": rng.normal(size=(HID,)) * 0.1,
            p + "attention.query_key_value.weight":
                rng.normal(size=(3 * HID, HID)) / math.sqrt(HID),
            p + "attention.query_key_value.bias": rng.normal(size=(3 * HID,)) * 0.1,
            p + "attention.dense.weight": rng.normal(size=(HID, HID)) / math.sqrt(HID),
            p + "attention.dense.bias": rng.normal(size=(HID,)) * 0.1,
            p + "post_attention_layernorm.weight": rng.normal(size=(HID,)),
            p + "post_attention_layernorm.bias": rng.normal(size=(HID,)) * 0.1,
            p + "mlp.dense_h_to_4h.weight":
                rng.normal(size=(4 * HID, HID)) / math.sqrt(HID),
            p + "mlp.dense_h_to_4h.bias": rng.normal(size=(4 * HID,)) * 0.1,
            p + "mlp.dense_4h_to_h.weight":
                rng.normal(size=(HID, 4 * HID)) / math.sqrt(4 * HID),
            p + "mlp.dense_4h_to_h.bias": rng.normal(size=(HID,)) * 0.1,
        })
    return {k: v.astype(np.float32) for k, v in sd.items()}


# -- numpy golden ------------------------------------------------------------

def _ln(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _gelu(x):
    from scipy.special import erf
    return x * 0.5 * (1.0 + erf(x / math.sqrt(2.0)))


def _rope_half(x, pos, theta=10000.0):
    """Neox-style rotate over the full width of ``x`` (ref rotate_embedding,
    T/models/chatglm6b/model.py:151-175).  x [L, half*2], pos [L]."""
    half = x.shape[-1] // 2
    freqs = 1.0 / theta ** (np.arange(half) / half)
    ang = pos[:, None] * freqs
    cos, sin = np.cos(ang), np.sin(ang)
    x1, x2 = x[..., :half], x[..., half:]
    return np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


def _glm_positions(total_len, plen):
    p = np.arange(total_len)
    pos0 = np.minimum(p, plen - 2)
    pos1 = np.maximum(p - plen + 2, 0)
    return pos0, pos1


def _ref_forward(sd, tokens, plen):
    """Full-sequence forward; tokens [T] where the first plen are the prompt
    (bidirectional) and the rest generated (attend to everything before)."""
    t = len(tokens)
    alpha = (2 * LAYERS) ** 0.5
    x = sd["transformer.word_embeddings.weight"][tokens]
    pos0, pos1 = _glm_positions(t, plen)
    # mask[i, j] = may i attend j
    i, j = np.arange(t)[:, None], np.arange(t)[None, :]
    mask = (j < plen) | (j <= i)
    for l in range(LAYERS):
        p = f"transformer.layers.{l}."
        h = _ln(x, sd[p + "input_layernorm.weight"],
                sd[p + "input_layernorm.bias"])
        qkv = h @ sd[p + "attention.query_key_value.weight"].T + \
            sd[p + "attention.query_key_value.bias"]
        qkv = qkv.reshape(t, HEADS, 3, HEAD_DIM)
        ctx = np.zeros((t, HEADS, HEAD_DIM))
        hh = HEAD_DIM // 2
        for head in range(HEADS):
            q, k, v = qkv[:, head, 0], qkv[:, head, 1], qkv[:, head, 2]
            q = np.concatenate([_rope_half(q[:, :hh], pos0),
                                _rope_half(q[:, hh:], pos1)], -1)
            k = np.concatenate([_rope_half(k[:, :hh], pos0),
                                _rope_half(k[:, hh:], pos1)], -1)
            scores = q @ k.T / math.sqrt(HEAD_DIM)
            scores = np.where(mask, scores, -1e30)
            w = np.exp(scores - scores.max(-1, keepdims=True))
            w = w / w.sum(-1, keepdims=True)
            ctx[:, head] = w @ v
        attn = ctx.reshape(t, HID) @ sd[p + "attention.dense.weight"].T + \
            sd[p + "attention.dense.bias"]
        x = h * alpha + attn
        h2 = _ln(x, sd[p + "post_attention_layernorm.weight"],
                 sd[p + "post_attention_layernorm.bias"])
        mlp = _gelu(h2 @ sd[p + "mlp.dense_h_to_4h.weight"].T +
                    sd[p + "mlp.dense_h_to_4h.bias"]) @ \
            sd[p + "mlp.dense_4h_to_h.weight"].T + sd[p + "mlp.dense_4h_to_h.bias"]
        x = h2 * alpha + mlp
    x = _ln(x, sd["transformer.final_layernorm.weight"],
            sd["transformer.final_layernorm.bias"])
    return x @ sd["lm_head.weight"].T


@pytest.fixture(scope="module")
def glm():
    rng = np.random.default_rng(7)
    sd = _rand_sd(rng)
    config = chatglm6b_config(_hf_cfg(), dtype="float32")
    model = DecoderLMHead(config)
    model.load_state_dict(from_hf_chatglm6b(sd, config), strict=False)
    return sd, model, config


def test_prefill_matches_numpy_reference(glm):
    sd, model, config = glm
    tokens = np.array([5, 9, 2, 33, 60, 17], dtype=np.int32)  # ...gmask sop
    plen = len(tokens)
    ref = _ref_forward(sd, tokens, plen)
    cache = model.new_kv_cache(1, 32)
    logits, _ = model(jnp.asarray(tokens[None]), cache, 0,
                      jnp.full((1,), plen, jnp.int32),
                      context_lengths=jnp.full((1,), plen, jnp.int32))
    np.testing.assert_allclose(np.asarray(logits)[0], ref, rtol=2e-4,
                               atol=2e-4)


def test_incremental_decode_matches_full_recompute(glm):
    sd, model, config = glm
    prompt = np.array([5, 9, 2, 33, 60, 17], dtype=np.int32)
    plen = len(prompt)
    cache = model.new_kv_cache(1, 32)
    ctx = jnp.full((1,), plen, jnp.int32)
    logits, cache = model(jnp.asarray(prompt[None]), cache, 0, ctx,
                          context_lengths=ctx)
    toks = list(prompt)
    for step in range(3):
        nxt = int(np.asarray(logits)[0, -1].argmax())
        cur = plen + step
        logits, cache = model(jnp.asarray([[nxt]], jnp.int32), cache, cur,
                              jnp.full((1,), cur + 1, jnp.int32),
                              context_lengths=ctx)
        toks.append(nxt)
        ref = _ref_forward(sd, np.asarray(toks, np.int32), plen)
        np.testing.assert_allclose(np.asarray(logits)[0, -1], ref[-1],
                                   rtol=2e-4, atol=2e-4)


def test_generation_session_runs_glm(glm):
    _, model, config = glm
    from eddie_wang_hackathon2023_tpu.runtime.generation import (
        GenerationSession, ModelConfig)
    from eddie_wang_hackathon2023_tpu.runtime.sampling import SamplingConfig
    mc = ModelConfig(vocab_size=VOCAB, num_layers=LAYERS, num_heads=HEADS,
                     hidden_size=HID, max_seq_len=32)
    sess = GenerationSession(mc, model, SamplingConfig(end_id=0, pad_id=0,
                                                       temperature=0.0))
    ids = np.array([[5, 9, 2, 33, 60, 17], [0, 0, 7, 21, 60, 17]], np.int32)
    lens = np.array([6, 4], np.int32)
    out, seq_lens, _ = sess.decode(ids, lens, max_new_tokens=4)
    assert out.shape == (2, 1, 10)


def test_glm_continuous_batching(glm):
    """GLM under the continuous-batching manager: needs context_lengths at
    every step; results must match one-at-a-time runs."""
    _, model, config = glm
    from eddie_wang_hackathon2023_tpu.runtime.batch_manager import (
        ContinuousBatchingManager, InferenceRequest)
    from eddie_wang_hackathon2023_tpu.runtime.sampling import SamplingConfig

    prompts = [[5, 9, 2, 33, 60, 17], [7, 21, 60, 17], [1, 2, 3, 60, 17]]

    def run(max_batch):
        queue = [InferenceRequest(i, np.asarray(p, np.int32),
                                  max_new_tokens=5, end_id=0)
                 for i, p in enumerate(prompts)]
        out = {}
        mgr = ContinuousBatchingManager(
            model, SamplingConfig(end_id=0, pad_id=0),
            max_batch_size=max_batch, max_seq_len=32,
            get_inference_requests=lambda n: [queue.pop(0)
                                              for _ in range(min(n, len(queue)))],
            send_response=lambda r: out.__setitem__(r.request_id,
                                                    r.output_ids)
            if r.finished else None)
        mgr.run()
        return out

    batched = run(3)
    solo = run(1)
    assert set(batched) == {0, 1, 2}
    for i in range(3):
        assert batched[i] == solo[i], (i, batched[i], solo[i])
