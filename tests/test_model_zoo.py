"""Decoder-only model zoo vs HuggingFace goldens (random weights, tiny
dims) — mirrors the reference's tests/model/test_{gpt,llama,bloom,gptj,
gptneox}.py which compare full-model outputs to HF."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from eddie_wang_hackathon2023_tpu.models.decoder import DecoderLMHead
from eddie_wang_hackathon2023_tpu.models.families import build_from_hf

H, L, HEADS = 32, 2, 4


def _hf(family):
    import transformers as T
    torch.manual_seed(0)
    if family == "gpt2":
        cfg = T.GPT2Config(vocab_size=97, n_positions=64, n_embd=H,
                           n_layer=L, n_head=HEADS)
        return T.GPT2LMHeadModel(cfg).eval()
    if family == "llama":
        cfg = T.LlamaConfig(vocab_size=97, hidden_size=H, intermediate_size=3 * H,
                            num_hidden_layers=L, num_attention_heads=HEADS,
                            max_position_embeddings=64,
                            tie_word_embeddings=False)
        return T.LlamaForCausalLM(cfg).eval()
    if family == "opt":
        cfg = T.OPTConfig(vocab_size=97, hidden_size=H, ffn_dim=4 * H,
                          num_hidden_layers=L, num_attention_heads=HEADS,
                          max_position_embeddings=64, do_layer_norm_before=True,
                          word_embed_proj_dim=H)
        return T.OPTForCausalLM(cfg).eval()
    if family == "bloom":
        cfg = T.BloomConfig(vocab_size=97, hidden_size=H, n_layer=L,
                            n_head=HEADS)
        return T.BloomForCausalLM(cfg).eval()
    if family == "gptj":
        cfg = T.GPTJConfig(vocab_size=97, n_positions=64, n_embd=H, n_layer=L,
                           n_head=HEADS, rotary_dim=8)
        return T.GPTJForCausalLM(cfg).eval()
    if family == "gptneox":
        cfg = T.GPTNeoXConfig(vocab_size=97, hidden_size=H,
                              intermediate_size=4 * H, num_hidden_layers=L,
                              num_attention_heads=HEADS,
                              max_position_embeddings=64, rotary_pct=0.25)
        return T.GPTNeoXForCausalLM(cfg).eval()
    if family == "llama_gqa":
        # grouped-query attention (LLaMA-2-70B/LLaMA-3 class: 1 < Hkv < H)
        cfg = T.LlamaConfig(vocab_size=97, hidden_size=H, intermediate_size=3 * H,
                            num_hidden_layers=L, num_attention_heads=HEADS,
                            num_key_value_heads=2,
                            max_position_embeddings=64,
                            tie_word_embeddings=False)
        return T.LlamaForCausalLM(cfg).eval()
    if family == "santacoder":
        # GPT-2 + multi-query attention (ref E/gpt/README.md SantaCoder
        # variant; HF gpt_bigcode covers SantaCoder/StarCoder)
        cfg = T.GPTBigCodeConfig(vocab_size=97, n_positions=64, n_embd=H,
                                 n_layer=L, n_head=HEADS, multi_query=True)
        return T.GPTBigCodeForCausalLM(cfg).eval()
    raise ValueError(family)


@pytest.mark.parametrize("family", ["gpt2", "llama", "llama_gqa", "opt",
                                    "bloom", "gptj", "gptneox",
                                    "santacoder"])
def test_family_matches_hf_prefill(family):
    hf = _hf(family)
    model, config = build_from_hf(family.replace("_gqa", ""), hf,
                                  dtype="float32")
    tokens = np.array([[3, 11, 25, 40, 7]], dtype=np.int32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens.astype(np.int64))).logits.numpy()
    cache = model.new_kv_cache(1, 64)
    logits, _ = model(jnp.asarray(tokens), cache, 0,
                      jnp.array([tokens.shape[1]]))
    got = np.asarray(logits)
    atol = 2e-3 if family != "bloom" else 5e-3
    np.testing.assert_allclose(got, ref, atol=atol,
                               err_msg=f"{family} prefill mismatch")


@pytest.mark.parametrize("family", ["gpt2", "llama", "llama_gqa", "gptj",
                                    "santacoder"])
def test_family_incremental_matches_prefill(family):
    hf = _hf(family)
    model, config = build_from_hf(family.replace("_gqa", ""), hf,
                                  dtype="float32")
    tokens = np.array([[3, 11, 25, 40, 7, 2]], dtype=np.int32)
    cache = model.new_kv_cache(1, 64)
    full, _ = model(jnp.asarray(tokens), cache, 0, jnp.array([6]))
    cache = model.new_kv_cache(1, 64)
    logits, cache = model(jnp.asarray(tokens[:, :3]), cache, 0, jnp.array([3]))
    outs = [np.asarray(logits)]
    for i in range(3, 6):
        logits, cache = model(jnp.asarray(tokens[:, i:i + 1]), cache, i,
                              jnp.array([i + 1]))
        outs.append(np.asarray(logits))
    np.testing.assert_allclose(np.concatenate(outs, 1), np.asarray(full),
                               atol=2e-3)


def test_left_padded_batch_matches_unpadded():
    """Ragged prompts via left-padding + attention_start must equal the
    unpadded single-row result."""
    hf = _hf("gpt2")
    model, config = build_from_hf("gpt2", hf, dtype="float32")
    # row0: prompt [5,6,7]; row1: prompt [9] left-padded to length 3
    tokens = np.array([[5, 6, 7], [0, 0, 9]], dtype=np.int32)
    start = jnp.array([0, 2], jnp.int32)
    cache = model.new_kv_cache(2, 32)
    logits, cache = model(jnp.asarray(tokens), cache, 0, jnp.array([3, 3]),
                          attention_start=start)
    # golden rows computed independently without padding
    c0 = model.new_kv_cache(1, 32)
    ref0, _ = model(jnp.asarray([[5, 6, 7]]), c0, 0, jnp.array([3]))
    c1 = model.new_kv_cache(1, 32)
    ref1, _ = model(jnp.asarray([[9]]), c1, 0, jnp.array([1]))
    np.testing.assert_allclose(np.asarray(logits)[0], np.asarray(ref0)[0],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(logits)[1, -1:], np.asarray(ref1)[0],
                               atol=1e-4)
