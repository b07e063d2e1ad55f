"""Whisper model vs HuggingFace transformers golden (random weights, tiny
dims) — the reference validates whole models against HF outputs
(tests/model/test_gpt.py pattern); Whisper itself was only WER-validated
(E/whisper/summarize.py), we do better with an exact numeric golden."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from eddie_wang_hackathon2023_tpu.models.whisper import (
    CrossAttnKV, WhisperConfig, WhisperDecoder, WhisperEncoder,
    hf_to_openai_state_dict, load_openai_state_dict)
from eddie_wang_hackathon2023_tpu.quantization import QuantMode

TINY = WhisperConfig(n_mels=8, n_vocab=100, n_audio_ctx=20, n_audio_state=32,
                     n_audio_head=4, n_audio_layer=2, n_text_ctx=24,
                     n_text_state=32, n_text_head=4, n_text_layer=2,
                     dtype="float32")


@pytest.fixture(scope="module")
def hf_model():
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperModel
    torch.manual_seed(0)
    cfg = HFConfig(
        vocab_size=TINY.n_vocab, num_mel_bins=TINY.n_mels,
        encoder_layers=TINY.n_audio_layer,
        encoder_attention_heads=TINY.n_audio_head,
        decoder_layers=TINY.n_text_layer,
        decoder_attention_heads=TINY.n_text_head,
        d_model=TINY.n_audio_state, decoder_ffn_dim=4 * TINY.n_text_state,
        encoder_ffn_dim=4 * TINY.n_audio_state,
        max_source_positions=TINY.n_audio_ctx,
        max_target_positions=TINY.n_text_ctx,
        activation_function="gelu",
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1)
    model = WhisperModel(cfg).eval()
    return model


@pytest.fixture(scope="module")
def our_models(hf_model):
    sd = hf_to_openai_state_dict(hf_model.state_dict())
    return load_openai_state_dict(sd, TINY)


def test_encoder_matches_hf(hf_model, our_models):
    enc, _, _ = our_models
    rs = np.random.RandomState(0)
    mel = rs.randn(1, TINY.n_mels, TINY.n_audio_ctx * 2).astype(np.float32)
    with torch.no_grad():
        ref = hf_model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    got = np.asarray(enc(jnp.asarray(mel)))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_decoder_prefill_matches_hf(hf_model, our_models):
    enc, dec, ckv = our_models
    rs = np.random.RandomState(1)
    mel = rs.randn(1, TINY.n_mels, TINY.n_audio_ctx * 2).astype(np.float32)
    tokens = np.array([[5, 17, 42, 7]], dtype=np.int32)
    with torch.no_grad():
        hf_out = hf_model(input_features=torch.from_numpy(mel),
                          decoder_input_ids=torch.from_numpy(tokens.astype(np.int64)))
        hidden = hf_out.last_hidden_state.numpy()
        # tied-embedding logits (ref model.py:290)
        emb = hf_model.decoder.embed_tokens.weight.detach().numpy()
        ref_logits = hidden @ emb.T

    xa = enc(jnp.asarray(mel))
    cross_kv = ckv(xa)
    assert cross_kv.shape == (TINY.n_text_layer, 1, 2, TINY.n_text_head,
                              TINY.head_dim, TINY.n_audio_ctx)
    cache = dec.new_kv_cache(1)
    logits, cache = dec(jnp.asarray(tokens), cache, cross_kv,
                        write_index=0,
                        sequence_length=jnp.array([tokens.shape[1]]))
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=2e-3)


def test_decoder_incremental_matches_prefill(hf_model, our_models):
    enc, dec, ckv = our_models
    rs = np.random.RandomState(2)
    mel = rs.randn(1, TINY.n_mels, TINY.n_audio_ctx * 2).astype(np.float32)
    tokens = np.array([[3, 9, 27, 81, 11]], dtype=np.int32)
    xa = enc(jnp.asarray(mel))
    cross_kv = ckv(xa)
    # full prefill
    cache = dec.new_kv_cache(1)
    full_logits, _ = dec(jnp.asarray(tokens), cache, cross_kv, 0,
                         jnp.array([5]))
    # prefill 2 then 3 single steps
    cache = dec.new_kv_cache(1)
    logits, cache = dec(jnp.asarray(tokens[:, :2]), cache, cross_kv, 0,
                        jnp.array([2]))
    outs = [np.asarray(logits)]
    for i in range(2, 5):
        logits, cache = dec(jnp.asarray(tokens[:, i:i + 1]), cache, cross_kv,
                            i, jnp.array([i + 1]))
        outs.append(np.asarray(logits))
    np.testing.assert_allclose(np.concatenate(outs, axis=1),
                               np.asarray(full_logits), atol=2e-3)


def test_weight_only_quantized_decoder_close(hf_model):
    sd = hf_to_openai_state_dict(hf_model.state_dict())
    enc, dec, ckv = load_openai_state_dict(sd, TINY)
    enc_q, dec_q, ckv_q = load_openai_state_dict(
        sd, TINY, quant_mode=QuantMode.use_weight_only())
    rs = np.random.RandomState(3)
    mel = rs.randn(1, TINY.n_mels, TINY.n_audio_ctx * 2).astype(np.float32)
    tokens = np.array([[5, 17, 42]], dtype=np.int32)
    xa = enc(jnp.asarray(mel))
    ref, _ = dec(jnp.asarray(tokens), dec.new_kv_cache(1), ckv(xa), 0,
                 jnp.array([3]))
    xa_q = enc_q(jnp.asarray(mel))
    got, _ = dec_q(jnp.asarray(tokens), dec_q.new_kv_cache(1), ckv_q(xa_q), 0,
                   jnp.array([3]))
    ref, got = np.asarray(ref), np.asarray(got)
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, rel


def test_jitted_decode_step_in_place(hf_model, our_models):
    """The hot path: jitted single-token step with donated cache."""
    enc, dec, ckv = our_models
    rs = np.random.RandomState(4)
    mel = rs.randn(1, TINY.n_mels, TINY.n_audio_ctx * 2).astype(np.float32)
    xa = enc(jnp.asarray(mel))
    cross_kv = ckv(xa)
    state = dec.state_dict()

    @jax.jit
    def step(params, tokens, cache, widx, seqlen):
        return dec.apply(params, tokens, cache, cross_kv, widx, seqlen)

    cache = dec.new_kv_cache(1)
    logits, cache = step(state, jnp.asarray([[7]]), cache, 0, jnp.array([1]))
    logits2, cache = step(state, jnp.asarray([[9]]), cache, 1, jnp.array([2]))
    assert logits.shape == (1, 1, TINY.n_vocab)
    assert cache.shape[3:] == (TINY.n_text_head, TINY.head_dim, TINY.n_text_ctx)


def test_encoder_pad_once_matches_hf():
    """Pad-once path: at n_audio_ctx >= 128 and not a multiple of 128 the
    encoder carries the sequence padded to 256 through every block with the
    pad masked via valid_len — must be numerically identical to HF's
    unpadded computation (the mask is exact, pad rows never contribute)."""
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperModel
    cfg = WhisperConfig(n_mels=8, n_vocab=100, n_audio_ctx=192,
                        n_audio_state=32, n_audio_head=4, n_audio_layer=2,
                        n_text_ctx=24, n_text_state=32, n_text_head=4,
                        n_text_layer=2, dtype="float32")
    torch.manual_seed(3)
    hf_cfg = HFConfig(
        vocab_size=cfg.n_vocab, num_mel_bins=cfg.n_mels,
        encoder_layers=cfg.n_audio_layer,
        encoder_attention_heads=cfg.n_audio_head,
        decoder_layers=cfg.n_text_layer,
        decoder_attention_heads=cfg.n_text_head,
        d_model=cfg.n_audio_state, decoder_ffn_dim=4 * cfg.n_text_state,
        encoder_ffn_dim=4 * cfg.n_audio_state,
        max_source_positions=cfg.n_audio_ctx,
        max_target_positions=cfg.n_text_ctx,
        activation_function="gelu",
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1)
    hf = WhisperModel(hf_cfg).eval()
    enc, _, _ = load_openai_state_dict(
        hf_to_openai_state_dict(hf.state_dict()), cfg)
    rs = np.random.RandomState(7)
    mel = rs.randn(1, cfg.n_mels, cfg.n_audio_ctx * 2).astype(np.float32)
    with torch.no_grad():
        ref = hf.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    got = np.asarray(enc(jnp.asarray(mel)))
    assert got.shape == ref.shape  # pad sliced back off
    np.testing.assert_allclose(got, ref, atol=2e-4)
