"""Generation-level token parity vs HuggingFace
``WhisperForConditionalGeneration.generate()`` (random weights, real vocab,
real filter stacks) — the strongest WER-adjacent evidence available without
a downloadable checkpoint (ref summarize.py WER table, README.md:166-174):
if every sampled token matches HF's reference implementation end-to-end
through the suppress/begin-suppress/timestamp processors, the decode loop
is transcription-equivalent for given weights."""
import jax
import numpy as np
import pytest
import torch

from eddie_wang_hackathon2023_tpu.models.whisper import (
    WhisperConfig, hf_to_openai_state_dict, load_openai_state_dict)
from eddie_wang_hackathon2023_tpu.models.whisper.pipeline import (
    DecodingOptions, WhisperPipeline)

CFG = WhisperConfig(n_mels=80, n_vocab=51865, n_audio_ctx=60,
                    n_audio_state=64, n_audio_head=4, n_audio_layer=2,
                    n_text_ctx=48, n_text_state=64, n_text_head=4,
                    n_text_layer=2, dtype="float32")
EOT = 50257
SAMPLE_LEN = 12


@pytest.fixture(scope="module")
def hf_gen_model():
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration
    torch.manual_seed(3)
    cfg = HFConfig(
        vocab_size=CFG.n_vocab, num_mel_bins=CFG.n_mels,
        encoder_layers=CFG.n_audio_layer,
        encoder_attention_heads=CFG.n_audio_head,
        decoder_layers=CFG.n_text_layer,
        decoder_attention_heads=CFG.n_text_head,
        d_model=CFG.n_audio_state, decoder_ffn_dim=4 * CFG.n_text_state,
        encoder_ffn_dim=4 * CFG.n_audio_state,
        max_source_positions=CFG.n_audio_ctx,
        max_target_positions=CFG.n_text_ctx,
        activation_function="gelu", init_std=0.06,
        pad_token_id=EOT, bos_token_id=EOT, eos_token_id=EOT,
        decoder_start_token_id=50258)
    return WhisperForConditionalGeneration(cfg).eval()


@pytest.fixture(scope="module")
def mel():
    return np.random.RandomState(11).randn(
        1, CFG.n_mels, CFG.n_audio_ctx * 2).astype(np.float32) * 0.5


def _our_pipeline(hf_gen_model, without_timestamps):
    sd = hf_to_openai_state_dict(hf_gen_model.model.state_dict())
    enc, dec, ckv = load_openai_state_dict(sd, CFG)
    pipe = WhisperPipeline(
        CFG, enc, dec, ckv,
        DecodingOptions(language="en", sample_len=SAMPLE_LEN,
                        without_timestamps=without_timestamps))
    pipe.bind_params()
    return pipe


def _hf_tokens(hf_gen_model, pipe, mel, **gen_kw):
    tok = pipe.tokenizer
    init = list(pipe.initial_tokens)
    with torch.no_grad():
        out = hf_gen_model.generate(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.tensor([init]),
            do_sample=False, num_beams=1, max_new_tokens=SAMPLE_LEN,
            suppress_tokens=list(pipe._get_suppress_tokens()),
            begin_suppress_tokens=tok.encode(" ") + [tok.eot],
            **gen_kw)
    got = [int(t) for t in out[0]]
    # strip the echoed prompt if generate returns it
    if got[:len(init)] == init:
        got = got[len(init):]
    if EOT in got:
        got = got[:got.index(EOT)]
    return got


def _our_tokens(pipe, mel):
    res = pipe.transcribe(mel)[0]
    return [int(t) for t in res.tokens]


def test_generate_parity_no_timestamps(hf_gen_model, mel):
    pipe = _our_pipeline(hf_gen_model, without_timestamps=True)
    ours = _our_tokens(pipe, mel)
    hf = _hf_tokens(hf_gen_model, pipe, mel, return_timestamps=False)
    assert ours == hf, (ours, hf)


def test_generate_parity_with_timestamp_rules(hf_gen_model, mel):
    """The timestamp logit state machine (pairing / non-decreasing /
    initial bound / prob-sum rules) against HF's
    WhisperTimeStampLogitsProcessor."""
    pipe = _our_pipeline(hf_gen_model, without_timestamps=False)
    tok = pipe.tokenizer
    gc = hf_gen_model.generation_config
    gc.no_timestamps_token_id = tok.no_timestamps
    gc.max_initial_timestamp_index = pipe.max_initial_timestamp_index
    gc.prev_sot_token_id = tok.sot_prev
    gc.decoder_start_token_id = tok.sot
    ours = _our_tokens(pipe, mel)
    hf = _hf_tokens(
        hf_gen_model, pipe, mel, return_timestamps=True)
    # HF strips trailing timestamp pairs differently in some versions —
    # compare the common prefix through the last shared token, requiring
    # full agreement over ours
    assert ours == hf[:len(ours)], (ours, hf)
    assert len(ours) >= min(len(hf), SAMPLE_LEN) - 2


def test_generate_parity_batch3(hf_gen_model):
    pipe = _our_pipeline(hf_gen_model, without_timestamps=True)
    mels = np.random.RandomState(5).randn(
        3, CFG.n_mels, CFG.n_audio_ctx * 2).astype(np.float32) * 0.5
    ours = [r.tokens for r in pipe.transcribe(mels)]
    for i in range(3):
        hf = _hf_tokens(hf_gen_model, pipe, mels[i:i + 1],
                        return_timestamps=False)
        assert [int(t) for t in ours[i]] == hf, (i, ours[i], hf)
