"""K-step deferred KV-store tail (PluginConfig.decode_tail): the full
decode loops must be TOKEN-EXACT with the tail on vs off — the tail holds
cache-dtype values, so write-then-read and tail-then-merge are bit-equal
(ops.attention write_tail_kv / merge_tail_kv)."""
import jax
import numpy as np

jax.config.update("jax_default_device", jax.devices("cpu")[0])

from eddie_wang_hackathon2023_tpu.plugin import plugin_config


def _rand_load(m, seed):
    rs = np.random.RandomState(seed)
    sd = m.state_dict()
    m.load_state_dict({
        k: ((rs.randn(*np.shape(v)) * 0.05).astype(np.asarray(v).dtype)
            if np.asarray(v).dtype.kind == "f" else v)
        for k, v in sd.items()})


def test_gpt_session_tail_token_exact():
    from eddie_wang_hackathon2023_tpu.models.decoder import (DecoderConfig,
                                                             DecoderLMHead)
    from eddie_wang_hackathon2023_tpu.runtime.generation import (
        GenerationSession, ModelConfig)
    from eddie_wang_hackathon2023_tpu.runtime.sampling import SamplingConfig

    config = DecoderConfig(vocab_size=128, hidden_size=64, num_layers=3,
                           num_heads=4, max_position_embeddings=96)
    model = DecoderLMHead(config)
    model.zeros_init()
    _rand_load(model, 5)
    mc = ModelConfig(vocab_size=128, num_layers=3, num_heads=4,
                     hidden_size=64)
    rs = np.random.RandomState(0)
    ids = rs.randint(0, 128, (2, 11)).astype(np.int32)
    lens = np.asarray([11, 7], np.int32)   # ragged: left-pad + start mask
    outs = {}
    for kt in (0, 4):
        with plugin_config(decode_tail=kt):
            sess = GenerationSession(mc, model,
                                     SamplingConfig(end_id=-1, pad_id=0))
            toks, slens, cum = sess.decode(ids, lens, max_new_tokens=13)
            outs[kt] = (toks.tolist(), slens.tolist(),
                        np.round(cum, 5).tolist())
    assert outs[0] == outs[4]


def test_whisper_pipeline_tail_token_exact():
    from eddie_wang_hackathon2023_tpu.models.whisper import (
        CrossAttnKV, WhisperDecoder, WhisperEncoder, whisper_config)
    from eddie_wang_hackathon2023_tpu.models.whisper.pipeline import (
        DecodingOptions, WhisperPipeline)

    config = whisper_config("tiny", dtype="float32")
    rs = np.random.RandomState(0)
    mel = (rs.randn(1, config.n_mels, 3000) * 0.1).astype(np.float32)
    opts = DecodingOptions(language="en", sample_len=20)
    outs = {}
    for kt in (0, 4):
        with plugin_config(decode_tail=kt):
            enc, dec, ckv = (WhisperEncoder(config), WhisperDecoder(config),
                             CrossAttnKV(config))
            for m in (enc, dec, ckv):
                m.zeros_init()
                _rand_load(m, 1)
            pipe = WhisperPipeline(config, enc, dec, ckv, opts)
            pipe.bind_params()
            res = pipe.transcribe(mel)
            outs[kt] = (res[0].tokens, round(res[0].avg_logprob, 6))
    assert outs[0] == outs[4]
