"""End-to-end quantised Whisper pipeline tests (tiny dims, CPU): the
capability matrix of the reference's run_*.sh scripts — fp16 / weight-only /
int8-kv / combined — must all transcribe through the same pipeline."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eddie_wang_hackathon2023_tpu.models.whisper import (
    CrossAttnKV, WhisperConfig, WhisperDecoder, WhisperEncoder)
from eddie_wang_hackathon2023_tpu.models.whisper.pipeline import (
    DecodingOptions, WhisperPipeline)
from eddie_wang_hackathon2023_tpu.quantization import QuantMode
from eddie_wang_hackathon2023_tpu.quantization.calibration import (
    calibrate_int8_kv)
from eddie_wang_hackathon2023_tpu.quantization.surgery import (
    weight_only_quantize_state)

CFG = WhisperConfig(n_mels=80, n_vocab=51865, n_audio_ctx=60,
                    n_audio_state=64, n_audio_head=4, n_audio_layer=2,
                    n_text_ctx=48, n_text_state=64, n_text_head=4,
                    n_text_layer=2, dtype="float32")


def _fresh_states():
    enc, dec, ckv = (WhisperEncoder(CFG), WhisperDecoder(CFG),
                     CrossAttnKV(CFG))
    enc.random_init(jax.random.PRNGKey(0), 0.05)
    dec.random_init(jax.random.PRNGKey(1), 0.05)
    ckv.random_init(jax.random.PRNGKey(2), 0.05)
    return (enc.state_dict(), dec.state_dict(), ckv.state_dict())


ENC_SD, DEC_SD, CKV_SD = _fresh_states()
MEL = (np.random.RandomState(7)
       .randn(1, CFG.n_mels, CFG.n_audio_ctx * 2).astype(np.float32))


def _pipeline(quant_mode=QuantMode(0), int8_kv_scales=None):
    enc = WhisperEncoder(CFG, quant_mode)
    dec = WhisperDecoder(CFG, quant_mode)
    ckv = CrossAttnKV(CFG)
    enc_sd, dec_sd = dict(ENC_SD), dict(DEC_SD)
    if int8_kv_scales is not None:
        t = np.asarray(int8_kv_scales, np.float32).reshape(-1, 1)
        dec_sd["blocks.attn.kv_orig_quant_scale"] = 1.0 / t
        dec_sd["blocks.attn.kv_quant_orig_scale"] = t
    if quant_mode.is_weight_only():
        enc, enc_sd = weight_only_quantize_state(enc, enc_sd, quant_mode)
        dec, dec_sd = weight_only_quantize_state(dec, dec_sd, quant_mode)
    enc.load_state_dict(enc_sd, strict=False)
    dec.load_state_dict(dec_sd, strict=False)
    ckv.load_state_dict(dict(CKV_SD))
    pipe = WhisperPipeline(CFG, enc, dec, ckv,
                           DecodingOptions(language="en", sample_len=10),
                           quant_mode)
    pipe.bind_params()
    return pipe


@pytest.fixture(scope="module")
def fp_pipe():
    return _pipeline()


@pytest.fixture(scope="module")
def fp_result(fp_pipe):
    return fp_pipe.transcribe(MEL)


def test_fp_baseline(fp_result):
    assert len(fp_result) == 1 and fp_result[0].language == "en"


def test_weight_only_int8_e2e(fp_pipe, fp_result):
    pipe = _pipeline(QuantMode.use_weight_only())
    res = pipe.transcribe(MEL)
    assert isinstance(res[0].text, str)
    # logits of the quantised prefill stay close to float
    xa_f = fp_pipe.get_audio_features(MEL)
    xa_q = pipe.get_audio_features(MEL)
    rel = (np.abs(np.asarray(xa_q) - np.asarray(xa_f)).max()
           / (np.abs(np.asarray(xa_f)).max() + 1e-9))
    assert rel < 0.05, rel


def test_weight_only_int4_e2e():
    pipe = _pipeline(QuantMode.use_weight_only(use_int4_weights=True))
    res = pipe.transcribe(MEL)
    assert isinstance(res[0].text, str)


def test_weight_only_int4_groupwise_e2e(fp_pipe):
    """Group-wise int4 (the quality fix for per-channel int4's coarseness):
    surgery must emit [K/G, N] scales and the encoder output must land at
    least as close to float as the per-channel variant."""
    import os
    mode = QuantMode.use_weight_only(use_int4_weights=True)
    os.environ["EWT_INT4_GROUP"] = "0"
    try:
        pc_pipe = _pipeline(mode)
    finally:
        os.environ["EWT_INT4_GROUP"] = "32"
    try:
        gw_pipe = _pipeline(mode)
    finally:
        del os.environ["EWT_INT4_GROUP"]
    # surgery actually produced group scales (n_text_state=64 -> 2 groups)
    scale = gw_pipe.decoder.blocks.attn.dense.per_channel_scale.value
    assert scale.ndim == 3 and scale.shape[1] == 2, scale.shape
    xa_f = np.asarray(fp_pipe.get_audio_features(MEL))
    err_pc = np.abs(np.asarray(pc_pipe.get_audio_features(MEL)) - xa_f).mean()
    err_gw = np.abs(np.asarray(gw_pipe.get_audio_features(MEL)) - xa_f).mean()
    assert err_gw <= err_pc * 1.05, (err_gw, err_pc)
    res = gw_pipe.transcribe(MEL)
    assert isinstance(res[0].text, str)


def test_int8_kv_cache_e2e(fp_pipe, fp_result):
    # calibrate on the same clip (reference uses valid-clean split)
    scales = calibrate_int8_kv(fp_pipe, [MEL[0]])
    assert scales.shape == (CFG.n_text_layer,) and (scales > 0).all()
    pipe = _pipeline(QuantMode(0).set_int8_kv_cache(), int8_kv_scales=scales)
    assert pipe.decoder.new_kv_cache(1).dtype == jnp.int8
    res = pipe.transcribe(MEL)
    # int8 KV is a mild perturbation: greedy tokens mostly agree with float
    a = fp_result[0].tokens
    b = res[0].tokens
    agree = sum(x == y for x, y in zip(a, b)) / max(len(a), len(b), 1)
    assert agree > 0.5, (a, b)


def test_combined_woq_int8kv_e2e(fp_pipe):
    scales = calibrate_int8_kv(fp_pipe, [MEL[0]])
    mode = QuantMode.use_weight_only() | QuantMode.INT8_KV_CACHE
    pipe = _pipeline(mode, int8_kv_scales=scales)
    res = pipe.transcribe(MEL)
    assert isinstance(res[0].text, str)


def test_int8_cross_kv_e2e(fp_pipe, fp_result):
    """Beyond-reference mode: cross-KV quantised with dynamic per-layer
    scales; greedy tokens should match float on most steps."""
    from eddie_wang_hackathon2023_tpu.models.whisper import CrossAttnKV
    from eddie_wang_hackathon2023_tpu.models.whisper.pipeline import (
        DecodingOptions, WhisperPipeline)
    enc = WhisperEncoder(CFG)
    dec = WhisperDecoder(CFG)
    ckv = CrossAttnKV(CFG, int8_output=True)
    enc.load_state_dict(dict(ENC_SD))
    dec.load_state_dict(dict(DEC_SD))
    ckv.load_state_dict(dict(CKV_SD))
    pipe = WhisperPipeline(CFG, enc, dec, ckv,
                           DecodingOptions(language="en", sample_len=10))
    pipe.bind_params()
    res = pipe.transcribe(MEL)
    a, b = fp_result[0].tokens, res[0].tokens
    agree = sum(x == y for x, y in zip(a, b)) / max(len(a), len(b), 1)
    assert agree > 0.5, (a, b)


def test_int8_lm_head_e2e(fp_pipe, fp_result):
    """int8 tied-logits GEMM (per-vocab-row scales): transcription stays
    greedy-equivalent on random weights at tiny dims."""
    from eddie_wang_hackathon2023_tpu.models.whisper.model import (
        quantize_lm_head_state)
    dec = WhisperDecoder(CFG, quantize_lm_head=True)
    dec.load_state_dict(quantize_lm_head_state(dict(DEC_SD)), strict=False)
    enc = WhisperEncoder(CFG)
    enc.load_state_dict(dict(ENC_SD))
    ckv = CrossAttnKV(CFG)
    ckv.load_state_dict(dict(CKV_SD))
    pipe = WhisperPipeline(CFG, enc, dec, ckv,
                           DecodingOptions(language="en", sample_len=10))
    pipe.bind_params()
    res = pipe.transcribe(MEL)
    a, b = fp_result[0].tokens, res[0].tokens
    agree = sum(x == y for x, y in zip(a, b)) / max(len(a), len(b), 1)
    assert agree >= 0.8, (a, b)
    # logits themselves are close in max-norm
    import jax.numpy as jnp
    xa = pipe.get_audio_features(MEL)
    cross = pipe.precompute_cross_kv(xa)
    cache_q = dec.new_kv_cache(1)
    cache_f = fp_pipe.decoder.new_kv_cache(1)
    toks = jnp.asarray([[50258, 50259]], jnp.int32)
    lq, _ = dec(toks, cache_q, cross, 0, jnp.array([2]))
    lf, _ = fp_pipe.decoder(toks, cache_f,
                            fp_pipe.precompute_cross_kv(xa), 0,
                            jnp.array([2]))
    rel = (np.abs(np.asarray(lq) - np.asarray(lf)).max()
           / (np.abs(np.asarray(lf)).max() + 1e-9))
    assert rel < 0.02, rel


def test_static_cross_kv_scales_bit_equal():
    """CrossAttnKV(static_scale=True) with kv_scale set to the dynamic
    path's own scales must produce a BIT-IDENTICAL int8 tensor (the
    deployment recipe only moves WHERE the scale comes from — calibration
    instead of a runtime amax pass); calibrate_cross_kv_scales on the
    same xa must reproduce those scales exactly."""
    import jax.numpy as jnp

    from eddie_wang_hackathon2023_tpu.models.whisper import CrossAttnKV
    from eddie_wang_hackathon2023_tpu.quantization.calibration import \
        calibrate_cross_kv_scales
    rs = np.random.RandomState(3)
    xa = (rs.randn(1, 32, CFG.n_audio_state) * 0.3).astype(np.float32)

    dyn = CrossAttnKV(CFG, int8_output=True)
    dyn.random_init(jax.random.PRNGKey(7), scale=0.1)
    params = dyn.state_dict()
    q_dyn, s_dyn = jax.jit(dyn.apply)(params, jnp.asarray(xa))

    cal = calibrate_cross_kv_scales(dyn, params, [xa])
    np.testing.assert_allclose(np.asarray(s_dyn), cal, rtol=1e-6)

    st = CrossAttnKV(CFG, int8_output=True, static_scale=True)
    st.load_state_dict({**params, "kv_scale": cal})
    q_st, s_st = jax.jit(st.apply)(st.state_dict(), jnp.asarray(xa))
    np.testing.assert_array_equal(np.asarray(q_dyn), np.asarray(q_st))
    np.testing.assert_allclose(np.asarray(s_dyn), np.asarray(s_st),
                               rtol=1e-6)

    # batch>1 einsum path
    xab = (rs.randn(2, 32, CFG.n_audio_state) * 0.3).astype(np.float32)
    qd, sd = jax.jit(dyn.apply)(params, jnp.asarray(xab))
    calb = calibrate_cross_kv_scales(dyn, params, [xab])
    st2 = CrossAttnKV(CFG, int8_output=True, static_scale=True)
    st2.load_state_dict({**params, "kv_scale": calb})
    qs, _ = jax.jit(st2.apply)(st2.state_dict(), jnp.asarray(xab))
    np.testing.assert_array_equal(np.asarray(qd), np.asarray(qs))
