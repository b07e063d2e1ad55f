"""SmoothQuant / quantized-functional tests (mirrors reference
tests/quantization/test_smooth_quant_gemm.py and the layer.py family)."""
import jax.numpy as jnp
import numpy as np
import pytest

from eddie_wang_hackathon2023_tpu.quantization import (
    QuantMode, dequantize, quantize, quantize_per_token, smooth_quant_gemm)
from eddie_wang_hackathon2023_tpu.quantization.smoothquant_layers import (
    SmoothQuantLayerNorm, SmoothQuantLinear, smooth_gemm,
    smooth_quantize_weights)


def test_quantize_roundtrip():
    x = jnp.asarray(np.linspace(-2, 2, 64, dtype=np.float32))
    scale = 127.0 / 2.0
    q = quantize(x, scale)
    back = np.asarray(dequantize(q, 1.0 / scale))
    assert np.abs(back - np.asarray(x)).max() <= (1.0 / scale) * 0.5 + 1e-6


def test_quantize_per_token_scales():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(4, 32).astype(np.float32) * np.array(
        [[1.0], [2.0], [0.5], [4.0]], np.float32))
    q, s = quantize_per_token(x)
    assert q.dtype == jnp.int8 and s.shape == (4, 1)
    back = np.asarray(q, np.float32) * np.asarray(s)
    np.testing.assert_allclose(back, np.asarray(x), atol=np.asarray(s).max())
    assert np.abs(np.asarray(q)).max() == 127


def test_smooth_quant_gemm_vs_emulated():
    rs = np.random.RandomState(1)
    x = rs.randn(8, 32).astype(np.float32)
    w = rs.randn(16, 32).astype(np.float32)  # [out, in]
    wq, ws = smooth_quantize_weights(w)      # [in, out], [out]
    xq, xs = quantize_per_token(jnp.asarray(x))
    got = np.asarray(smooth_quant_gemm(xq, jnp.asarray(wq), xs,
                                       jnp.asarray(ws)))
    # emulated: dequantise both then matmul
    x_deq = np.asarray(xq, np.float32) * np.asarray(xs)
    w_deq = wq.astype(np.float32) * ws[None, :]
    np.testing.assert_allclose(got, x_deq @ w_deq, rtol=1e-5, atol=1e-4)
    # end-to-end error vs float GEMM bounded by quantisation noise
    rel = np.abs(got - x @ w.T).max() / np.abs(x @ w.T).max()
    assert rel < 0.05, rel


def test_smooth_quant_linear_layer():
    rs = np.random.RandomState(2)
    w = rs.randn(16, 32).astype(np.float32)
    b = rs.randn(16).astype(np.float32)
    lin = SmoothQuantLinear(32, 16, dtype="float32",
                            quant_mode=QuantMode.use_smooth_quant(per_token=True, per_channel=True))
    wq, ws = smooth_quantize_weights(w)
    lin.qweight.value = wq
    lin.per_channel_scale.value = ws
    lin.bias.value = b
    x = rs.randn(3, 32).astype(np.float32)
    got = np.asarray(lin(jnp.asarray(x)))
    ref = x @ w.T + b
    assert np.abs(got - ref).max() / np.abs(ref).max() < 0.05


def test_smooth_quant_layernorm_feeds_linear():
    rs = np.random.RandomState(3)
    ln = SmoothQuantLayerNorm(32, dtype="float32",
                              quant_mode=QuantMode.use_smooth_quant(per_token=True, per_channel=True))
    ln.weight.value = np.ones(32, np.float32)
    ln.bias.value = np.zeros(32, np.float32)
    w = rs.randn(8, 32).astype(np.float32)
    lin = SmoothQuantLinear(32, 8, bias=False, dtype="float32",
                            quant_mode=QuantMode.use_smooth_quant(per_token=True, per_channel=True))
    wq, ws = smooth_quantize_weights(w)
    lin.qweight.value = wq
    lin.per_channel_scale.value = ws
    x = rs.randn(2, 5, 32).astype(np.float32)
    out = np.asarray(lin(ln(jnp.asarray(x))))
    # float reference
    import torch
    ref = torch.nn.functional.layer_norm(torch.from_numpy(x), (32,)).numpy() @ w.T
    assert np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9) < 0.05


def test_smooth_gemm_outlier_migration():
    rs = np.random.RandomState(4)
    w = rs.randn(16, 32).astype(np.float32)
    act_amax = np.abs(rs.randn(32).astype(np.float32)) * 10 + 0.1
    ln_w = np.ones(32, np.float32)
    scales, out = smooth_gemm(w, act_amax, layernorm_weight=ln_w, alpha=0.5)
    assert scales.shape == (32,)
    # function preserved: (x/s) @ (w*s)^T == x @ w^T
    x = rs.randn(2, 32).astype(np.float32)
    ref = x @ w.T
    got = (x / scales) @ out["gemm_weight"].T
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_smooth_quantize_model_surgery_e2e():
    """ref quant.py:8-48 smooth_quantize: swap a GPT model's linears for
    W8A8 variants and check generation stays close to float."""
    import torch
    import transformers as T

    from eddie_wang_hackathon2023_tpu.models.families import build_from_hf
    from eddie_wang_hackathon2023_tpu.quantization.surgery import (
        smooth_quantize, smooth_quantize_state_dict)
    from eddie_wang_hackathon2023_tpu.runtime import (GenerationSession,
                                                      ModelConfig,
                                                      SamplingConfig)
    torch.manual_seed(0)
    cfg = T.GPT2Config(vocab_size=97, n_positions=64, n_embd=32, n_layer=2,
                       n_head=4)
    hf = T.GPT2LMHeadModel(cfg).eval()
    model, config = build_from_hf("gpt2", hf, dtype="float32")
    float_state = {k: np.asarray(v) for k, v in model.state_dict().items()}

    mc = ModelConfig(vocab_size=97, num_layers=2, num_heads=4,
                     hidden_size=32, max_seq_len=64)
    sess_f = GenerationSession(mc, model, SamplingConfig(end_id=96, pad_id=96))
    ids = np.array([[5, 11, 17, 3]], np.int32)
    lens = np.array([4], np.int32)
    tok_f, _, _ = sess_f.decode(ids, lens, max_new_tokens=8)

    qmode = QuantMode.use_smooth_quant(per_token=True, per_channel=True)
    qmodel = smooth_quantize(build_from_hf("gpt2", hf, dtype="float32")[0],
                             qmode)
    qstate = smooth_quantize_state_dict(qmodel, float_state, qmode)
    qmodel.load_state_dict(qstate, strict=False)
    sess_q = GenerationSession(mc, qmodel, SamplingConfig(end_id=96, pad_id=96))
    tok_q, _, _ = sess_q.decode(ids, lens, max_new_tokens=8)
    agree = (tok_f[0, 0] == tok_q[0, 0]).mean()
    assert agree >= 0.75, (tok_f[0, 0], tok_q[0, 0])


def test_per_layer_smoothing_scales():
    """Stacked weights must get per-LAYER smoothing scales: with the same
    activation amax, a layer with huge weights and a layer with tiny
    weights produce different scales, and the function is preserved per
    layer (w/s folded into LN)."""
    import numpy as np
    from eddie_wang_hackathon2023_tpu.quantization.smoothquant_layers import (
        smooth_gemm)
    rs = np.random.RandomState(0)
    in_f, out_f = 8, 6
    w = np.stack([rs.randn(out_f, in_f).astype(np.float32) * 10.0,
                  rs.randn(out_f, in_f).astype(np.float32) * 0.01])
    act = np.abs(rs.randn(in_f).astype(np.float32)) + 1.0
    lw = np.ones((2, in_f), np.float32)
    lb = np.zeros((2, in_f), np.float32)
    s0, sm0 = smooth_gemm(w[0], act, lw[0], lb[0])
    s1, sm1 = smooth_gemm(w[1], act, lw[1], lb[1])
    assert not np.allclose(s0, s1)          # layer-dependent scales
    # the state-dict transform must reproduce exactly these per-layer folds
    from eddie_wang_hackathon2023_tpu.layers import LayerNorm, Linear
    from eddie_wang_hackathon2023_tpu.module import Module
    from eddie_wang_hackathon2023_tpu.quantization import QuantMode
    from eddie_wang_hackathon2023_tpu.quantization.surgery import (
        smooth_quantize_state_dict)
    from eddie_wang_hackathon2023_tpu.quantization.smoothquant_layers import (
        SmoothQuantLinear)

    class Tiny(Module):
        def __init__(self):
            super().__init__()
            self.ln = LayerNorm(in_f, dtype="float32")
            self.fc = SmoothQuantLinear(in_f, out_f,
                                        QuantMode.use_smooth_quant(True, True),
                                        dtype="float32")

    m = Tiny()
    state = {"fc.weight": w, "ln.weight": lw, "ln.bias": lb}
    out = smooth_quantize_state_dict(
        m, state, QuantMode.use_smooth_quant(True, True),
        act_scales={"fc": act}, ln_paths={"fc": "ln"})
    np.testing.assert_allclose(out["ln.weight"][0], sm0["layernorm_weight"],
                               rtol=1e-6)
    np.testing.assert_allclose(out["ln.weight"][1], sm1["layernorm_weight"],
                               rtol=1e-6)
    # and the quantised weights dequantise back to the per-layer smoothed w
    q = out["fc.qweight"].astype(np.float32)      # [2, in, out]
    s = out["fc.per_channel_scale"].reshape(2, 1, -1)
    deq = (q * s).transpose(0, 2, 1)              # back to [2, out, in]
    np.testing.assert_allclose(deq[0], sm0["gemm_weight"],
                               atol=np.abs(sm0["gemm_weight"]).max() / 100)
    np.testing.assert_allclose(deq[1], sm1["gemm_weight"],
                               atol=np.abs(sm1["gemm_weight"]).max() / 100)


def test_smooth_quantize_whisper_encoder():
    """SmoothQuant W8A8 the whisper ENCODER (round 4: the encoder is MXU
    compute-bound, so int8 MXU is its lever).  Surgery must swap every
    block linear, keep the conv stem float, and track the float encoder
    within quantisation noise on random weights."""
    import jax

    from eddie_wang_hackathon2023_tpu.models.whisper import (WhisperConfig,
                                                             WhisperEncoder)
    from eddie_wang_hackathon2023_tpu.quantization.smoothquant_layers import (
        SmoothQuantLinear, SmoothQuantQKVLinear)
    from eddie_wang_hackathon2023_tpu.quantization.surgery import (
        smooth_quantize, smooth_quantize_state_dict)

    cfg = WhisperConfig(n_mels=16, n_vocab=160, n_audio_ctx=96,
                        n_audio_state=256, n_audio_head=4, n_audio_layer=2,
                        n_text_ctx=32, n_text_state=256, n_text_head=4,
                        n_text_layer=1, dtype="float32")
    enc = WhisperEncoder(cfg)
    enc.random_init(jax.random.PRNGKey(0), 0.08)
    state = enc.state_dict()
    mel = np.asarray(np.random.RandomState(1).randn(1, cfg.n_mels,
                                                    2 * cfg.n_audio_ctx),
                     np.float32) * 0.3
    ref = np.asarray(enc.apply(state, jnp.asarray(mel)))

    qm = QuantMode.use_smooth_quant(per_token=True, per_channel=True)
    enc_q = smooth_quantize(WhisperEncoder(cfg), qm)
    kinds = {type(m).__name__
             for _, m in enc_q.named_modules()}
    assert "SmoothQuantQKVLinear" in kinds and "SmoothQuantLinear" in kinds
    assert "Conv1d" in kinds            # stem stays float
    qstate = smooth_quantize_state_dict(enc_q, state, qm)
    enc_q.load_state_dict(qstate, strict=False)
    got = np.asarray(enc_q.apply(qstate, jnp.asarray(mel)))
    assert got.shape == ref.shape
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.08, rel
