"""Small-op-floor fusions (round 3): pre-LN folded into the fused decode
kernel's q prologue (EWT_FUSE_LN) and the block residual folded into its
proj epilogue (EWT_FUSE_RESIDUAL) must be TOKEN-EXACT vs the unfused
pipeline — both when the kernel fusions actually engage (woq8: proj + xq
operands qualify) and when they fall back (float linears: the attention
applies LN/residual itself)."""
import jax
import numpy as np
import pytest

jax.config.update("jax_default_device", jax.devices("cpu")[0])

from eddie_wang_hackathon2023_tpu.models.whisper import (CrossAttnKV,
                                                         WhisperConfig,
                                                         WhisperDecoder,
                                                         WhisperEncoder)
from eddie_wang_hackathon2023_tpu.models.whisper.pipeline import (
    DecodingOptions, WhisperPipeline)
from eddie_wang_hackathon2023_tpu.quantization import QuantMode
from eddie_wang_hackathon2023_tpu.quantization.surgery import \
    weight_only_quantize_state

CFG = WhisperConfig(n_mels=80, n_audio_ctx=48, n_audio_state=64,
                    n_audio_head=4, n_audio_layer=2, n_text_ctx=48,
                    n_text_state=64, n_text_head=4, n_text_layer=2,
                    dtype="float32")
MEL = (np.random.RandomState(3)
       .randn(1, CFG.n_mels, CFG.n_audio_ctx * 2).astype(np.float32) * 0.1)


def _pipeline(quant: bool):
    qmode = QuantMode.use_weight_only() if quant else QuantMode(0)
    enc = WhisperEncoder(CFG)
    dec = WhisperDecoder(CFG, qmode)
    ckv = CrossAttnKV(CFG)
    enc.random_init(jax.random.PRNGKey(0), 0.05)
    ckv.random_init(jax.random.PRNGKey(2), 0.05)
    fdec = WhisperDecoder(CFG)
    fdec.random_init(jax.random.PRNGKey(1), 0.05)
    if quant:
        dec, sd = weight_only_quantize_state(dec, fdec.state_dict(), qmode)
        dec.load_state_dict(sd, strict=False)
    else:
        dec = fdec
    pipe = WhisperPipeline(CFG, enc, dec, ckv,
                           DecodingOptions(language="en", sample_len=8),
                           qmode)
    pipe.bind_params()
    return pipe


@pytest.mark.parametrize("quant", [True, False])
def test_ln_residual_fusion_token_exact(monkeypatch, quant):
    monkeypatch.setenv("EWT_PALLAS_DECODE", "1")
    outs = {}
    for fuse in ("0", "1"):
        monkeypatch.setenv("EWT_FUSE_LN", fuse)
        monkeypatch.setenv("EWT_FUSE_RESIDUAL", fuse)
        jax.clear_caches()      # kernel choice happens at trace time
        res = _pipeline(quant).transcribe(MEL)
        outs[fuse] = [r.tokens for r in res]
    assert outs["0"] == outs["1"]


def test_fusions_engage_under_woq8(monkeypatch):
    """Guard against the silently-declining failure mode: with woq8 + the
    flags on, the q/proj operands must actually qualify so the LN/residual
    really ride the kernel."""
    from eddie_wang_hackathon2023_tpu.layers.attention import (
        proj_fusion_hoistable, q_fusion_hoistable)
    monkeypatch.setenv("EWT_PALLAS_DECODE", "1")
    pipe = _pipeline(True)
    blk = pipe.decoder.blocks
    assert proj_fusion_hoistable(blk.cross_attn)
    assert q_fusion_hoistable(blk.cross_attn)
