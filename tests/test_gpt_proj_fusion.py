"""Fused decode out-projection on the GPT path: a WOQ int8 DecoderLMHead
decoded through GenerationSession with the Pallas decode kernel must be
TOKEN-EXACT with the fused epilogue (EWT_FUSE_PROJ) on vs off — the fused
path also exercises the scan-xs qweight hoisting in
models/decoder.py (stacked [L,K,N] bound whole, kernel index_map picks
the layer panel)."""
import jax
import numpy as np
import pytest

jax.config.update("jax_default_device", jax.devices("cpu")[0])

from eddie_wang_hackathon2023_tpu.models.decoder import (DecoderConfig,
                                                         DecoderLMHead)
from eddie_wang_hackathon2023_tpu.quantization import QuantMode
from eddie_wang_hackathon2023_tpu.quantization.surgery import \
    weight_only_quantize_state
from eddie_wang_hackathon2023_tpu.runtime.generation import (
    GenerationSession, ModelConfig)
from eddie_wang_hackathon2023_tpu.runtime.sampling import SamplingConfig


def _rand_load(m, seed):
    rs = np.random.RandomState(seed)
    sd = m.state_dict()
    m.load_state_dict({
        k: ((rs.randn(*np.shape(v)) * 0.05).astype(np.asarray(v).dtype)
            if np.asarray(v).dtype.kind == "f" else v)
        for k, v in sd.items()})


@pytest.mark.parametrize("tail", [0, 4])
def test_gpt_woq_proj_fusion_token_exact(monkeypatch, tail):
    qmode = QuantMode.use_weight_only()
    config = DecoderConfig(vocab_size=128, hidden_size=64, num_layers=3,
                           num_heads=4, max_position_embeddings=96,
                           quant_mode=qmode)
    fmodel = DecoderLMHead(
        DecoderConfig(vocab_size=128, hidden_size=64, num_layers=3,
                      num_heads=4, max_position_embeddings=96))
    fmodel.zeros_init()
    _rand_load(fmodel, 5)
    model = DecoderLMHead(config)
    model, sd = weight_only_quantize_state(model, fmodel.state_dict(), qmode)
    model.load_state_dict(sd, strict=False)

    from eddie_wang_hackathon2023_tpu.layers.attention import \
        proj_fusion_hoistable
    assert proj_fusion_hoistable(model.blocks.attention)  # fusion engages

    mc = ModelConfig(vocab_size=128, num_layers=3, num_heads=4,
                     hidden_size=64)
    rs = np.random.RandomState(0)
    # batch 1 — the fused epilogues are batch-1-only (left-padded prompt
    # still exercises the start-index mask)
    ids = rs.randint(0, 128, (1, 11)).astype(np.int32)
    lens = np.asarray([7], np.int32)
    monkeypatch.setenv("EWT_PALLAS_DECODE", "1")
    monkeypatch.setenv("EWT_DECODE_TAIL", str(tail))
    outs = {}
    for fuse in ("0", "1"):
        monkeypatch.setenv("EWT_FUSE_PROJ", fuse)
        sess = GenerationSession(mc, model,
                                 SamplingConfig(end_id=-1, pad_id=0))
        toks, slens, cum = sess.decode(ids, lens, max_new_tokens=9)
        outs[fuse] = (toks.tolist(), slens.tolist())
        del sess
    assert outs["0"] == outs["1"]


@pytest.mark.parametrize("tail", [0, 4])
def test_gpt_bf16_proj_fusion_token_exact(monkeypatch, tail):
    """The round-3 bf16 dense epilogue (EWT_FUSE_PROJ_BF16, weight in its
    native [N, K] layout, "nk" kernel dots): an UN-quantised DecoderLMHead
    must decode token-exact with the fusion on vs off, exercising the
    scan-xs .weight hoisting."""
    model = DecoderLMHead(
        DecoderConfig(vocab_size=128, hidden_size=64, num_layers=3,
                      num_heads=4, max_position_embeddings=96,
                      dtype="float32"))
    model.zeros_init()
    _rand_load(model, 9)
    mc = ModelConfig(vocab_size=128, num_layers=3, num_heads=4,
                     hidden_size=64)
    rs = np.random.RandomState(1)
    ids = rs.randint(0, 128, (1, 11)).astype(np.int32)
    lens = np.asarray([7], np.int32)
    monkeypatch.setenv("EWT_PALLAS_DECODE", "1")
    monkeypatch.setenv("EWT_DECODE_TAIL", str(tail))
    from eddie_wang_hackathon2023_tpu.layers.attention import \
        proj_fusion_hoistable
    monkeypatch.setenv("EWT_FUSE_PROJ_BF16", "1")
    assert proj_fusion_hoistable(model.blocks.attention)
    monkeypatch.setenv("EWT_FUSE_PROJ_BF16", "0")
    assert not proj_fusion_hoistable(model.blocks.attention)
    outs = {}
    for fuse in ("0", "1"):
        monkeypatch.setenv("EWT_FUSE_PROJ_BF16", fuse)
        sess = GenerationSession(mc, model,
                                 SamplingConfig(end_id=-1, pad_id=0))
        toks, slens, cum = sess.decode(ids, lens, max_new_tokens=9)
        outs[fuse] = (toks.tolist(), slens.tolist())
        del sess
    assert outs["0"] == outs["1"]


def test_mqa_family_pallas_env_token_exact(monkeypatch):
    """SantaCoder (MQA): with EWT_PALLAS_DECODE=1 the kernel must decline
    (unequal query/KV heads) and generation stays token-exact vs the
    default path."""
    import torch
    import transformers as T

    from eddie_wang_hackathon2023_tpu.models.families import build_from_hf
    torch.manual_seed(0)
    hf = T.GPTBigCodeForCausalLM(T.GPTBigCodeConfig(
        vocab_size=97, n_positions=64, n_embd=32, n_layer=2, n_head=4,
        multi_query=True)).eval()
    model, config = build_from_hf("santacoder", hf, dtype="float32")
    mc = ModelConfig(vocab_size=97, num_layers=2, num_heads=4,
                     hidden_size=32)
    ids = np.array([[3, 11, 25, 40, 7]], np.int32)
    lens = np.asarray([5], np.int32)
    outs = {}
    for pallas in ("0", "1"):
        monkeypatch.setenv("EWT_PALLAS_DECODE", pallas)
        sess = GenerationSession(mc, model,
                                 SamplingConfig(end_id=-1, pad_id=0))
        toks, slens, _ = sess.decode(ids, lens, max_new_tokens=8)
        outs[pallas] = toks.tolist()
    assert outs["0"] == outs["1"]
