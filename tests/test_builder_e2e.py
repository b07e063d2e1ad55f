"""build.py flow: OpenAI .pt -> checkpoint dir -> loaded pipeline
(ref E/whisper/build.py + run.py round trip)."""
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

from eddie_wang_hackathon2023_tpu.builder import (build_from_openai_pt,
                                                  load_whisper_checkpoint)

DIMS = dict(n_mels=80, n_vocab=51865, n_audio_ctx=30, n_audio_state=32,
            n_audio_head=4, n_audio_layer=2, n_text_ctx=24, n_text_state=32,
            n_text_head=4, n_text_layer=2)


def _fake_openai_pt(path, dims=None):
    """Random weights in OpenAI whisper state-dict layout."""
    dims = dict(DIMS if dims is None else dims)
    g = torch.Generator().manual_seed(0)
    d = dims["n_audio_state"]

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {
        "encoder.conv1.weight": r(d, dims["n_mels"], 3),
        "encoder.conv1.bias": r(d),
        "encoder.conv2.weight": r(d, d, 3),
        "encoder.conv2.bias": r(d),
        "encoder.ln_post.weight": 1 + r(d) * 0,
        "encoder.ln_post.bias": r(d) * 0,
        "decoder.token_embedding.weight": r(dims["n_vocab"], d),
        "decoder.positional_embedding": r(dims["n_text_ctx"], d),
        "decoder.ln.weight": torch.ones(d),
        "decoder.ln.bias": torch.zeros(d),
    }
    for side, n_layer, cross in (("encoder", dims["n_audio_layer"], False),
                                 ("decoder", dims["n_text_layer"], True)):
        for i in range(n_layer):
            p = f"{side}.blocks.{i}."
            sd.update({
                p + "attn_ln.weight": torch.ones(d),
                p + "attn_ln.bias": torch.zeros(d),
                p + "attn.query.weight": r(d, d),
                p + "attn.query.bias": r(d),
                p + "attn.key.weight": r(d, d),
                p + "attn.value.weight": r(d, d),
                p + "attn.value.bias": r(d),
                p + "attn.out.weight": r(d, d),
                p + "attn.out.bias": r(d),
                p + "mlp_ln.weight": torch.ones(d),
                p + "mlp_ln.bias": torch.zeros(d),
                p + "mlp.0.weight": r(4 * d, d),
                p + "mlp.0.bias": r(4 * d),
                p + "mlp.2.weight": r(d, 4 * d),
                p + "mlp.2.bias": r(d),
            })
            if cross:
                sd.update({
                    p + "cross_attn_ln.weight": torch.ones(d),
                    p + "cross_attn_ln.bias": torch.zeros(d),
                    p + "cross_attn.query.weight": r(d, d),
                    p + "cross_attn.query.bias": r(d),
                    p + "cross_attn.key.weight": r(d, d),
                    p + "cross_attn.value.weight": r(d, d),
                    p + "cross_attn.value.bias": r(d),
                    p + "cross_attn.out.weight": r(d, d),
                    p + "cross_attn.out.bias": r(d),
                })
    torch.save({"dims": dims, "model_state_dict": sd}, path)
    return path


@pytest.fixture(scope="module")
def pt_path(tmp_path_factory):
    return _fake_openai_pt(
        os.path.join(tmp_path_factory.mktemp("ckpt"), "tiny.pt"))


def _transcribe(out_dir):
    from eddie_wang_hackathon2023_tpu.models.whisper.pipeline import (
        DecodingOptions, WhisperPipeline)
    config, enc, dec, ckv, qmode = load_whisper_checkpoint(out_dir)
    pipe = WhisperPipeline(config, enc, dec, ckv,
                           DecodingOptions(language="en", sample_len=4),
                           qmode)
    mel = np.random.RandomState(0).randn(
        1, config.n_mels, config.n_audio_ctx * 2).astype(np.float32) * 0.1
    return pipe.transcribe(mel)[0]


def test_build_plain_roundtrip(pt_path, tmp_path):
    out = os.path.join(tmp_path, "out")
    build_from_openai_pt(pt_path, out, dtype="float32")
    assert os.path.exists(os.path.join(out, "config.json"))
    res = _transcribe(out)
    assert isinstance(res.text, str)


def test_build_weight_only_roundtrip(pt_path, tmp_path):
    from eddie_wang_hackathon2023_tpu.quantization import QuantMode
    out = os.path.join(tmp_path, "out_woq")
    build_from_openai_pt(pt_path, out, dtype="float32",
                         quant_mode=QuantMode.use_weight_only())
    res = _transcribe(out)
    assert isinstance(res.text, str)


def test_build_cli(pt_path, tmp_path):
    """examples/whisper/build.py drives the same flow (ref build.py CLI)."""
    out = os.path.join(tmp_path, "cli_out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "examples/whisper/build.py"),
         "--model_path", pt_path, "--output_dir", out,
         "--dtype", "float32", "--use_weight_only", "int8"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "config.json"))


def test_build_static_cross_kv_roundtrip(pt_path, tmp_path):
    """cross_kv_scales= persists as kv_scale in cross_kv.npz, the meta
    flag restores CrossAttnKV(int8_output, static_scale) on load, and the
    loaded pipeline transcribes."""
    import json

    from eddie_wang_hackathon2023_tpu.quantization import QuantMode
    out = os.path.join(tmp_path, "out_ckv8")
    import torch
    n_layer = torch.load(pt_path, map_location="cpu",
                         weights_only=False)["dims"]["n_text_layer"]
    scales = np.full((n_layer,), 0.02, np.float32)
    build_from_openai_pt(pt_path, out, dtype="float32",
                         quant_mode=QuantMode.use_weight_only(),
                         cross_kv_scales=scales)
    with open(os.path.join(out, "build_config.json")) as f:
        assert json.load(f)["int8_cross_kv"] is True
    config, enc, dec, ckv, qmode = load_whisper_checkpoint(out)
    assert ckv.int8_output and ckv.static_scale
    np.testing.assert_allclose(np.asarray(ckv.kv_scale.value), scales)
    res = _transcribe(out)
    assert isinstance(res.text, str)
