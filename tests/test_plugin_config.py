"""PluginConfig: the single kernel-recipe surface (ref PluginConfig,
tensorrt_llm/plugin/plugin.py — feature flags pinned per engine build)."""
import os

import numpy as np
import pytest

from eddie_wang_hackathon2023_tpu.plugin import (PluginConfig,
                                                 get_plugin_config,
                                                 plugin_config,
                                                 set_plugin_config)


def test_defaults_are_auto():
    cfg = PluginConfig()
    # CPU test env: hardware auto => no Pallas kernels; default blocks are
    # the v5e device-traced sweep optimum (benchmarks/flash_sweep.py)
    assert cfg.get_flash_blocks() == (512, 1536, 512)
    assert cfg.use_fused_transcribe() is False


def test_field_pins_choice(monkeypatch):
    monkeypatch.delenv("EWT_PALLAS_DECODE", raising=False)
    assert PluginConfig(pallas_decode=True).use_pallas_decode() is True
    assert PluginConfig(pallas_decode=False).use_pallas_decode() is False
    assert PluginConfig(int4_pallas=True).use_int4_pallas() is True
    assert PluginConfig(flash_blocks=(256, 128, 128)).get_flash_blocks() \
        == (256, 128, 128)


def test_env_overrides_field(monkeypatch):
    monkeypatch.setenv("EWT_PALLAS_DECODE", "0")
    assert PluginConfig(pallas_decode=True).use_pallas_decode() is False
    monkeypatch.setenv("EWT_INT4_XLA", "1")
    assert PluginConfig(int4_pallas=True).use_int4_pallas() is False
    monkeypatch.setenv("EWT_FLASH_BLOCKS", "128,64,64")
    assert PluginConfig(flash_blocks=(256, 256, 256)).get_flash_blocks() \
        == (128, 64, 64)


def test_scoped_override_restores():
    base = get_plugin_config()
    with plugin_config(pallas_decode=False) as cfg:
        assert get_plugin_config() is cfg
        assert cfg.pallas_decode is False
    assert get_plugin_config() is base


def test_kernel_choice_site_consults_config(monkeypatch):
    """layers.attention._pallas_decode goes through the active config."""
    monkeypatch.delenv("EWT_PALLAS_DECODE", raising=False)
    from eddie_wang_hackathon2023_tpu.layers.attention import _pallas_decode
    with plugin_config(pallas_decode=True):
        assert _pallas_decode() is True
    with plugin_config(pallas_decode=False):
        assert _pallas_decode() is False


def test_int4_site_respects_config(monkeypatch):
    """Pinning int4_pallas=False on CPU must route through XLA unpack and
    still be numerically correct."""
    monkeypatch.delenv("EWT_INT4_XLA", raising=False)
    import jax.numpy as jnp

    from eddie_wang_hackathon2023_tpu.ops.quant_matmul import (
        quantize_weights_int4, weight_only_quant_matmul)
    rs = np.random.RandomState(0)
    w = rs.randn(64, 32).astype(np.float32)
    qw, scales = quantize_weights_int4(w)
    qw, scales = jnp.asarray(qw), jnp.asarray(scales)
    x = jnp.asarray(rs.randn(2, 64).astype(np.float32))
    with plugin_config(int4_pallas=False):
        out = weight_only_quant_matmul(x, qw, scales, bits=4)
    assert out.shape == (2, 32)
    assert np.all(np.isfinite(np.asarray(out)))


def test_builder_roundtrip(tmp_path):
    """Recipe recorded at save, reinstated at load (build_config.json)."""
    import jax
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    from eddie_wang_hackathon2023_tpu.builder import (load_whisper_checkpoint,
                                                      save_whisper_checkpoint)
    from eddie_wang_hackathon2023_tpu.models.whisper import (
        CrossAttnKV, WhisperDecoder, WhisperEncoder, whisper_config)

    config = whisper_config("tiny", dtype="float32")
    enc, dec, ckv = (WhisperEncoder(config), WhisperDecoder(config),
                     CrossAttnKV(config))
    for m in (enc, dec, ckv):
        m.zeros_init()
    recipe = PluginConfig(pallas_decode=False, flash_blocks=(256, 128, 128))
    old = set_plugin_config(PluginConfig())
    try:
        save_whisper_checkpoint(
            str(tmp_path / "ckpt"), config,
            dict(enc.state_dict()), dict(dec.state_dict()),
            dict(ckv.state_dict()), plugin_config=recipe)
        load_whisper_checkpoint(str(tmp_path / "ckpt"))
        active = get_plugin_config()
        assert active.pallas_decode is False
        assert active.get_flash_blocks() == (256, 128, 128)
    finally:
        set_plugin_config(old)


def test_fusion_fields_roundtrip():
    """The kernel-recipe fields (fused out-proj epilogue, decode chunk)
    survive the builder config.json dict round-trip so an engine build
    pins them.  (The q/qkv prologue and ln/residual fields were deleted
    with their kernels after losing the round-3 device A/B.)"""
    cfg = PluginConfig(fuse_decode_proj=False, fuse_decode_proj_bf16=False,
                       decode_chunk=384, qkv_flat_barrier=True)
    back = PluginConfig.from_dict(cfg.to_dict())
    assert back.fuse_decode_proj is False
    assert back.fuse_decode_proj_bf16 is False
    assert back.qkv_flat_barrier is True
    assert back.get_decode_chunk(2048) == 384
    assert back.use_fuse_decode_proj_bf16() is False


def test_fusion_env_overrides(monkeypatch):
    monkeypatch.setenv("EWT_FUSE_PROJ", "0")
    assert PluginConfig(fuse_decode_proj=True).use_fuse_decode_proj() is False
    monkeypatch.setenv("EWT_FUSE_PROJ_BF16", "0")
    assert PluginConfig(
        fuse_decode_proj_bf16=True).use_fuse_decode_proj_bf16() is False
    monkeypatch.delenv("EWT_FUSE_PROJ_BF16")
    # device-A/B-adopted default: ON when unset
    assert PluginConfig().use_fuse_decode_proj_bf16() is True
