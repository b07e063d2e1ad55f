"""Checkpoint/artifact builder.

Counterpart of the reference's ``tensorrt_llm/builder.py`` + per-example
``build.py``: there, deployment means compiling three TRT engines (hours of
tactic search) and serialising them next to JSON configs
(E/whisper/build.py:145,214,323).  On TPU the compiler is XLA-at-load with a
persistent compilation cache, so the deployable artifact is just the
*converted, optionally quantised* weights + config:

    whisper_outputs/
      config.json            (dims, dtype, quant mode — ref builder config)
      encoder.npz  decoder.npz  cross_kv.npz
      positional_embedding.npy  (parity with E/whisper/build.py:225-227)

``enable_compile_cache()`` turns on XLA's persistent cache, the analogue of
the reference's timing cache (T/builder.py:241-266).
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional, Tuple

import numpy as np

from .logger import logger
from .models.whisper.config import WhisperConfig
from .models.whisper.model import CrossAttnKV, WhisperDecoder, WhisperEncoder
from .quantization import QuantMode


def enable_compile_cache(path: str = "~/.cache/ewt_xla_cache") -> None:
    """Persistent XLA compilation cache (timing-cache analogue)."""
    import jax
    cache_dir = os.path.expanduser(path)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _save_npz(path: str, state: dict) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in state.items()})


def _load_npz(path: str) -> dict:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def save_whisper_checkpoint(out_dir: str,
                            config: WhisperConfig,
                            encoder_state: dict,
                            decoder_state: dict,
                            cross_kv_state: dict,
                            quant_mode: QuantMode = QuantMode(0),
                            plugin_config=None) -> None:
    """``plugin_config`` (PluginConfig): kernel recipe recorded with the
    checkpoint (ref: PluginConfig flags serialized per engine build,
    E/whisper/build.py:137-150); None records the active one."""
    from .plugin import get_plugin_config
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    meta = {"model": "whisper", "quant_mode": int(quant_mode),
            "builder_version": "0.1.0",
            # calibrated static-scale int8 cross-KV: marked by the
            # presence of the kv_scale row in cross_kv.npz
            "int8_cross_kv": "kv_scale" in cross_kv_state,
            "plugin_config": (plugin_config or get_plugin_config()).to_dict()}
    config.to_json(os.path.join(out_dir, "config.json"))
    with open(os.path.join(out_dir, "build_config.json"), "w") as f:
        json.dump(meta, f, indent=2)
    _save_npz(os.path.join(out_dir, "encoder.npz"), encoder_state)
    _save_npz(os.path.join(out_dir, "decoder.npz"), decoder_state)
    _save_npz(os.path.join(out_dir, "cross_kv.npz"), cross_kv_state)
    np.save(os.path.join(out_dir, "positional_embedding.npy"),
            np.asarray(decoder_state["positional_embedding"]))
    logger.info("checkpoint saved to %s in %.1fs", out_dir, time.time() - t0)


def load_whisper_checkpoint(ckpt_dir: str) -> Tuple[
        WhisperConfig, WhisperEncoder, WhisperDecoder, CrossAttnKV, QuantMode]:
    """Build the three models and bind saved weights."""
    from .quantization.surgery import weight_only_quantize

    config = WhisperConfig.from_json(os.path.join(ckpt_dir, "config.json"))
    with open(os.path.join(ckpt_dir, "build_config.json")) as f:
        meta = json.load(f)
    quant_mode = QuantMode(meta.get("quant_mode", 0))
    if "plugin_config" in meta:
        from .plugin import PluginConfig, set_plugin_config
        set_plugin_config(PluginConfig.from_dict(meta["plugin_config"]))
    enc = WhisperEncoder(config, quant_mode)
    dec = WhisperDecoder(config, quant_mode)
    int8_ckv = bool(meta.get("int8_cross_kv", False))
    ckv = CrossAttnKV(config, int8_output=int8_ckv, static_scale=int8_ckv)
    if quant_mode.is_weight_only():
        enc = weight_only_quantize(enc, quant_mode)
        dec = weight_only_quantize(dec, quant_mode)
    enc.load_state_dict(_load_npz(os.path.join(ckpt_dir, "encoder.npz")),
                        strict=False)
    dec.load_state_dict(_load_npz(os.path.join(ckpt_dir, "decoder.npz")),
                        strict=False)
    ckv.load_state_dict(_load_npz(os.path.join(ckpt_dir, "cross_kv.npz")))
    return config, enc, dec, ckv, quant_mode


def build_from_openai_pt(pt_path: str, out_dir: str, dtype: str = "bfloat16",
                         quant_mode: QuantMode = QuantMode(0),
                         int8_kv_scales=None,
                         cross_kv_scales=None) -> None:
    """OpenAI .pt -> deployable checkpoint dir (ref E/whisper/build.py
    run_build:389, which reads dims + state_dict from the .pt).

    ``cross_kv_scales`` [n_text_layer] fp32 (from
    ``calibration.calibrate_cross_kv_scales``) enables the static-scale
    int8 cross-KV deployment recipe: stored as ``kv_scale`` in
    cross_kv.npz and auto-restored by ``load_whisper_checkpoint``."""
    import torch
    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    dims = ckpt["dims"]
    config = WhisperConfig(
        n_mels=dims["n_mels"], n_vocab=dims["n_vocab"],
        n_audio_ctx=dims["n_audio_ctx"], n_audio_state=dims["n_audio_state"],
        n_audio_head=dims["n_audio_head"], n_audio_layer=dims["n_audio_layer"],
        n_text_ctx=dims["n_text_ctx"], n_text_state=dims["n_text_state"],
        n_text_head=dims["n_text_head"], n_text_layer=dims["n_text_layer"],
        dtype=dtype)
    from .models.whisper.convert import (cross_kv_state_dict,
                                         decoder_state_dict,
                                         encoder_state_dict)
    sd = ckpt["model_state_dict"]
    enc_sd = encoder_state_dict(sd, config)
    dec_sd = decoder_state_dict(sd, config, int8_kv_scales=int8_kv_scales)
    ckv_sd = cross_kv_state_dict(sd, config)
    if cross_kv_scales is not None:
        ckv_sd = dict(ckv_sd)
        ckv_sd["kv_scale"] = np.asarray(cross_kv_scales, np.float32)
    if quant_mode.is_weight_only():
        from .models.whisper.model import WhisperDecoder, WhisperEncoder
        from .quantization.surgery import (quantize_state_dict,
                                            weight_only_quantize)
        enc_m = weight_only_quantize(WhisperEncoder(config, quant_mode), quant_mode)
        dec_m = weight_only_quantize(WhisperDecoder(config, quant_mode), quant_mode)
        enc_sd = quantize_state_dict(enc_m, enc_sd, quant_mode)
        dec_sd = quantize_state_dict(dec_m, dec_sd, quant_mode)
    save_whisper_checkpoint(out_dir, config, enc_sd, dec_sd, ckv_sd,
                            quant_mode)
