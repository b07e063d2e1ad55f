"""Whisper checkpoint conversion.

Counterpart of ``E/whisper/weight.py`` (load_encoder_weight:35,
load_decoder_weight:154): binds an OpenAI-format state dict onto the three
TPU models, reproducing the reference's fusion semantics —

* fused QKV = [query; key; value] with a **zero K bias** (Whisper's key
  projection has no bias, weight.py:89-95), reshaped head-major
  [3, H, head_dim, d] for mesh-friendly sharding;
* per-layer tensors stacked along a leading [n_layer] axis (scan layout);
* encoder positional embedding from the checkpoint when present, else the
  sinusoid formula (weight.py:50);
* CrossAttnKV gets the decoder's cross_attn key/value projections
  (weight.py load_crossattn_linear_weight path).

Also includes a transformers->OpenAI key mapper so HuggingFace Whisper
checkpoints (and random-init HF models in tests) load identically.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ...functional import sinusoids
from ...quantization import QuantMode
from .config import WhisperConfig
from .model import CrossAttnKV, WhisperDecoder, WhisperEncoder


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def _fuse_qkv(wq, wk, wv, bq, bv, n_head: int) -> Tuple[np.ndarray, np.ndarray]:
    d = wq.shape[1]
    hd = wq.shape[0] // n_head
    w = np.stack([wq.reshape(n_head, hd, d), wk.reshape(n_head, hd, d),
                  wv.reshape(n_head, hd, d)], axis=0)
    b = np.stack([bq.reshape(n_head, hd),
                  np.zeros_like(bq).reshape(n_head, hd),  # zero K bias
                  bv.reshape(n_head, hd)], axis=0)
    return w, b


def _block_state(sd, prefix: str, n_head: int, cross: bool) -> Dict[str, np.ndarray]:
    g = lambda k: _np(sd[prefix + k])
    w, b = _fuse_qkv(g("attn.query.weight"), g("attn.key.weight"),
                     g("attn.value.weight"), g("attn.query.bias"),
                     g("attn.value.bias"), n_head)
    out = {
        "attn_ln.weight": g("attn_ln.weight"),
        "attn_ln.bias": g("attn_ln.bias"),
        "attn.qkv.weight": w,
        "attn.qkv.bias": b,
        "attn.dense.weight": g("attn.out.weight"),
        "attn.dense.bias": g("attn.out.bias"),
        "mlp_ln.weight": g("mlp_ln.weight"),
        "mlp_ln.bias": g("mlp_ln.bias"),
        "mlp1.weight": g("mlp.0.weight"),
        "mlp1.bias": g("mlp.0.bias"),
        "mlp2.weight": g("mlp.2.weight"),
        "mlp2.bias": g("mlp.2.bias"),
    }
    if cross:
        out.update({
            "cross_attn_ln.weight": g("cross_attn_ln.weight"),
            "cross_attn_ln.bias": g("cross_attn_ln.bias"),
            "cross_attn.q_linear.weight": g("cross_attn.query.weight"),
            "cross_attn.q_linear.bias": g("cross_attn.query.bias"),
            "cross_attn.dense.weight": g("cross_attn.out.weight"),
            "cross_attn.dense.bias": g("cross_attn.out.bias"),
        })
    return out


def _stack_blocks(per_layer) -> Dict[str, np.ndarray]:
    keys = per_layer[0].keys()
    return {k: np.stack([bl[k] for bl in per_layer], axis=0) for k in keys}


def encoder_state_dict(sd, config: WhisperConfig) -> Dict[str, np.ndarray]:
    c = config
    if "encoder.positional_embedding" in sd:
        pos = _np(sd["encoder.positional_embedding"])
    else:
        pos = sinusoids(c.n_audio_ctx, c.n_audio_state)
    blocks = _stack_blocks([
        _block_state(sd, f"encoder.blocks.{i}.", c.n_audio_head, cross=False)
        for i in range(c.n_audio_layer)
    ])
    state = {
        "conv1.weight": _np(sd["encoder.conv1.weight"]),
        "conv1.bias": _np(sd["encoder.conv1.bias"]),
        "conv2.weight": _np(sd["encoder.conv2.weight"]),
        "conv2.bias": _np(sd["encoder.conv2.bias"]),
        "positional_embedding": pos,
        "ln_post.weight": _np(sd["encoder.ln_post.weight"]),
        "ln_post.bias": _np(sd["encoder.ln_post.bias"]),
    }
    state.update({f"blocks.{k}": v for k, v in blocks.items()})
    return state


def decoder_state_dict(sd, config: WhisperConfig,
                       int8_kv_scales=None) -> Dict[str, np.ndarray]:
    """``int8_kv_scales``: optional [n_layer] array of per-layer KV amax
    (the calibration's scale_y_quant_orig, ref weight.py:236-243)."""
    c = config
    blocks = _stack_blocks([
        _block_state(sd, f"decoder.blocks.{i}.", c.n_text_head, cross=True)
        for i in range(c.n_text_layer)
    ])
    emb = _np(sd["decoder.token_embedding.weight"])
    if c.padded_vocab != emb.shape[0]:
        # zero pad rows up to the tp-divisible vocab (ref pad_vocab_size,
        # T/_utils.py:194); logits are sliced back to n_vocab in-model
        emb = np.concatenate(
            [emb, np.zeros((c.padded_vocab - emb.shape[0], emb.shape[1]),
                           emb.dtype)], axis=0)
    state = {
        "token_embedding.weight": emb,
        "positional_embedding": _np(sd["decoder.positional_embedding"]),
        "ln.weight": _np(sd["decoder.ln.weight"]),
        "ln.bias": _np(sd["decoder.ln.bias"]),
    }
    state.update({f"blocks.{k}": v for k, v in blocks.items()})
    if int8_kv_scales is not None:
        t = np.asarray(int8_kv_scales, np.float32).reshape(c.n_text_layer, 1)
        # kv_orig_quant = 127/amax ... stored reference-style as 1/t and t
        state["blocks.attn.kv_orig_quant_scale"] = 1.0 / t
        state["blocks.attn.kv_quant_orig_scale"] = t
    return state


def cross_kv_state_dict(sd, config: WhisperConfig) -> Dict[str, np.ndarray]:
    c = config
    per_layer = []
    for i in range(c.n_text_layer):
        p = f"decoder.blocks.{i}.cross_attn."
        per_layer.append({
            "k_linear.weight": _np(sd[p + "key.weight"]),
            "v_linear.weight": _np(sd[p + "value.weight"]),
            "v_linear.bias": _np(sd[p + "value.bias"]),
        })
    blocks = _stack_blocks(per_layer)
    return {f"blocks.{k}": v for k, v in blocks.items()}


def load_openai_state_dict(sd, config: WhisperConfig,
                           quant_mode: QuantMode = QuantMode(0),
                           int8_kv_scales=None):
    """Build (encoder, decoder, cross_kv) modules with weights bound.
    ``sd``: OpenAI-format flat dict (torch tensors or numpy)."""
    from ...quantization.surgery import weight_only_quantize_state

    enc = WhisperEncoder(config, quant_mode)
    dec = WhisperDecoder(config, quant_mode)
    ckv = CrossAttnKV(config)
    enc_sd = encoder_state_dict(sd, config)
    dec_sd = decoder_state_dict(sd, config, int8_kv_scales=int8_kv_scales)
    if quant_mode.is_weight_only():
        enc, enc_sd = weight_only_quantize_state(enc, enc_sd, quant_mode)
        dec, dec_sd = weight_only_quantize_state(dec, dec_sd, quant_mode)
    enc.load_state_dict(enc_sd, strict=False)
    dec.load_state_dict(dec_sd, strict=False)
    ckv.load_state_dict(cross_kv_state_dict(sd, config))
    return enc, dec, ckv


# -- transformers (HuggingFace) checkpoint support --------------------------

_HF_BLOCK_MAP = {
    "self_attn.q_proj": "attn.query",
    "self_attn.k_proj": "attn.key",
    "self_attn.v_proj": "attn.value",
    "self_attn.out_proj": "attn.out",
    "self_attn_layer_norm": "attn_ln",
    "encoder_attn.q_proj": "cross_attn.query",
    "encoder_attn.k_proj": "cross_attn.key",
    "encoder_attn.v_proj": "cross_attn.value",
    "encoder_attn.out_proj": "cross_attn.out",
    "encoder_attn_layer_norm": "cross_attn_ln",
    "fc1": "mlp.0",
    "fc2": "mlp.2",
    "final_layer_norm": "mlp_ln",
}


def hf_to_openai_state_dict(hf_sd) -> Dict[str, np.ndarray]:
    """Map a transformers WhisperModel/WhisperForConditionalGeneration state
    dict to OpenAI naming (inverse of HF's conversion script semantics)."""
    out = {}
    for k, v in hf_sd.items():
        k = k.replace("model.", "", 1) if k.startswith("model.") else k
        if k in ("proj_out.weight",):
            continue  # tied to decoder.embed_tokens
        nk = None
        if k.startswith("encoder.conv") or k == "encoder.layer_norm.weight":
            nk = k.replace("encoder.layer_norm", "encoder.ln_post")
        elif k.startswith("encoder.layer_norm"):
            nk = k.replace("encoder.layer_norm", "encoder.ln_post")
        elif k == "encoder.embed_positions.weight":
            nk = "encoder.positional_embedding"
        elif k == "decoder.embed_positions.weight":
            nk = "decoder.positional_embedding"
        elif k == "decoder.embed_tokens.weight":
            nk = "decoder.token_embedding.weight"
        elif k.startswith("decoder.layer_norm"):
            nk = k.replace("decoder.layer_norm", "decoder.ln")
        elif ".layers." in k:
            side, rest = k.split(".layers.", 1)
            idx, sub = rest.split(".", 1)
            for hf_name, oa_name in _HF_BLOCK_MAP.items():
                if sub.startswith(hf_name + "."):
                    suffix = sub[len(hf_name) + 1:]
                    nk = f"{side}.blocks.{idx}.{oa_name}.{suffix}"
                    break
        else:
            nk = k
        if nk is not None:
            out[nk] = _np(v)
    return out
