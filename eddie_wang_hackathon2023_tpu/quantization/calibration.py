"""INT8 KV-cache calibration.

Counterpart of the reference's calibration path
(``E/whisper/torch_whisper_convert.py:122-167`` + ``smoothquant.py:117``):
there, forward hooks on every torch nn.Linear record activation ranges
while real audio is greedily decoded, and the per-layer
``scale_y_quant_orig`` files feed the engine build.

Here the ranges come straight off the device: a greedy transcription fills
the decoder's in-place KV cache, and a teacher-forced prefill returns the
per-layer abs-max of the cached K/V (self-attention only — cross-KV stays
16-bit, matching the reference).  No hooks, no extra model code.
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def kv_abs_max(decoder, dec_params, tokens, cross_kv, lengths) -> np.ndarray:
    """Per-layer amax(|K|,|V|) over the valid positions of a teacher-forced
    prefill.  tokens [B, T] int32; lengths [B] valid lengths."""
    t = tokens.shape[1]

    @jax.jit
    def run(params, tokens, cross_kv, lengths):
        cache = decoder.new_kv_cache(tokens.shape[0], max_len=t)
        _, cache = decoder.apply(params, tokens, cache, cross_kv, 0, lengths)
        # cache [L, B, 2, H, D, T] (seq-minor); mask positions >= length
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, 1, t), 5)
        valid = pos < lengths[None, :, None, None, None, None]
        abskv = jnp.where(valid, jnp.abs(cache.astype(jnp.float32)), 0.0)
        return jnp.max(abskv, axis=(1, 2, 3, 4, 5))

    return np.asarray(run(dec_params, tokens, cross_kv, lengths))


def calibrate_int8_kv(pipeline, mels: List[np.ndarray],
                      batch_size: int = 1) -> np.ndarray:
    """Greedy-decode calibration clips and return per-layer KV amax
    [n_text_layer] — the ``scale_y_quant_orig`` equivalent consumed by
    ``decoder_state_dict(int8_kv_scales=...)`` (kv_orig_quant = 127/amax
    via the reference's 1/t convention is handled there)."""
    pipe = pipeline
    pipe._ensure_params()
    n_layer = pipe.config.n_text_layer
    amax = np.zeros((n_layer,), np.float32)
    for i in range(0, len(mels), batch_size):
        mel = np.stack(mels[i:i + batch_size])
        xa = pipe.get_audio_features(mel)
        cross = pipe.precompute_cross_kv(xa)
        tokens, lengths, _, _ = pipe.main_loop(xa, cross)
        t = int(lengths.max())
        layer_amax = kv_abs_max(pipe.decoder, pipe._params_dec,
                                jnp.asarray(tokens[:, :t], jnp.int32), cross,
                                jnp.asarray(lengths, jnp.int32))
        amax = np.maximum(amax, layer_amax)
    # reference stores amax/127 as the dequant step t (scale_y_quant_orig);
    # convert.decoder_state_dict expects the step directly
    return amax / 127.0


def calibrate_cross_kv_scales(cross_attn_kv, ckv_params,
                              xas: List[np.ndarray]) -> np.ndarray:
    """Per-layer cross-KV quant scales [n_text_layer] fp32 for
    ``CrossAttnKV(static_scale=True)``: max of the dynamic per-layer
    amax/127 over the calibration utterances' encoder outputs ``xas``
    ([B, 1500, d] each).  Same scale model as the reference's static
    int8-KV calibration (``E/whisper/torch_whisper_convert.py:122-167``);
    the dynamic-scale path computes the identical quantity at runtime."""
    wk = ckv_params["blocks.k_linear.weight"]
    wv = ckv_params["blocks.v_linear.weight"]
    bv = ckv_params["blocks.v_linear.bias"]

    @jax.jit
    def amax_of(xa):
        k = jnp.einsum("bsi,loi->lbos", xa, wk)
        v = jnp.einsum("bsi,loi->lbos", xa, wv) \
            + bv[:, None, :, None].astype(wv.dtype)
        kv = jnp.stack([k, v], axis=2).astype(jnp.float32)
        return jnp.max(jnp.abs(kv), axis=(1, 2, 3, 4))

    amax = np.zeros((wk.shape[0],), np.float32)
    for xa in xas:
        amax = np.maximum(amax, np.asarray(amax_of(jnp.asarray(xa))))
    return np.maximum(amax, 1e-6) / 127.0
