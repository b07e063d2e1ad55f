"""Quantised compute ops.

Counterpart of the reference's ``tensorrt_llm/quantization/functional.py``
plugin wrappers: smooth_quant_gemm(:12), weight_only_quant_matmul(:51, see
ops/quant_matmul.py), smooth_quant_layer_norm(:77), quantize(:132)/
dequantize(:148), quantize_per_token(:160), quantize_tensor(:192).

On TPU the int8 x int8 GEMM runs natively on the MXU with int32
accumulation (no CUTLASS needed); the per-token / per-channel rescales are
fused by XLA into the surrounding elementwise graph.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..functional import layer_norm, round_half_away


def quantize(x, scale, dtype="int8"):
    """Static-scale symmetric quantisation (ref functional.py:132):
    q = clip(round(x * scale)).  ``scale`` is 1/step."""
    scaled = x.astype(jnp.float32) * scale
    return jnp.clip(round_half_away(scaled), -128, 127).astype(jnp.int8)


def dequantize(x, scale):
    """ref functional.py:148: x * scale (scale = step)."""
    return x.astype(jnp.float32) * scale


def quantize_per_token(x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic per-token int8 quantisation emitting scales
    (ref functional.py:160 / quantizePerTokenPlugin): scale_i = amax_i/127.
    x [..., K] -> (q int8 [..., K], scales fp32 [..., 1])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(round_half_away(x.astype(jnp.float32) / scale), -128,
                 127).astype(jnp.int8)
    return q, scale


def quantize_tensor(x, scale) -> jnp.ndarray:
    """Static per-tensor quantisation (ref functional.py:192); scale is
    1/step (the reference's *_orig_quant convention)."""
    return quantize(x, scale)


def smooth_quant_gemm(x_q, w_q, scales_x, scales_w, out_dtype=jnp.float32):
    """int8 x int8 -> int32 MXU GEMM with per-token x per-channel rescale
    (ref smoothQuantGemmPlugin).

    x_q [..., K] int8; w_q [K, N] int8; scales_x [..., 1] (per-token step)
    or scalar; scales_w [N] (per-channel step) or scalar.
    """
    acc = jnp.matmul(x_q.astype(jnp.int32), w_q.astype(jnp.int32),
                     preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * scales_x * scales_w
    return out.astype(out_dtype)


def smooth_quant_layer_norm(x, weight, bias, eps: float = 1e-5,
                            dynamic_act_scaling: bool = True,
                            act_scale=None):
    """Fused LN + int8 quantisation of the output
    (ref layernormQuantizationPlugin / functional.py:77).

    Returns (q int8, per-token scales) when dynamic, else q with the given
    static scale (scale = 1/step).
    """
    y = layer_norm(x, weight, bias, eps)
    if dynamic_act_scaling:
        return quantize_per_token(y)
    return quantize(y, act_scale)
