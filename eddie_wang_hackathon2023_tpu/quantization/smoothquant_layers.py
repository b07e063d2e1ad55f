"""SmoothQuant (W8A8) drop-in layers.

Counterpart of the reference's ``tensorrt_llm/quantization/layer.py``
SmoothQuant family: SmoothQuantLinear(:70)/SmoothQuantRowLinear(:159)/
SmoothQuantLayerNorm(:223)/SmoothQuantMLP(:385)/SmoothQuantAttention(:596).

Weights are stored pre-quantised int8 [K, N] with per-channel (or
per-tensor) float step scales; activations are quantised per-token on the
fly (dynamic) or with calibrated static scales.  The GEMM itself is the
int8 MXU path in quantization/functional.py.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..module import Module
from ..parameter import Parameter
from .functional import (quantize, quantize_per_token, smooth_quant_gemm,
                         smooth_quant_layer_norm)
from .mode import QuantMode


class SmoothQuantLinear(Module):
    """int8-activation x int8-weight linear.  qweight [in, out] int8;
    per_channel_scale [out] (or [1]) weight step; act_scale [1] static
    activation step when not per-token."""

    def __init__(self, in_features: int, out_features: int, bias: bool = True,
                 dtype=None, quant_mode: QuantMode = QuantMode.use_smooth_quant()):
        super().__init__()
        self.in_features = in_features
        self.out_features = out_features
        self.quant_mode = quant_mode
        self.dtype = dtype
        self.qweight = Parameter(shape=(in_features, out_features),
                                 dtype="int8")
        n_scale = out_features if quant_mode.has_per_channel_scaling() else 1
        self.per_channel_scale = Parameter(shape=(n_scale,), dtype="float32")
        if not quant_mode.has_per_token_dynamic_scaling():
            self.act_scale = Parameter(shape=(1,), dtype="float32")
        else:
            self.register_parameter("act_scale", None)
        if bias:
            self.bias = Parameter(shape=(out_features,), dtype=dtype)
        else:
            self.register_parameter("bias", None)

    def forward(self, x):
        """Accepts float activations (quantised here) or a tuple
        (int8, per-token scales) from a SmoothQuantLayerNorm."""
        if isinstance(x, tuple):
            x_q, sx = x
        elif self.quant_mode.has_per_token_dynamic_scaling():
            x_q, sx = quantize_per_token(x)
        else:
            sx = self.act_scale.value
            x_q = quantize(x, 1.0 / sx)
        out = smooth_quant_gemm(x_q, self.qweight.value, sx,
                                self.per_channel_scale.value)
        if self.bias is not None:
            out = out + self.bias.value.astype(out.dtype)
        return out.astype(self.dtype or jnp.float32)


class SmoothQuantRowLinear(SmoothQuantLinear):
    """Row-parallel variant (in-features sharded; ref layer.py:159)."""


class SmoothQuantLayerNorm(Module):
    """LN emitting int8 + per-token scales (ref layer.py:223)."""

    def __init__(self, normalized_shape: int, eps: float = 1e-5, dtype=None,
                 quant_mode: QuantMode = QuantMode.use_smooth_quant()):
        super().__init__()
        self.eps = eps
        self.quant_mode = quant_mode
        self.weight = Parameter(shape=(normalized_shape,), dtype=dtype)
        self.bias = Parameter(shape=(normalized_shape,), dtype=dtype)
        if not quant_mode.has_per_token_dynamic_scaling():
            self.act_scale = Parameter(shape=(1,), dtype="float32")
        else:
            self.register_parameter("act_scale", None)

    def forward(self, x):
        return smooth_quant_layer_norm(
            x, self.weight.value, self.bias.value, self.eps,
            dynamic_act_scaling=self.quant_mode.has_per_token_dynamic_scaling(),
            act_scale=(None if self.act_scale is None
                       else 1.0 / self.act_scale.value))


class SmoothQuantQKVLinear(Module):
    """Fused-QKV SmoothQuant projection (the SmoothQuantAttention qkv of
    ref layer.py:596, restricted to the projection — attention math is
    shared with the float path).  qweight [in, 3*H*hd] int8."""

    def __init__(self, hidden_size: int, num_heads: int, num_kv_heads: int,
                 head_dim: int, bias: bool = True, dtype=None,
                 quant_mode: QuantMode = QuantMode.use_smooth_quant()):
        super().__init__()
        assert num_kv_heads == num_heads, \
            "smooth-quant MQA/GQA qkv not implemented yet"
        self.num_heads = num_heads
        self.num_kv_heads = num_kv_heads
        self.head_dim = head_dim
        self.quant_mode = quant_mode
        self.dtype = dtype
        out = 3 * num_heads * head_dim
        self.qweight = Parameter(shape=(hidden_size, out), dtype="int8")
        n_scale = out if quant_mode.has_per_channel_scaling() else 1
        self.per_channel_scale = Parameter(shape=(n_scale,), dtype="float32")
        if not quant_mode.has_per_token_dynamic_scaling():
            self.act_scale = Parameter(shape=(1,), dtype="float32")
        else:
            self.register_parameter("act_scale", None)
        if bias:
            self.bias = Parameter(shape=(3, num_heads, head_dim), dtype=dtype)
        else:
            self.register_parameter("bias", None)

    def forward(self, x):
        if isinstance(x, tuple):
            x_q, sx = x
        elif self.quant_mode.has_per_token_dynamic_scaling():
            x_q, sx = quantize_per_token(x)
        else:
            sx = self.act_scale.value
            x_q = quantize(x, 1.0 / sx)
        b, l = x_q.shape[0], x_q.shape[1]
        out = smooth_quant_gemm(x_q, self.qweight.value, sx,
                                self.per_channel_scale.value)
        out = out.astype(self.dtype or jnp.float32)
        qkv = out.reshape(b, l, 3, self.num_heads, self.head_dim)
        if self.bias is not None:
            qkv = qkv + self.bias.value.astype(qkv.dtype)
        return qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]


def smooth_quantize_weights(w, per_channel: bool = True):
    """Offline: float [out, in] -> (int8 [in, out], step scales)."""
    import numpy as np
    wt = np.asarray(w, np.float32).T  # [in, out]
    if per_channel:
        amax = np.abs(wt).max(axis=0)
    else:
        amax = np.asarray([np.abs(wt).max()])
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(wt / scale[None, :] if per_channel else wt / scale),
                -127, 127).astype(np.int8)
    return q, scale


def apply_smoothing(scales, gemm_weight, layernorm_weight=None,
                    layernorm_bias=None):
    """ref E/whisper/smoothquant.py:21-41 — divide the LN output channels by
    ``scales`` and multiply them into the following GEMM's input channels
    (outlier migration)."""
    import numpy as np
    scales = np.asarray(scales, np.float32)
    out = dict()
    out["gemm_weight"] = np.asarray(gemm_weight, np.float32) * scales[None, :]
    if layernorm_weight is not None:
        out["layernorm_weight"] = np.asarray(layernorm_weight,
                                             np.float32) / scales
    if layernorm_bias is not None:
        out["layernorm_bias"] = np.asarray(layernorm_bias, np.float32) / scales
    return out


def smooth_gemm(gemm_weight, act_amax, layernorm_weight=None,
                layernorm_bias=None, alpha: float = 0.5):
    """ref smoothquant.py:44-60: s = amax_x^a / amax_w^(1-a), clipped."""
    import numpy as np
    w = np.asarray(gemm_weight, np.float32)
    w_amax = np.abs(w).max(axis=0)
    a_amax = np.asarray(act_amax, np.float32)
    scales = np.clip(a_amax ** alpha / np.maximum(w_amax, 1e-8) ** (1 - alpha),
                     1e-5, None)
    return scales, apply_smoothing(scales, w, layernorm_weight, layernorm_bias)
