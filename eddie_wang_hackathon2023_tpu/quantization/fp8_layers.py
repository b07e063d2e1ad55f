"""FP8 (e4m3) quantized linear family.

Counterpart of the reference's ``FP8Linear / FP8RowLinear / FP8MLP``
(``T/quantization/layer.py:493,442,559``): QDQ layers — the float weight is
kept, and each forward quantizes activations and weight to FP8 with
per-tensor scaling factors, dequantizes, and runs the matmul — so the
numerics are *real* e4m3 rounding (saturating IEEE cast via
``jnp.float8_e4m3fn``) while the matmul runs at the accumulation precision.

On hardware with native FP8 matmul units the Q->DQ pair around the matmul
collapses into an fp8 GEMM (that is exactly how TRT consumes these QDQ
nodes); on v5e (no fp8 MXU) XLA executes the same graph with a bf16 GEMM,
preserving capability and numerics.  Sharding follows Linear/RowLinear:
FP8Linear splits out-features over tp ('column'), FP8RowLinear splits
in-features and the activation-scale applies before the partial matmul.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..functional import ACT2FN
from ..module import Module
from ..parallel.mapping import TP_AXIS
from ..parameter import Parameter

FP8_MAX = 448.0     # e4m3fn finite max


def quantize_fp8(x, scale):
    """x / scale -> saturating cast to e4m3 (ref quantize(..., 'fp8'),
    T/quantization/functional.py:132)."""
    scaled = x.astype(jnp.float32) / scale
    scaled = jnp.clip(scaled, -FP8_MAX, FP8_MAX)
    return scaled.astype(jnp.float8_e4m3fn)


def dequantize_fp8(q, scale, dtype=jnp.float32):
    """ref dequantize (T/quantization/functional.py:148)."""
    return (q.astype(jnp.float32) * scale).astype(dtype)


def fp8_qdq(x, scale, dtype=None):
    """Quantize-dequantize round trip (what the reference graph encodes
    around every FP8 matmul operand)."""
    return dequantize_fp8(quantize_fp8(x, scale), scale,
                          dtype or jnp.float32)


class FP8Linear(Module):
    """ref FP8Linear (T/quantization/layer.py:493-558): column-parallel."""

    def __init__(self, in_features: int, out_features: int, bias: bool = True,
                 dtype=None, gather_output: bool = True):
        super().__init__()
        self.in_features = in_features
        self.out_features = out_features
        self.dtype = dtype
        self.gather_output = gather_output
        self.weight = Parameter(shape=(out_features, in_features),
                                dtype=dtype, pspec=P(TP_AXIS, None))
        self.activation_scaling_factor = Parameter(shape=(1,),
                                                   dtype="float32")
        self.weights_scaling_factor = Parameter(shape=(1,), dtype="float32")
        if bias:
            self.bias = Parameter(shape=(out_features,), dtype=dtype,
                                  pspec=P(TP_AXIS))
        else:
            self.register_parameter("bias", None)

    def _qdq_matmul(self, x):
        a_scale = self.activation_scaling_factor.value
        w_scale = self.weights_scaling_factor.value
        xq = fp8_qdq(x, a_scale)
        wq = fp8_qdq(self.weight.value, w_scale)
        y = jnp.matmul(xq, wq.T, preferred_element_type=jnp.float32)
        return y.astype(x.dtype)

    def forward(self, x):
        y = self._qdq_matmul(x)
        if self.bias is not None:
            y = y + self.bias.value.astype(y.dtype)
        return y


class FP8RowLinear(FP8Linear):
    """ref FP8RowLinear (T/quantization/layer.py:442-491): row-parallel —
    in-features sharded; XLA inserts the all-reduce from the pspecs."""

    def __init__(self, in_features: int, out_features: int, bias: bool = True,
                 dtype=None):
        super().__init__(in_features, out_features, bias=bias, dtype=dtype)
        self.weight.pspec = P(None, TP_AXIS)
        if self.bias is not None:
            self.bias.pspec = P()


class FP8MLP(Module):
    """ref FP8MLP (T/quantization/layer.py:559-595)."""

    def __init__(self, hidden_size: int, ffn_hidden_size: int,
                 hidden_act: str = "gelu", bias: bool = True, dtype=None):
        super().__init__()
        if hidden_act not in ACT2FN:
            raise ValueError(f"unsupported activation: {hidden_act}")
        self.fc = FP8Linear(hidden_size, ffn_hidden_size, bias=bias,
                            dtype=dtype, gather_output=False)
        self.proj = FP8RowLinear(ffn_hidden_size, hidden_size, bias=bias,
                                 dtype=dtype)
        self.hidden_act = hidden_act

    def forward(self, x):
        return self.proj(ACT2FN[self.hidden_act](self.fc(x)))


def fp8_scales_from_amax(amax: float):
    """Per-tensor scaling factor from a calibration amax (TRT convention:
    scale = amax / fp8_max; quantize divides by it)."""
    return max(float(amax), 1e-8) / FP8_MAX
