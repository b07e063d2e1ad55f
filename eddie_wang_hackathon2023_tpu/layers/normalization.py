"""Normalisation layers (ref ``tensorrt_llm/layers/normalization.py:6,33,57``).

fp32 statistics on TPU regardless of storage dtype — matches the reference's
layernormPlugin accumulation and is required for Whisper WER parity.
"""
from __future__ import annotations

from ..functional import group_norm, layer_norm, rms_norm
from ..module import Module
from ..parameter import Parameter


class LayerNorm(Module):

    def __init__(self, normalized_shape: int, eps: float = 1e-5,
                 elementwise_affine: bool = True, dtype=None):
        super().__init__()
        self.normalized_shape = normalized_shape
        self.eps = eps
        if elementwise_affine:
            self.weight = Parameter(shape=(normalized_shape,), dtype=dtype)
            self.bias = Parameter(shape=(normalized_shape,), dtype=dtype)
        else:
            self.register_parameter("weight", None)
            self.register_parameter("bias", None)

    def forward(self, x):
        w = self.weight.value if self.weight is not None else None
        b = self.bias.value if self.bias is not None else None
        return layer_norm(x, w, b, self.eps)


class RmsNorm(Module):

    def __init__(self, normalized_shape: int, eps: float = 1e-6, dtype=None):
        super().__init__()
        self.normalized_shape = normalized_shape
        self.eps = eps
        self.weight = Parameter(shape=(normalized_shape,), dtype=dtype)

    def forward(self, x):
        return rms_norm(x, self.weight.value, self.eps)


class GroupNorm(Module):

    def __init__(self, num_groups: int, num_channels: int, eps: float = 1e-5,
                 affine: bool = True, dtype=None):
        super().__init__()
        self.num_groups = num_groups
        self.num_channels = num_channels
        self.eps = eps
        if affine:
            self.weight = Parameter(shape=(num_channels,), dtype=dtype)
            self.bias = Parameter(shape=(num_channels,), dtype=dtype)
        else:
            self.register_parameter("weight", None)
            self.register_parameter("bias", None)

    def forward(self, x):
        w = self.weight.value if self.weight is not None else None
        b = self.bias.value if self.bias is not None else None
        return group_norm(x, self.num_groups, w, b, self.eps)
