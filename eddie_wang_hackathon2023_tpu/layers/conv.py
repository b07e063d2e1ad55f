"""Convolution layers.

The hackathon's headline op addition was conv1d built on conv2d
(``tensorrt_llm/functional.py:2202-2244``, ``layers/conv.py:52-94`` storing
the weight as [out, in, k, 1]).  On TPU, ``lax.conv_general_dilated`` is
natively N-dimensional and XLA maps it straight onto the MXU, so Conv1d here
stores the natural [out, in, k] and calls the 1-D convolution directly —
no reshape trick needed.
"""
from __future__ import annotations

from typing import Tuple, Union

from ..functional import conv1d, conv2d, conv_transpose2d
from ..module import Module
from ..parameter import Parameter


def _pair(v) -> Tuple[int, int]:
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


class Conv1d(Module):

    def __init__(self, in_channels: int, out_channels: int, kernel_size: int,
                 stride: int = 1, padding: int = 0, dilation: int = 1,
                 groups: int = 1, bias: bool = True, dtype=None):
        super().__init__()
        self.stride, self.padding = stride, padding
        self.dilation, self.groups = dilation, groups
        self.weight = Parameter(
            shape=(out_channels, in_channels // groups, kernel_size), dtype=dtype)
        if bias:
            self.bias = Parameter(shape=(out_channels,), dtype=dtype)
        else:
            self.register_parameter("bias", None)

    def forward(self, x):
        b = self.bias.value if self.bias is not None else None
        return conv1d(x, self.weight.value, b, self.stride, self.padding,
                      self.dilation, self.groups)


class Conv2d(Module):

    def __init__(self, in_channels: int, out_channels: int,
                 kernel_size: Union[int, Tuple[int, int]],
                 stride=1, padding=0, dilation=1, groups: int = 1,
                 bias: bool = True, dtype=None):
        super().__init__()
        kh, kw = _pair(kernel_size)
        self.stride, self.padding = _pair(stride), _pair(padding)
        self.dilation, self.groups = _pair(dilation), groups
        self.weight = Parameter(
            shape=(out_channels, in_channels // groups, kh, kw), dtype=dtype)
        if bias:
            self.bias = Parameter(shape=(out_channels,), dtype=dtype)
        else:
            self.register_parameter("bias", None)

    def forward(self, x):
        b = self.bias.value if self.bias is not None else None
        return conv2d(x, self.weight.value, b, self.stride, self.padding,
                      self.dilation, self.groups)


class ConvTranspose2d(Module):

    def __init__(self, in_channels: int, out_channels: int,
                 kernel_size: Union[int, Tuple[int, int]],
                 stride=1, padding=0, bias: bool = True, dtype=None):
        super().__init__()
        kh, kw = _pair(kernel_size)
        self.stride, self.padding = _pair(stride), _pair(padding)
        self.weight = Parameter(
            shape=(in_channels, out_channels, kh, kw), dtype=dtype)
        if bias:
            self.bias = Parameter(shape=(out_channels,), dtype=dtype)
        else:
            self.register_parameter("bias", None)

    def forward(self, x):
        b = self.bias.value if self.bias is not None else None
        return conv_transpose2d(x, self.weight.value, b, self.stride,
                                self.padding)
