"""Activation / casting / pooling modules (ref ``tensorrt_llm/layers/
activation.py``, ``cast.py``, ``pooling.py``)."""
from __future__ import annotations

from ..functional import avg_pool2d, gelu, mish
from ..module import Module
from .._utils import str_dtype_to_jnp


class Gelu(Module):

    def forward(self, x):
        return gelu(x)


class Mish(Module):

    def forward(self, x):
        return mish(x)


class Cast(Module):

    def __init__(self, output_dtype: str = "float32"):
        super().__init__()
        self.output_dtype = str_dtype_to_jnp(output_dtype)

    def forward(self, x):
        return x.astype(self.output_dtype)


class AvgPool2d(Module):

    def __init__(self, kernel_size, stride=None, padding=(0, 0)):
        super().__init__()
        self.kernel_size = tuple(kernel_size)
        self.stride = tuple(stride) if stride is not None else None
        self.padding = tuple(padding)

    def forward(self, x):
        return avg_pool2d(x, self.kernel_size, self.stride, self.padding)
