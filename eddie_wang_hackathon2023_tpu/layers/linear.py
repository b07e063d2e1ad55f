"""Linear layers with tensor-parallel layout annotations.

Counterpart of the reference's ``tensorrt_llm/layers/linear.py``:

* ``Linear``/``ColumnLinear`` (linear.py:38-99): splits out-features across
  TP ranks, optional all-gather when ``gather_output``.
* ``RowLinear`` (linear.py:101-138): splits in-features, all-reduces the
  partial products.

TPU-native: the weight keeps torch layout [out, in] but carries a
PartitionSpec — ('tp', None) for column, (None, 'tp') for row.  Under pjit
the matmul against a row-sharded weight produces partial sums that XLA
all-reduces (or reduce-scatters) over ICI automatically; no collective is
written by hand and no per-rank weight files exist.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..functional import matmul
from ..module import Module
from ..parameter import Parameter
from ..parallel.mapping import TP_AXIS


class Linear(Module):
    """Column-parallel linear (the reference aliases ColumnLinear = Linear)."""

    def __init__(self, in_features: int, out_features: int, bias: bool = True,
                 dtype=None, tp_group=None, tp_size: int = 1,
                 gather_output: bool = True):
        super().__init__()
        self.in_features = in_features
        self.out_features = out_features
        self.dtype = dtype
        self.tp_size = tp_size
        self.gather_output = gather_output
        self.weight = Parameter(shape=(out_features, in_features), dtype=dtype,
                                pspec=P(TP_AXIS, None))
        if bias:
            self.bias = Parameter(shape=(out_features,), dtype=dtype,
                                  pspec=P(TP_AXIS))
        else:
            self.register_parameter("bias", None)

    def forward(self, x):
        out = matmul(x, self.weight.value, transb=True)
        if self.bias is not None:
            out = out + self.bias.value.astype(out.dtype)
        return out


ColumnLinear = Linear


class RowLinear(Module):
    """Row-parallel linear: in-features sharded, output all-reduced by XLA."""

    def __init__(self, in_features: int, out_features: int, bias: bool = True,
                 dtype=None, tp_group=None, tp_size: int = 1):
        super().__init__()
        self.in_features = in_features
        self.out_features = out_features
        self.dtype = dtype
        self.tp_size = tp_size
        self.weight = Parameter(shape=(out_features, in_features), dtype=dtype,
                                pspec=P(None, TP_AXIS))
        if bias:
            # bias replicated; added once after the reduction
            self.bias = Parameter(shape=(out_features,), dtype=dtype, pspec=P())
        else:
            self.register_parameter("bias", None)

    def forward(self, x):
        out = matmul(x, self.weight.value, transb=True)
        if self.bias is not None:
            out = out + self.bias.value.astype(out.dtype)
        return out
