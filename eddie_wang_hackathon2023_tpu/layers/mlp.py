"""MLP blocks (ref ``tensorrt_llm/layers/mlp.py:6,43``)."""
from __future__ import annotations

from ..functional import ACT2FN
from ..module import Module
from .linear import ColumnLinear, RowLinear


class MLP(Module):

    def __init__(self, hidden_size: int, ffn_hidden_size: int,
                 hidden_act: str = "gelu", bias: bool = True, dtype=None,
                 tp_group=None, tp_size: int = 1):
        super().__init__()
        self.fc = ColumnLinear(hidden_size, ffn_hidden_size, bias=bias,
                               dtype=dtype, tp_group=tp_group, tp_size=tp_size,
                               gather_output=False)
        self.proj = RowLinear(ffn_hidden_size, hidden_size, bias=bias,
                              dtype=dtype, tp_group=tp_group, tp_size=tp_size)
        self.hidden_act = hidden_act

    def forward(self, x):
        return self.proj(ACT2FN[self.hidden_act](self.fc(x)))


class GatedMLP(MLP):
    """ref mlp.py:43 — adds a parallel gate projection (LLaMA-style)."""

    def __init__(self, hidden_size: int, ffn_hidden_size: int,
                 hidden_act: str = "silu", bias: bool = False, dtype=None,
                 tp_group=None, tp_size: int = 1):
        super().__init__(hidden_size, ffn_hidden_size, hidden_act, bias, dtype,
                         tp_group, tp_size)
        self.gate = ColumnLinear(hidden_size, ffn_hidden_size, bias=bias,
                                 dtype=dtype, tp_group=tp_group,
                                 tp_size=tp_size, gather_output=False)

    def forward(self, x):
        act = ACT2FN[self.hidden_act](self.fc(x))
        return self.proj(act * self.gate(x))
