"""Quantised drop-in layers.

Counterpart of the reference's ``tensorrt_llm/quantization/layer.py``:
``WeightOnlyQuantLinear``/``WeightOnlyQuantRowLinear`` (:268,:338) — int8/int4
weights with per-out-channel scales — plus the fused-QKV variant needed by
our head-major attention layout.  The reference stores the quantised weight
as fake-fp32 views of CUDA-interleaved int8 ("workaround for trt not
supporting int8 inputs", E/whisper/weight.py:76-83); here int8 is a
first-class dtype and the layout is the natural K-major [in, out] the MXU
consumes (see ops/quant_matmul.py).

SmoothQuant (int8 activations x int8 weights with per-token/per-channel
rescale, ref layer.py:70-265) lives in smoothquant_layers.py.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..module import Module
from ..parameter import Parameter
from ..parallel.mapping import TP_AXIS
from ..ops.quant_matmul import unpack_int4, weight_only_quant_matmul


class WeightOnlyQuantLinear(Module):
    """int8/int4-weight linear; qweight [in, out] (packed [in/2, out] for
    int4), per_channel_scale [out].  Column-parallel: out dim sharded."""

    def __init__(self, in_features: int, out_features: int, bias: bool = True,
                 dtype=None, bits: int = 8, tp_size: int = 1,
                 tp_dim: int = 0, gather_output: bool = True,
                 group_size: int = 0):
        super().__init__()
        self.in_features = in_features
        self.out_features = out_features
        self.bits = bits
        self.dtype = dtype
        # int4 group-wise scale granularity along K (0 = per-out-channel;
        # see ops.quant_matmul.quantize_weights_int4)
        self.group_size = group_size if bits == 4 else 0
        # consulted by the fused-decode-kernel eligibility checks
        # (layers/attention.py proj_fusion_hoistable): tp>1 needs the
        # XLA dense path's automatic partial-sum/gather handling
        self.tp_size = tp_size
        k = in_features if bits == 8 else in_features // 2
        w_pspec = P(None, TP_AXIS) if tp_dim == 0 else P(TP_AXIS, None)
        self.qweight = Parameter(shape=(k, out_features), dtype="int8",
                                 pspec=w_pspec)
        if self.group_size:
            # [K/G, N]: groups follow K (row-parallel shards K)
            self.per_channel_scale = Parameter(
                shape=(in_features // self.group_size, out_features),
                dtype="float32",
                pspec=(P(None, TP_AXIS) if tp_dim == 0
                       else P(TP_AXIS, None)))
        else:
            self.per_channel_scale = Parameter(
                shape=(out_features,), dtype="float32",
                pspec=P(TP_AXIS) if tp_dim == 0 else P())
        if bias:
            self.bias = Parameter(shape=(out_features,), dtype=dtype,
                                  pspec=P(TP_AXIS) if tp_dim == 0 else P())
        else:
            self.register_parameter("bias", None)

    def forward(self, x):
        out = weight_only_quant_matmul(x, self.qweight.value,
                                       self.per_channel_scale.value,
                                       bits=self.bits)
        if self.bias is not None:
            out = out + self.bias.value.astype(out.dtype)
        return out


class WeightOnlyQuantRowLinear(WeightOnlyQuantLinear):
    """Row-parallel variant (in dim sharded, ref layer.py:338)."""

    def __init__(self, in_features: int, out_features: int, bias: bool = True,
                 dtype=None, bits: int = 8, tp_size: int = 1,
                 group_size: int = 0):
        super().__init__(in_features, out_features, bias=bias, dtype=dtype,
                         bits=bits, tp_size=tp_size, tp_dim=1,
                         group_size=group_size)


class WeightOnlyQuantQKVLinear(Module):
    """Quantised fused-QKV projection (head-major).  qweight [in, 3*H*hd]
    K-major int8 (int4: [in/2, 3*H*hd]); scales [3*H*hd].

    MQA/GQA (num_kv_heads < num_heads — round 5): one fused qweight
    [in, (H + 2*Hkv)*hd] with the out-columns ordered q | k | v, so the
    GEMM stays a single MXU dispatch; bias splits into ``bias`` [H, hd]
    + ``kv_bias`` [2, Hkv, hd] mirroring QKVLinear's separate-KV layout
    (so float<->quantised state keys line up)."""

    def __init__(self, hidden_size: int, num_heads: int, num_kv_heads: int,
                 head_dim: int, bias: bool = True, dtype=None, bits: int = 8,
                 group_size: int = 0):
        super().__init__()
        assert num_heads % num_kv_heads == 0, (num_heads, num_kv_heads)
        self.num_heads = num_heads
        self.num_kv_heads = num_kv_heads
        self.head_dim = head_dim
        self.bits = bits
        self.group_size = group_size if bits == 4 else 0
        equal = num_kv_heads == num_heads
        out = ((3 * num_heads if equal else num_heads + 2 * num_kv_heads)
               * head_dim)
        k = hidden_size if bits == 8 else hidden_size // 2
        self.qweight = Parameter(shape=(k, out), dtype="int8",
                                 pspec=P(None, TP_AXIS))
        if self.group_size:
            self.per_channel_scale = Parameter(
                shape=(hidden_size // self.group_size, out),
                dtype="float32", pspec=P(None, TP_AXIS))
        else:
            self.per_channel_scale = Parameter(shape=(out,), dtype="float32",
                                               pspec=P(TP_AXIS))
        if bias:
            if equal:
                self.bias = Parameter(shape=(3, num_heads, head_dim),
                                      dtype=dtype,
                                      pspec=P(None, TP_AXIS, None))
            else:
                self.bias = Parameter(shape=(num_heads, head_dim),
                                      dtype=dtype, pspec=P(TP_AXIS, None))
                self.kv_bias = Parameter(shape=(2, num_kv_heads, head_dim),
                                         dtype=dtype)
        else:
            self.register_parameter("bias", None)
            if not equal:
                self.register_parameter("kv_bias", None)

    def forward(self, x):
        b, l, _ = x.shape
        h, hk, hd = self.num_heads, self.num_kv_heads, self.head_dim
        out = weight_only_quant_matmul(x, self.qweight.value,
                                       self.per_channel_scale.value,
                                       bits=self.bits)
        if hk == h:
            qkv = out.reshape(b, l, 3, h, hd)
            if self.bias is not None:
                qkv = qkv + self.bias.value.astype(qkv.dtype)
            return qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = out[..., :h * hd].reshape(b, l, h, hd)
        kv = out[..., h * hd:].reshape(b, l, 2, hk, hd)
        if self.bias is not None:
            q = q + self.bias.value.astype(q.dtype)
            kv = kv + self.kv_bias.value.astype(kv.dtype)
        return q, kv[:, :, 0], kv[:, :, 1]
