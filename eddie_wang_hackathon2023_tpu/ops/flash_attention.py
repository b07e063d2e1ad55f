"""Context-phase fused attention (flash attention).

Counterpart of the reference's context FMHA
(``kernels/contextFusedMultiHeadAttention/``, 3.4k LoC of pre-compiled
cubins + runner): on TPU the fused kernel is Pallas flash attention — tiled
online-softmax so the [L, L] score matrix never round-trips HBM.  The
un-fused XLA formulation (ops/attention.py multihead_attention) remains the
numerical reference and the fallback on CPU and for shapes the kernel
doesn't fit (tiny L, extra bias terms like ALiBi).

Numerics: fp32 online softmax accumulation — same contract as the
reference's fp16-I/O fp32-acc FMHA and our explicit path.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .attention import multihead_attention

_MIN_FLASH_LEN = 128  # below this the unfused path is faster/simpler


def _pad_to(x, axis: int, mult: int):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x, 0
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), pad


def flash_mha(q, k, v, causal: bool = False, scale: Optional[float] = None,
              bias=None, fp32_softmax: bool = True):
    """q [B,H,Lq,D], k/v [B,H,Lk,D] -> [B,H,Lq,D].

    Dispatches to the Pallas flash kernel on TPU for large Lq; otherwise
    the XLA path.  ``bias`` forces the XLA path (ALiBi etc.).
    """
    lq, lk = q.shape[2], k.shape[2]
    from .._utils import on_tpu
    use_flash = (on_tpu() and bias is None
                 and lq >= _MIN_FLASH_LEN and q.shape[-1] % 64 == 0)
    if not use_flash:
        cb = None
        if causal:
            from ..functional import causal_bias
            cb = causal_bias(lq, lk, jnp.float32)
            cb = cb if bias is None else cb + bias
        else:
            cb = bias
        return multihead_attention(q, k, v, bias=cb, scale=scale,
                                   fp32_softmax=fp32_softmax)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    orig_dtype = q.dtype
    # kernel wants both operand seq dims padded to its block multiples
    q_p, pad_q = _pad_to(q, 2, 128)
    k_p, pad_k = _pad_to(k, 2, 128)
    v_p, _ = _pad_to(v, 2, 128)
    if pad_k:
        # padded keys must not contribute: neutralised via segment ids
        from jax.experimental.pallas.ops.tpu.flash_attention import SegmentIds
        bq = q_p.shape[0]
        q_seg = jnp.zeros((bq, q_p.shape[2]), jnp.int32)
        k_seg = jnp.concatenate(
            [jnp.zeros((bq, lk), jnp.int32),
             jnp.ones((bq, pad_k), jnp.int32)], axis=1)
        segment_ids = SegmentIds(q=q_seg, kv=k_seg)
    else:
        segment_ids = None
    lq_p, lk_p = q_p.shape[2], k_p.shape[2]
    from ..plugin import get_plugin_config
    bq, bkm, bk = get_plugin_config().get_flash_blocks()
    block_sizes = BlockSizes(
        block_q=min(bq, lq_p), block_k_major=min(bkm, lk_p),
        block_k=min(bk, lk_p), block_b=1)
    out = flash_attention(q_p, k_p, v_p, segment_ids=segment_ids,
                          causal=causal, sm_scale=float(scale),
                          block_sizes=block_sizes)
    if pad_q:
        out = out[:, :, :lq]
    return out.astype(orig_dtype)
