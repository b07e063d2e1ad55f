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

from .attention import length_mask_bias, multihead_attention

_MIN_FLASH_LEN = 128  # below this the unfused path is faster/simpler

# -- custom-kernel registry (the openai_triton-plugin analogue) ----------
# The reference lets users wrap their own attention kernel as a TRT
# plugin (E/openai_triton/: Triton kernel -> AoT -> plugin -> engine).
# Here the same extension point is one function: register a Pallas (or
# any jax) implementation and every context-attention call routes
# through it.  See examples/custom_kernel/ for a from-scratch Pallas
# flash kernel plugged in this way.
_custom_mha = None


def set_custom_mha(fn) -> None:
    """Install ``fn(q, k, v, *, causal, scale, kv_valid_len) -> ctx`` as
    the context-attention kernel (None restores the built-in dispatch).
    Called before tracing; jitted programs keep whatever was active when
    they were traced."""
    global _custom_mha
    _custom_mha = fn


def _pad_to(x, axis: int, mult: int):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x, 0
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), pad


def flash_mha(q, k, v, causal: bool = False, scale: Optional[float] = None,
              bias=None, fp32_softmax: bool = True,
              kv_valid_len: Optional[int] = None):
    """q [B,H,Lq,D], k/v [B,H,Lk,D] -> [B,H,Lq,D].

    Dispatches to the Pallas flash kernel on TPU for large Lq; otherwise
    the XLA path.  ``bias`` forces the XLA path (ALiBi etc.).

    ``kv_valid_len`` (static): only the first N key/value positions are
    real; the rest are caller-provided padding to be masked out.  This is
    the pad-once contract — a caller that already carries its sequence
    padded to the kernel's block multiple (e.g. the Whisper encoder at
    1536) gets the mask via segment ids with zero extra pad copies.
    """
    lq, lk = q.shape[2], k.shape[2]
    valid = lk if kv_valid_len is None else min(int(kv_valid_len), lk)
    if _custom_mha is not None and bias is None:
        return _custom_mha(q, k, v, causal=causal, scale=scale,
                           kv_valid_len=kv_valid_len)
    from .._utils import on_tpu
    use_flash = (on_tpu() and bias is None
                 and lq >= _MIN_FLASH_LEN and q.shape[-1] % 64 == 0)
    if not use_flash:
        cb = bias
        if causal:
            from ..functional import causal_bias
            c = causal_bias(lq, lk, jnp.float32)
            cb = c if cb is None else cb + c
        if valid < lk:
            lm = length_mask_bias(
                jnp.full((q.shape[0],), valid, jnp.int32), lk)
            cb = lm if cb is None else cb + lm
        return multihead_attention(q, k, v, bias=cb, scale=scale,
                                   fp32_softmax=fp32_softmax)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    orig_dtype = q.dtype
    # kernel wants both operand seq dims padded to its block multiples
    q_p, pad_q = _pad_to(q, 2, 128)
    k_p, _ = _pad_to(k, 2, 128)
    v_p, _ = _pad_to(v, 2, 128)
    if valid < k_p.shape[2]:
        # padded keys must not contribute: neutralised via segment ids
        from jax.experimental.pallas.ops.tpu.flash_attention import SegmentIds
        bq = q_p.shape[0]
        q_seg = jnp.zeros((bq, q_p.shape[2]), jnp.int32)
        k_seg = (jax.lax.broadcasted_iota(
            jnp.int32, (bq, k_p.shape[2]), 1) >= valid).astype(jnp.int32)
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
