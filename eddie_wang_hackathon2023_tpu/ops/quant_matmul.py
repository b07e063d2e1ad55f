"""Weight-only quantised matmul (int8 / int4 weights, 16-bit activations).

TPU-native replacement for the reference's weight-only pipeline:

* offline quantiser ``symmetric_quantize_last_axis_of_batched_matrix``
  (``cpp/tensorrt_llm/thop/weightOnlyQuantOp.cpp:225``): symmetric
  per-out-channel scales, int8 or packed int4 — here
  :func:`quantize_weights_int8` / :func:`quantize_weights_int4` in pure
  numpy/jax, with a plain [K, N] layout instead of the CUDA-interleaved
  layout produced by ``cutlass_preprocessors.cpp`` (the MXU wants natural
  K-major tiles, so no preprocessing is needed).
* runtime GEMM plugin (``plugins/weightOnlyQuantMatmulPlugin``, CUTLASS
  fpA_intB): here :func:`weight_only_quant_matmul`, either the XLA
  formulation (dequant-after-matmul — per-out-channel scales commute through
  the contraction) or a fused Pallas kernel
  (:mod:`.pallas_quant_matmul`) that keeps int8 weights in HBM and
  dequantises inside VMEM tiles feeding the MXU.

Because scales are per-out-channel, ``(x @ q) * scale == x @ (q * scale)``
exactly in fp32 accumulation, so the XLA path is numerically identical to
dequantise-then-matmul.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_weights_int8(w) -> Tuple[np.ndarray, np.ndarray]:
    """w: [K, N] float (in-features major, as the reference feeds the thop op
    after transposing torch's [N, K]).  Returns (q [K, N] int8, scales [N]
    float32), symmetric per-column amax/127 (weightOnlyQuantOp.cpp:225)."""
    w = np.asarray(w, dtype=np.float32)
    amax = np.max(np.abs(w), axis=0)  # [N]
    scales = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scales[None, :]), -127, 127).astype(np.int8)
    return q, scales


def quantize_weights_int4(w, group_size: int = None
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric int4: values in [-7, 7], two nibbles packed per int8 along
    K in HALF-SPLIT order — byte i holds rows i (low nibble) and i+K/2
    (high nibble).  Unpacking is then a concat of two sign-extended planes
    (no interleave relayout — this is what lets the Pallas kernel unpack in
    VMEM with plain shifts; the CUDA reference needs its interleaved
    cutlass_preprocessors layout for the same reason).

    ``group_size``: scale granularity along K.  None = one scale per out
    channel (the reference's default, weightOnlyQuantOp.cpp:225).  An int
    G gives GPTQ-style group-wise scales [K/G, N] — 3-bit mantissas over a
    whole 1280-row column lose too much (measured 18.9% relative WER
    divergence on Whisper vs 0.6% for int8); per-128-row scales track the
    local weight distribution (the CUTLASS fpA_intB path has the same
    finer-granularity mode, weightOnlyQuantMatmulPlugin.cpp:57).

    Returns (packed [K//2, N] int8, scales [N] or [K/G, N] float32).
    K must be even (and divisible by G when grouped)."""
    w = np.asarray(w, dtype=np.float32)
    k, n = w.shape
    assert k % 2 == 0, "int4 packing requires even in-features"
    if group_size:
        assert k % group_size == 0, (k, group_size)
        gc = k // group_size
        wg = w.reshape(gc, group_size, n)
        amax = np.max(np.abs(wg), axis=1)                     # [gc, N]
        scales = np.where(amax > 0, amax / 7.0, 1.0).astype(np.float32)
        q = np.clip(np.round(wg / scales[:, None, :]), -7,
                    7).astype(np.int8).reshape(k, n)
    else:
        amax = np.max(np.abs(w), axis=0)
        scales = np.where(amax > 0, amax / 7.0, 1.0).astype(np.float32)
        q = np.clip(np.round(w / scales[None, :]), -7, 7).astype(np.int8)
    lo = q[:k // 2] & 0xF
    hi = (q[k // 2:] & 0xF) << 4
    return (lo | hi).astype(np.int8), scales


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """[K//2, N] packed -> [K, N] int8 in [-8, 7] (sign-extended nibbles,
    half-split order: low nibbles are rows [0, K/2), high are [K/2, K))."""
    lo = (packed << 4).astype(jnp.int8) >> 4  # arithmetic shift sign-extends
    hi = packed >> 4
    return jnp.concatenate([lo, hi], axis=0)


def weight_only_quant_matmul(x, qweight, scales, bits: int = 8):
    """x [..., K] bf16/fp16 @ int-quantised weight [K, N] -> [..., N].

    int8: XLA's fused int8->bf16 dequant GEMM — measured FASTER than a
    hand Pallas dequant-GEMM on v5e (3.10 vs 3.60 ms/tok large-v2 decode;
    the losing kernel was deleted per that measurement).
    int4: the Pallas VMEM-unpack kernel is the default on TPU (XLA
    materialises the unpacked int8 weight per call => ~3x the int4 HBM
    bytes); EWT_INT4_XLA=1 / PluginConfig.int4_pallas=False forces the
    XLA unpack path for comparison.

    2-D ``scales`` [K/G, N] select the group-wise path (see
    quantize_weights_int4): dequant is per group BEFORE the contraction
    (scales no longer commute through the whole K reduction).
    """
    if bits == 4:
        from ..plugin import get_plugin_config
        if get_plugin_config().use_int4_pallas():
            from .pallas_quant_matmul import quant_matmul_int4_pallas
            return quant_matmul_int4_pallas(x, qweight, scales)
        qweight = unpack_int4(qweight)
    if scales.ndim == 2:
        # group-wise dequant (scale per [group, out-channel]): scale the
        # int weight in the activation dtype and let XLA fuse the
        # convert+mul into the GEMM's weight read
        k, n = qweight.shape
        gc = scales.shape[0]
        wf = qweight.astype(x.dtype).reshape(gc, k // gc, n) * \
            scales[:, None, :].astype(x.dtype)
        return jnp.matmul(x, wf.reshape(k, n),
                          preferred_element_type=jnp.float32).astype(x.dtype)
    # int8 deliberately has NO hand kernel: two Pallas formulations were
    # measured against this XLA fused dequant-GEMM on v5e and both lost
    # (whole-block kernel 3.60 vs 3.10 ms/tok round 1; streaming-panel
    # GEMV 3.48 vs 3.08 ms/tok round 2) — XLA's convert+matmul fusion is
    # already at the weight-read bound for these shapes.
    acc = jnp.matmul(x, qweight.astype(x.dtype),
                     preferred_element_type=jnp.float32)
    return (acc * scales.astype(jnp.float32)).astype(x.dtype)
