"""Fused int4-weight dequant matmul Pallas kernel.

TPU-native equivalent of the reference's WeightOnlyQuantMatmul plugin
(``plugins/weightOnlyQuantMatmulPlugin``, CUTLASS fpA_intB GEMM + custom
GEMV).  The int8 weight tile is DMA'd HBM->VMEM (half the bytes of bf16 —
this is the whole point: decode GEMMs are HBM-bandwidth bound), converted
to the activation dtype inside VMEM, fed to the MXU, and the per-out-channel
scale is applied to the fp32 accumulator.  No CUDA-style weight interleaving
is needed; the MXU consumes natural K-major tiles.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel_int4(x_ref, qw_ref, scale_ref, out_ref, *, groups: int):
    """qw block [K//2, TN] int8, half-split nibble packing (see
    ops.quant_matmul.quantize_weights_int4): unpack with int32 shifts in
    VMEM, concat the two K-halves, one MXU dot.

    ``groups`` == 1: per-out-channel scale applied to the fp32 accumulator.
    ``groups`` > 1 (group-wise scales [groups, TN]): each K-group of the
    unpacked weight is scaled in VMEM before the dot (statically unrolled
    [1, TN]-broadcast multiplies — scales don't commute through the whole
    contraction any more)."""
    x = x_ref[:]                                   # [TM, K]
    p = qw_ref[:].astype(jnp.int32)                # [K//2, TN]
    lo = ((p << 28) >> 28).astype(x.dtype)         # sign-extended low nibble
    hi = ((p << 24) >> 28).astype(x.dtype)         # sign-extended high nibble
    w = jnp.concatenate([lo, hi], axis=0)          # [K, TN]
    if groups == 1:
        acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
        out_ref[:] = (acc * scale_ref[:].astype(jnp.float32)).astype(
            out_ref.dtype)
        return
    k = w.shape[0]
    gs = k // groups
    parts = [w[g * gs:(g + 1) * gs, :] *
             scale_ref[g:g + 1, :].astype(x.dtype)
             for g in range(groups)]
    w = jnp.concatenate(parts, axis=0)
    acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n"))
def quant_matmul_int4_pallas(x, qweight, scales, block_m: int = 256,
                             block_n: int = 512):
    """x [..., K] @ packed int4 weight [K//2, N] -> [..., N].

    The decode path is HBM-bound on the weight read; keeping the nibbles
    packed all the way into VMEM reads half the bytes of the int8 path
    (the reference needs cutlass fpA_intB + interleaved preprocessing for
    the same effect, kernels/cutlass_kernels/fpA_intB_gemm)."""
    *lead, k = x.shape
    n = qweight.shape[1]
    m = 1
    for s in lead:
        m *= s
    x2 = x.reshape(m, k)
    tm = min(block_m, _round_up(m, 16))
    tn = min(block_n, n)
    m_pad = _round_up(m, tm)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    groups = scales.shape[0] if scales.ndim == 2 else 1
    grid = (m_pad // tm, pl.cdiv(n, tn))  # edge block auto-masked
    out = pl.pallas_call(
        functools.partial(_kernel_int4, groups=groups),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k // 2, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=m_pad * k * 2 + k * n // 2 + m_pad * n * 2,
            transcendentals=0,
        ),
    )(x2, qweight, scales.reshape(groups, n))
    if m_pad != m:
        out = out[:m]
    return out.reshape(*lead, n)
