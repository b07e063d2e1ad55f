"""Fused Pallas int4 weight-only dequant matmul vs the XLA formulation
(ops.pallas_quant_matmul vs ops.quant_matmul.weight_only_quant_matmul) —
interpret mode on CPU; the TPU bench exercises the compiled kernel.

Reference counterpart: plugins/weightOnlyQuantMatmulPlugin (CUTLASS
fpA_intB GEMM + GEMV).  int8 deliberately has no hand kernel — two
Pallas formulations measured slower than XLA's fused dequant-GEMM on
v5e (see ops/quant_matmul.py).  Also guards module importability — the
lazy TPU-only import path once let a truncation SyntaxError sit
undetected.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

jax.config.update("jax_default_device", jax.devices("cpu")[0])

from jax.experimental.pallas import tpu as pltpu

from eddie_wang_hackathon2023_tpu.ops.pallas_quant_matmul import \
    quant_matmul_int4_pallas
from eddie_wang_hackathon2023_tpu.ops.quant_matmul import (
    quantize_weights_int4, unpack_int4)


def _xla_ref(x, q, scales):
    acc = jnp.matmul(x, q.astype(x.dtype),
                     preferred_element_type=jnp.float32)
    return (acc * scales.astype(jnp.float32)).astype(x.dtype)


# n=1280 exercises the non-divisible edge panel (block_n=512 -> cdiv grid
# with a masked 256-wide edge block — the floor-division grid bug dropped
# those columns entirely)
@pytest.mark.parametrize("m,k,n", [(1, 256, 512), (1, 1280, 1280),
                                   (20, 256, 1280)])
def test_int4_kernel_matches_xla(m, k, n):
    rs = np.random.RandomState(1)
    w = rs.randn(k, n).astype(np.float32)
    packed, scales = quantize_weights_int4(w)
    x = jnp.asarray(rs.randn(m, k), jnp.float32)
    packed, scales = jnp.asarray(packed), jnp.asarray(scales)
    with pltpu.force_tpu_interpret_mode():
        got = quant_matmul_int4_pallas(x, packed, scales)
    want = _xla_ref(x, unpack_int4(packed), scales)
    # fp32 accumulation order differs between the kernel and XLA dot
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-4)


def _grouped_ref(x, q_unpacked, scales):
    """Emulated group-wise dequant-then-matmul in fp32 (the ground truth
    the kernel and the XLA formulation must both match)."""
    k, n = q_unpacked.shape
    gc = scales.shape[0]
    wf = np.asarray(q_unpacked, np.float32).reshape(gc, k // gc, n) * \
        np.asarray(scales, np.float32)[:, None, :]
    return np.asarray(x, np.float32) @ wf.reshape(k, n)


@pytest.mark.parametrize("m,k,n,g", [(1, 256, 512, 128), (1, 1280, 1280, 128),
                                     (4, 256, 640, 64)])
def test_int4_group_kernel_matches_ref(m, k, n, g):
    """Group-wise int4 (ref finer-granularity fpA_intB mode): both the
    Pallas kernel and the XLA formulation must match fp32 grouped dequant."""
    from eddie_wang_hackathon2023_tpu.ops.quant_matmul import \
        weight_only_quant_matmul
    rs = np.random.RandomState(2)
    w = rs.randn(k, n).astype(np.float32)
    packed, scales = quantize_weights_int4(w, group_size=g)
    assert scales.shape == (k // g, n)
    x = jnp.asarray(rs.randn(m, k), jnp.float32)
    packed_j, scales_j = jnp.asarray(packed), jnp.asarray(scales)
    want = _grouped_ref(x, np.asarray(unpack_int4(packed_j)), scales)
    with pltpu.force_tpu_interpret_mode():
        got_pallas = quant_matmul_int4_pallas(x, packed_j, scales_j)
    np.testing.assert_allclose(np.asarray(got_pallas), want,
                               rtol=1e-3, atol=1e-4)
    import os
    os.environ["EWT_INT4_XLA"] = "1"
    try:
        got_xla = weight_only_quant_matmul(x, packed_j, scales_j, bits=4)
    finally:
        del os.environ["EWT_INT4_XLA"]
    np.testing.assert_allclose(np.asarray(got_xla), want,
                               rtol=1e-3, atol=1e-4)


def test_int4_group_scales_reduce_error():
    """The reason groups exist: on weights with per-group magnitude spread
    (the outlier structure real transformer weights show), group-wise int4
    must reconstruct the weight strictly better than per-channel int4."""
    rs = np.random.RandomState(3)
    k, n, g = 1280, 640, 128
    w = rs.randn(k, n).astype(np.float32)
    # inject row-block magnitude structure (outlier groups)
    w[:128] *= 8.0
    w[512:640] *= 4.0
    pc_packed, pc_scales = quantize_weights_int4(w)
    gw_packed, gw_scales = quantize_weights_int4(w, group_size=g)
    pc = np.asarray(unpack_int4(jnp.asarray(pc_packed)), np.float32) * \
        pc_scales[None, :]
    gw = np.asarray(unpack_int4(jnp.asarray(gw_packed)), np.float32)
    gw = (gw.reshape(k // g, g, n) * gw_scales[:, None, :]).reshape(k, n)
    err_pc = np.abs(pc - w).mean()
    err_gw = np.abs(gw - w).mean()
    assert err_gw < 0.5 * err_pc, (err_gw, err_pc)
