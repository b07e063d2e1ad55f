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
