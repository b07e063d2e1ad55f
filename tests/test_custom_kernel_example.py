"""examples/custom_kernel: a user-authored Pallas fused-attention kernel
plugged in via ops.flash_attention.set_custom_mha (the TPU-native
analogue of the reference's openai_triton custom-plugin example,
E/openai_triton/README.md workflow)."""
import os
import subprocess
import sys

import jax
import numpy as np

jax.config.update("jax_default_device", jax.devices("cpu")[0])

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_custom_kernel_matches_reference():
    sys.path.insert(0, os.path.join(REPO, "examples", "custom_kernel"))
    try:
        from pallas_fmha import custom_flash_mha
    finally:
        sys.path.pop(0)
    from eddie_wang_hackathon2023_tpu.functional import causal_bias
    from eddie_wang_hackathon2023_tpu.ops.attention import \
        multihead_attention
    rs = np.random.RandomState(1)
    q = jax.numpy.asarray(rs.randn(1, 2, 256, 64).astype(np.float32))
    k = jax.numpy.asarray(rs.randn(1, 2, 256, 64).astype(np.float32))
    v = jax.numpy.asarray(rs.randn(1, 2, 256, 64).astype(np.float32))
    got = custom_flash_mha(q, k, v, causal=True, scale=0.125,
                           kv_valid_len=200, interpret=True)
    bias = causal_bias(256, 256, jax.numpy.float32)
    from eddie_wang_hackathon2023_tpu.ops.attention import length_mask_bias
    bias = bias + length_mask_bias(
        jax.numpy.asarray([200], jax.numpy.int32), 256)[0, 0]
    ref = multihead_attention(q, k, v, bias=bias, scale=0.125)
    # rows attending only masked keys are defined as 0 in the kernel;
    # compare rows with at least one valid key (all rows here: causal
    # row i always sees key 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_set_custom_mha_routes_flash_calls():
    """flash_mha must route through a registered custom kernel even on
    CPU (where the built-in dispatch would take the XLA path)."""
    from eddie_wang_hackathon2023_tpu.ops.flash_attention import (
        flash_mha, set_custom_mha)
    calls = []

    def spy(q, k, v, *, causal, scale, kv_valid_len):
        calls.append((q.shape, causal, kv_valid_len))
        return jax.numpy.zeros_like(q)

    rs = np.random.RandomState(0)
    q = jax.numpy.asarray(rs.randn(1, 2, 128, 64).astype(np.float32))
    set_custom_mha(spy)
    try:
        out = flash_mha(q, q, q, causal=True)
    finally:
        set_custom_mha(None)
    assert calls and calls[0][1] is True
    assert out.shape == q.shape
