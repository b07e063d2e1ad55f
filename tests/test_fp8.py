"""FP8 (e4m3) quantized family: QDQ linear layers (ref
T/quantization/layer.py:442-595) and the FP8 KV cache mode (ref
QuantMode.FP8_KV_CACHE)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eddie_wang_hackathon2023_tpu.quantization.fp8_layers import (
    FP8MLP, FP8Linear, FP8RowLinear, dequantize_fp8, fp8_qdq,
    fp8_scales_from_amax, quantize_fp8)


def test_quantize_fp8_real_e4m3_rounding():
    x = jnp.asarray([0.0, 1.0, 1.06, 448.0, 1000.0, -1000.0], jnp.float32)
    q = quantize_fp8(x, 1.0)
    assert q.dtype == jnp.float8_e4m3fn
    d = np.asarray(dequantize_fp8(q, 1.0))
    assert d[0] == 0.0 and d[1] == 1.0
    # e4m3 has 3 mantissa bits: 1.06 rounds to 1.0 or 1.125
    assert d[2] in (1.0, 1.125)
    assert d[3] == 448.0            # e4m3fn max representable
    assert d[4] == 448.0 and d[5] == -448.0     # saturating cast


def test_fp8_linear_close_to_float_and_exact_grid():
    rs = np.random.RandomState(0)
    lin = FP8Linear(16, 8, dtype="float32")
    w = rs.randn(8, 16).astype(np.float32)
    amax_w = np.abs(w).max()
    lin.load_state_dict({
        "weight": w,
        "bias": np.zeros((8,), np.float32),
        "activation_scaling_factor": np.asarray([fp8_scales_from_amax(4.0)],
                                                np.float32),
        "weights_scaling_factor": np.asarray([fp8_scales_from_amax(amax_w)],
                                             np.float32)})
    x = jnp.asarray(rs.randn(2, 3, 16).astype(np.float32))
    y = np.asarray(lin(x))
    ref = np.asarray(x) @ w.T
    rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.12, rel                       # e4m3 resolution
    # exact when inputs and weights are already on the e4m3 grid
    xg = jnp.asarray(fp8_qdq(x, lin.activation_scaling_factor.value))
    wg = np.asarray(fp8_qdq(jnp.asarray(w),
                            lin.weights_scaling_factor.value))
    lin.load_state_dict({
        "weight": wg, "bias": np.zeros((8,), np.float32),
        "activation_scaling_factor": np.asarray(
            lin.activation_scaling_factor.value),
        "weights_scaling_factor": np.asarray(
            lin.weights_scaling_factor.value)})
    np.testing.assert_allclose(np.asarray(lin(xg)),
                               np.asarray(xg) @ wg.T, rtol=1e-4)


def test_fp8_mlp_runs():
    mlp = FP8MLP(16, 32, "gelu", dtype="float32")
    mlp.random_init(jax.random.PRNGKey(0), 0.1)
    for name, p in mlp.named_parameters():
        if name.endswith("scaling_factor"):
            p.value = jnp.asarray([fp8_scales_from_amax(4.0)], jnp.float32)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 4, 16), jnp.float32)
    y = mlp(x)
    assert y.shape == (2, 4, 16) and np.isfinite(np.asarray(y)).all()


def test_fp8_linear_sharded_tp(cpu_devices):
    """Column+row FP8 pair on a tp=4 mesh == single device."""
    from eddie_wang_hackathon2023_tpu.parallel import Mapping, shard_state
    from eddie_wang_hackathon2023_tpu.module import Module

    class Pair(Module):
        def __init__(self):
            super().__init__()
            self.col = FP8Linear(16, 32, dtype="float32",
                                 gather_output=False)
            self.row = FP8RowLinear(32, 16, dtype="float32")

        def forward(self, x):
            return self.row(self.col(x))

    m = Pair()
    m.random_init(jax.random.PRNGKey(2), 0.1)
    for name, p in m.named_parameters():
        if name.endswith("scaling_factor"):
            p.value = jnp.asarray([fp8_scales_from_amax(8.0)], jnp.float32)
    x = jnp.asarray(np.random.RandomState(3).randn(2, 5, 16), jnp.float32)
    ref = np.asarray(m(x))
    mapping = Mapping(world_size=4, tp_size=4, devices=cpu_devices[:4])
    sharded = shard_state(m.state_dict(), m.pspecs(), mapping.mesh)
    got = np.asarray(jax.jit(lambda p, x: m.apply(p, x))(sharded, x))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_fp8_kv_cache_decode():
    """Attention with the fp8 KV cache stays close to the float cache and
    the cache dtype really is e4m3."""
    from eddie_wang_hackathon2023_tpu.layers import (Attention,
                                                     AttentionMaskType)
    rs = np.random.RandomState(4)
    mk = lambda fp8: Attention(32, 4, 64,
                               attention_mask_type=AttentionMaskType.causal,
                               dtype="float32", use_fp8_kv_cache=fp8)
    a_f, a_q = mk(False), mk(True)
    a_f.random_init(jax.random.PRNGKey(5), 0.1)
    sd = a_f.state_dict()
    sd["kv_orig_quant_scale"] = np.asarray([1.0], np.float32)
    sd["kv_quant_orig_scale"] = np.asarray([1.0], np.float32)
    a_q.load_state_dict(sd, strict=False)
    x = jnp.asarray(rs.randn(2, 6, 32).astype(np.float32) * 0.3)
    cache_f = a_f.new_kv_cache(2, 16)
    cache_q = a_q.new_kv_cache(2, 16)
    assert cache_q.dtype == jnp.float8_e4m3fn
    yf, cf = a_f(x, past_key_value=cache_f, sequence_length=jnp.array([6, 6]),
                 cache_write_index=0, use_cache=True)
    yq, cq = a_q(x, past_key_value=cache_q, sequence_length=jnp.array([6, 6]),
                 cache_write_index=0, use_cache=True)
    assert cq.dtype == jnp.float8_e4m3fn
    rel = np.abs(np.asarray(yq) - np.asarray(yf)).max() / \
        (np.abs(np.asarray(yf)).max() + 1e-9)
    assert rel < 0.1, rel
    # decode step against the fp8 cache
    x1 = jnp.asarray(rs.randn(2, 1, 32).astype(np.float32) * 0.3)
    y1f, _ = a_f(x1, past_key_value=cf, sequence_length=jnp.array([7, 7]),
                 cache_write_index=6, use_cache=True)
    y1q, _ = a_q(x1, past_key_value=cq, sequence_length=jnp.array([7, 7]),
                 cache_write_index=6, use_cache=True)
    rel = np.abs(np.asarray(y1q) - np.asarray(y1f)).max() / \
        (np.abs(np.asarray(y1f)).max() + 1e-9)
    assert rel < 0.1, rel
