"""Quantisation tests — mirrors reference ``tests/quantization/``:
QuantMode flag logic (test_mode.py), WOQ matmul vs emulated int8 ground
truth (test_weight_only_quant_matmul.py:84-100)."""
import jax.numpy as jnp
import numpy as np
import pytest

from eddie_wang_hackathon2023_tpu.ops.quant_matmul import (
    quantize_weights_int4, quantize_weights_int8, unpack_int4,
    weight_only_quant_matmul)
from eddie_wang_hackathon2023_tpu.quantization import QuantMode


class TestQuantMode:

    def test_weight_only_int8(self):
        m = QuantMode.use_weight_only()
        assert m.is_int8_weight_only() and m.is_weight_only()
        assert not m.is_int4_weight_only()
        assert not m.has_act_and_weight_quant()
        assert m.has_any_quant()

    def test_weight_only_int4(self):
        m = QuantMode.use_weight_only(use_int4_weights=True)
        assert m.is_int4_weight_only() and not m.is_int8_weight_only()

    def test_smooth_quant(self):
        m = QuantMode.use_smooth_quant(per_token=True, per_channel=True)
        assert m.has_act_and_weight_quant()
        assert m.has_per_token_dynamic_scaling()
        assert m.has_per_channel_scaling()
        assert not m.has_act_static_scaling()
        assert not m.is_weight_only()

    def test_int8_kv(self):
        m = QuantMode(0).set_int8_kv_cache()
        assert m.has_int8_kv_cache() and m.has_any_quant()
        assert not m.is_weight_only()

    def test_combined_weight_only_and_kv(self):
        m = QuantMode.use_weight_only() | QuantMode.INT8_KV_CACHE
        assert m.is_int8_weight_only() and m.has_int8_kv_cache()

    def test_invalid_combo_raises(self):
        with pytest.raises(ValueError):
            QuantMode.from_description(quantize_weights=False,
                                       quantize_activations=True)


class TestWeightOnlyQuant:

    def test_int8_roundtrip_vs_emulated_gt(self):
        """Same check as the reference's woq_gt_matmul: dequantised-weight
        matmul must match the fused op exactly in fp32."""
        rs = np.random.RandomState(0)
        w = rs.randn(32, 48).astype(np.float32)
        q, s = quantize_weights_int8(w)
        x = rs.randn(4, 32).astype(np.float32)
        gt = x @ (q.astype(np.float32) * s[None, :])
        got = np.asarray(weight_only_quant_matmul(jnp.asarray(x),
                                                  jnp.asarray(q),
                                                  jnp.asarray(s)))
        np.testing.assert_allclose(got, gt, rtol=1e-5, atol=1e-4)

    def test_int8_quant_error_small(self):
        rs = np.random.RandomState(1)
        w = rs.randn(64, 16).astype(np.float32)
        q, s = quantize_weights_int8(w)
        deq = q.astype(np.float32) * s[None, :]
        assert np.abs(deq - w).max() <= (s.max() / 2) + 1e-6

    def test_int4_pack_unpack_roundtrip(self):
        rs = np.random.RandomState(2)
        w = rs.randn(32, 8).astype(np.float32)
        packed, s = quantize_weights_int4(w)
        assert packed.shape == (16, 8)
        unpacked = np.asarray(unpack_int4(jnp.asarray(packed)))
        q_direct = np.clip(np.round(w / s[None, :]), -7, 7)
        np.testing.assert_array_equal(unpacked, q_direct)

    def test_int4_matmul_vs_emulated(self):
        rs = np.random.RandomState(3)
        w = rs.randn(32, 8).astype(np.float32)
        packed, s = quantize_weights_int4(w)
        x = rs.randn(2, 32).astype(np.float32)
        q_direct = np.clip(np.round(w / s[None, :]), -7, 7)
        gt = x @ (q_direct * s[None, :])
        got = np.asarray(weight_only_quant_matmul(
            jnp.asarray(x), jnp.asarray(packed), jnp.asarray(s), bits=4))
        np.testing.assert_allclose(got, gt, rtol=1e-5, atol=1e-4)

    def test_identity_unquantize_trick(self):
        """Reference trick (test_weight_only_quant_matmul.py:19-28): multiply
        by identity to read back the dequantised weight."""
        rs = np.random.RandomState(4)
        w = rs.randn(16, 16).astype(np.float32)
        q, s = quantize_weights_int8(w)
        eye = np.eye(16, dtype=np.float32)
        deq = np.asarray(weight_only_quant_matmul(jnp.asarray(eye),
                                                  jnp.asarray(q),
                                                  jnp.asarray(s)))
        assert np.abs(deq - w).max() < s.max()
