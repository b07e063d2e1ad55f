"""Ring attention (sequence-parallel over a virtual mesh) vs single-device
full attention — exact within fp32 tolerance."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from eddie_wang_hackathon2023_tpu.ops.attention import multihead_attention
from eddie_wang_hackathon2023_tpu.ops.ring_attention import ring_attention
from eddie_wang_hackathon2023_tpu.functional import causal_bias


@pytest.fixture
def mesh(cpu_devices):
    if len(cpu_devices) < 4:
        pytest.skip("needs 4 virtual devices")
    return Mesh(np.asarray(cpu_devices[:4]), ("sp",))


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_full(mesh, causal):
    rs = np.random.RandomState(0)
    b, h, s, d = 2, 4, 64, 16        # s = 16 per device
    q = jnp.asarray(rs.randn(b, h, s, d).astype(np.float32) * 0.3)
    k = jnp.asarray(rs.randn(b, h, s, d).astype(np.float32) * 0.3)
    v = jnp.asarray(rs.randn(b, h, s, d).astype(np.float32) * 0.3)
    ref = multihead_attention(
        q, k, v, bias=causal_bias(s, s) if causal else None)
    got = ring_attention(q, k, v, mesh, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_ring_memory_is_sharded(mesh):
    """Each device's addressable K/V shard is S/N of the sequence."""
    rs = np.random.RandomState(1)
    b, h, s, d = 1, 2, 32, 8
    q = jnp.asarray(rs.randn(b, h, s, d).astype(np.float32))
    out = ring_attention(q, q, q, mesh, causal=False)
    assert out.shape == (b, h, s, d)
    shard_rows = {sh.data.shape[2] for sh in out.addressable_shards}
    assert shard_rows == {s // 4}
