"""Block-paged KV attention vs the contiguous cache path: identical
context (ref: paged and contiguous KV must be numerically interchangeable,
D/gpt_attention.md:168-200)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eddie_wang_hackathon2023_tpu.ops.attention import (append_kv,
                                                        cached_decode_attention)
from eddie_wang_hackathon2023_tpu.ops.paged_attention import (
    new_block_pool, paged_append_kv, paged_decode_attention, paged_prefill)
from eddie_wang_hackathon2023_tpu.runtime.kv_cache_manager import (
    GenerationSequence, KVCacheManager)

B, H, D, T = 3, 4, 16, 8          # T tokens per block
MAX_BLOCKS = 6
POOL_BLOCKS = 32


def _setup(dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    mgr = KVCacheManager(num_layers=1, num_blocks=POOL_BLOCKS,
                         tokens_per_block=T, max_blocks_per_seq=MAX_BLOCKS,
                         beam_width=1)
    plens = [5, 11, 8]
    for i, p in enumerate(plens):
        mgr.add_sequence(GenerationSequence(i, i), p)
    return rng, mgr, plens


def test_paged_matches_contiguous_through_decode_steps():
    rng, mgr, plens = _setup()
    pool = new_block_pool(POOL_BLOCKS, H, T, D, jnp.float32)
    contig = jnp.zeros((B, 2, H, D, MAX_BLOCKS * T), jnp.float32)

    # context phase: write prompts into both layouts
    maxp = max(plens)
    k = rng.normal(size=(B, H, maxp, D)).astype(np.float32)
    v = rng.normal(size=(B, H, maxp, D)).astype(np.float32)
    table = jnp.asarray(mgr.get_block_index_arrays()[:, 0])  # [B, max_blocks]
    pool = paged_prefill(pool, jnp.asarray(k), jnp.asarray(v), table)
    contig = append_kv(contig, jnp.asarray(k), jnp.asarray(v), 0)

    lens = np.asarray(plens, np.int32)
    for step in range(7):
        q = jnp.asarray(rng.normal(size=(B, H, 1, D)), jnp.float32)
        got = paged_decode_attention(q, pool, table, jnp.asarray(lens))
        want = cached_decode_attention(q, contig, jnp.asarray(lens))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        # append one token per sequence at its own length
        mgr.step([False] * B)
        table = jnp.asarray(mgr.get_block_index_arrays()[:, 0])
        kn = jnp.asarray(rng.normal(size=(B, H, 1, D)), jnp.float32)
        vn = jnp.asarray(rng.normal(size=(B, H, 1, D)), jnp.float32)
        pool = paged_append_kv(pool, kn, vn, table, jnp.asarray(lens))
        contig = append_kv(contig, kn, vn, jnp.asarray(lens))
        lens = lens + 1


def test_paged_int8_kv():
    rng, mgr, plens = _setup(seed=1)
    scale_in, scale_out = 0.25, 4.0
    pool = new_block_pool(POOL_BLOCKS, H, T, D, jnp.int8)
    contig = jnp.zeros((B, 2, H, D, MAX_BLOCKS * T), jnp.int8)
    maxp = max(plens)
    k = jnp.asarray(rng.normal(size=(B, H, maxp, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, maxp, D)), jnp.float32)
    table = jnp.asarray(mgr.get_block_index_arrays()[:, 0])
    pool = paged_prefill(pool, k, v, table, kv_orig_quant_scale=scale_in)
    contig = append_kv(contig, k, v, 0, kv_orig_quant_scale=scale_in)
    lens = jnp.asarray(plens, jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, H, 1, D)), jnp.float32)
    got = paged_decode_attention(q, pool, table, lens,
                                 kv_quant_orig_scale=scale_out)
    want = cached_decode_attention(q, contig, lens,
                                   kv_quant_orig_scale=scale_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_append_respects_unallocated_slots():
    """A -1 table entry must leave the pool untouched."""
    pool = new_block_pool(4, H, T, D, jnp.float32)
    table = jnp.asarray([[-1, -1, -1]], jnp.int32)
    kn = jnp.ones((1, H, 1, D), jnp.float32)
    out = paged_append_kv(pool, kn, kn, table, jnp.asarray([0], jnp.int32))
    np.testing.assert_array_equal(np.asarray(out), np.zeros_like(out))


def test_jit_and_donation():
    """The hot path compiles with donated pool (true in-place update)."""
    rng, mgr, plens = _setup(seed=2)
    pool = new_block_pool(POOL_BLOCKS, H, T, D, jnp.float32)
    table = jnp.asarray(mgr.get_block_index_arrays()[:, 0])
    lens = jnp.asarray(plens, jnp.int32)

    @jax.jit
    def step(pool, q, kn, vn, table, lens):
        pool = paged_append_kv(pool, kn, vn, table, lens)
        return paged_decode_attention(q, pool, table, lens + 1), pool

    q = jnp.asarray(rng.normal(size=(B, H, 1, D)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(B, H, 1, D)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(B, H, 1, D)), jnp.float32)
    ctx, pool = step(pool, q, kn, vn, table, lens)
    assert ctx.shape == (B, H, 1, D)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.int8])
@pytest.mark.parametrize("hkv,h", [(4, 4), (1, 4)])
def test_paged_pallas_kernel_matches_xla(dtype, hkv, h):
    """The paged-decode Pallas kernel (block table as scalar-prefetch
    feeding the DMA index maps — the reference consumes its pointer
    arrays inside the fused plugin) must match the XLA gather
    formulation: ragged lengths, -1 padded tables, int8 pools, MQA."""
    from eddie_wang_hackathon2023_tpu.ops.pallas_decode_attention import (
        paged_decode_attention_pallas)
    rs = np.random.RandomState(41)
    L, B, T, D, NBLK, MB = 2, 3, 8, 16, 24, 5
    pool = rs.randn(L, NBLK, 2, hkv, T, D).astype(np.float32)
    if dtype == jnp.int8:
        pool = np.clip(np.round(pool * 20), -127, 127).astype(np.int8)
    pool = jnp.asarray(pool, dtype)
    q = jnp.asarray(rs.randn(B, h, 1, D).astype(np.float32))
    seq = np.asarray([7, 25, 17], np.int32)      # 1, 4, 3 blocks used
    # distinct random block chains; unused slots -1
    perm = rs.permutation(NBLK)
    table = np.full((B, MB), -1, np.int32)
    k = 0
    for i in range(B):
        nb = -(-int(seq[i]) // T)
        table[i, :nb] = perm[k:k + nb]
        k += nb
    kscale = 0.05 if dtype == jnp.int8 else None
    scale = 1.0 / D ** 0.5
    for l in range(L):
        ref = paged_decode_attention(
            q, pool[l], jnp.asarray(table), jnp.asarray(seq), scale=scale,
            kv_quant_orig_scale=kscale)
        for grp in (1, 2, 5):
            got = paged_decode_attention_pallas(
                pool, l, q, jnp.asarray(table), jnp.asarray(seq), scale,
                kv_quant_orig_scale=kscale, blocks_per_cell=grp,
                interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=2e-5, atol=2e-5,
                                       err_msg=f"layer {l} grp {grp}")
