"""A from-scratch Pallas fused-attention kernel (the custom-plugin demo).

Same algorithm as the reference's Triton example kernel
(``E/openai_triton/fmha_triton.py``: tiled Q blocks x streamed K/V blocks
with online softmax) written for the TPU memory model: the grid is
``(B*H, Lq/BLOCK_M)``, each program holds one [BLOCK_M, D] query block in
VMEM and streams K/V in [BLOCK_N, D] panels with the flash recurrence in
fp32 scratch.  Deliberately compact — the production path
(``ops/flash_attention.py``) wraps the tuned jax.experimental kernel; this
file shows what a USER-authored kernel needs to plug in.
"""
import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(q_ref, k_ref, v_ref, o_ref, m_ref, d_ref, acc_ref,
            *, scale: float, causal: bool, valid: int,
            bm: int, bn: int, n_kv: int):
    mi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full(m_ref.shape, NEG, m_ref.dtype)
        d_ref[...] = jnp.zeros(d_ref.shape, d_ref.dtype)
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    # skip K blocks entirely above the causal diagonal or past valid
    q_lo = mi * bm
    run = (ki * bn < valid) if not causal else jnp.logical_and(
        ki * bn < valid, ki * bn <= q_lo + bm - 1)

    @pl.when(run)
    def _block():
        q = q_ref[0].astype(jnp.float32)                   # [BM, D]
        k = k_ref[0].astype(jnp.float32)                   # [BN, D]
        v = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # [BM, BN]
        rows = q_lo + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        cols = ki * bn + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = cols < valid
        if causal:
            mask = jnp.logical_and(mask, cols <= rows)
        s = jnp.where(mask, s, NEG)
        m_prev = m_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        d_ref[...] = d_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot(
            p, v, preferred_element_type=jnp.float32)
        m_ref[...] = m_new

    @pl.when(ki == n_kv - 1)
    def _fin():
        o_ref[0] = (acc_ref[...] /
                    jnp.maximum(d_ref[...], 1e-30)).astype(o_ref.dtype)


def custom_flash_mha(q, k, v, *, causal=False, scale=None,
                     kv_valid_len=None, block_m=128, block_n=128,
                     interpret=None):
    """Drop-in for ops.flash_attention.set_custom_mha.
    q [B,H,Lq,D], k/v [B,H,Lk,D] -> [B,H,Lq,D]."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    valid = lk if kv_valid_len is None else int(kv_valid_len)
    scale = 1.0 / math.sqrt(d) if scale is None else float(scale)
    bm, bn = min(block_m, lq), min(block_n, lk)
    assert lq % bm == 0 and lk % bn == 0, "pad sequences to block multiples"
    n_kv = lk // bn
    if interpret is None:
        from eddie_wang_hackathon2023_tpu._utils import runtime_platform
        interpret = runtime_platform() != "tpu"

    qf = q.reshape(b * h, lq, d)
    kf = k.reshape(b * h, lk, d)
    vf = v.reshape(b * h, lk, d)
    grid = (b * h, lq // bm, n_kv)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, causal=causal, valid=valid,
                          bm=bm, bn=bn, n_kv=n_kv),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, d), lambda g, mi, ki: (g, mi, 0)),
            pl.BlockSpec((1, bn, d), lambda g, mi, ki: (g, ki, 0)),
            pl.BlockSpec((1, bn, d), lambda g, mi, ki: (g, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, bm, d), lambda g, mi, ki: (g, mi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, lq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((bm, d), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, lq, d)
