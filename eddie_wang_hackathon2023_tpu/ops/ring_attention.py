"""Ring attention: sequence-parallel exact attention over a mesh axis.

The long-context design obligation SURVEY.md §7 names for the TPU build
(the reference has NO long-sequence story beyond 30 s chunking —
E/whisper/whisper_utils.py:15, D/gpt_attention.md packed tensors): shard
the sequence over a mesh axis ('sp'), keep Q resident, and rotate the K/V
shards around the ring with ``jax.lax.ppermute`` while accumulating
attention with an online (streaming) softmax — each device only ever holds
1/N of the K/V, and the N-1 rotations ride the ICI links concurrently with
compute.  Exact (not approximate): equality with single-device attention
is tested on the virtual CPU mesh.

Causal masking uses absolute positions: the query shard on device i covers
rows [i*Sq, (i+1)*Sq); at ring step t it sees the K/V shard originally on
device (i - t) mod N.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _ring_attention_sharded(q, k, v, axis_name: str, causal: bool,
                            scale: float):
    """Per-shard body (runs under shard_map).  q/k/v [B, H, Sq, D] local
    shards; rotates K/V around ``axis_name``."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, h, sq, d = q.shape
    qf = q.astype(jnp.float32) * scale

    def step(carry, t):
        k_t, v_t, m, num, den = carry
        # absolute column offset of the current K/V shard
        src = (idx - t) % n
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, k_t.astype(jnp.float32))
        if causal:
            qpos = idx * sq + jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, sq, 1), 2)
            kpos = src * sq + jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, 1, sq), 3)
            s = jnp.where(kpos <= qpos, s, -1e30)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        correction = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        num = num * correction + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_t.astype(jnp.float32))
        den = den * correction[..., 0] + jnp.sum(p, axis=-1)
        perm = [(j, (j + 1) % n) for j in range(n)]
        k_t = jax.lax.ppermute(k_t, axis_name, perm)
        v_t = jax.lax.ppermute(v_t, axis_name, perm)
        return (k_t, v_t, m_new, num, den), None

    m0 = jnp.full((b, h, sq, 1), -jnp.inf, jnp.float32)
    num0 = jnp.zeros((b, h, sq, d), jnp.float32)
    den0 = jnp.zeros((b, h, sq), jnp.float32)
    (k, v, m, num, den), _ = jax.lax.scan(
        step, (k, v, m0, num0, den0), jnp.arange(n))
    return (num / den[..., None]).astype(q.dtype)


def ring_attention(q, k, v, mesh: Mesh, axis_name: str = "sp",
                   causal: bool = False, scale: Optional[float] = None):
    """Exact attention with the sequence axis sharded over ``axis_name``.

    q/k/v [B, H, S, D] with S divisible by the axis size.  Inputs may be
    unsharded (this function applies the shardings); output has the same
    sequence sharding as q.
    """
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    spec = P(None, None, axis_name, None)
    fn = jax.shard_map(
        functools.partial(_ring_attention_sharded, axis_name=axis_name,
                          causal=causal, scale=scale),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)
    sh = NamedSharding(mesh, spec)
    return fn(jax.device_put(q, sh), jax.device_put(k, sh),
              jax.device_put(v, sh))
