#!/usr/bin/env python
"""Per-layer device cost of the fused decode-attention kernel variants:

  cross_plain   — kernel only, q/projection outside (2 XLA GEMVs/layer)
  cross_proj    — + fused out-projection epilogue
  self_plain    — self kernel, projection outside
  self_proj     — + fused out-projection epilogue

(Two prologue variants — cross_projq / self_projqkv — were swept, lost
their round-3 device A/B (760.6 vs 152.7 ms/utt; scoped-VMEM OOM) and
were deleted with their kernel paths.)

Each variant chains N data-dependent layer calls (kernel + whatever XLA
GEMVs the variant leaves outside) in ONE jit and reports xplane device
time per layer — the apples-to-apples number for deciding the default
(the per-head dot loops in the epilogue/prologue have an analytically
uncertain MXU cost; only the trace decides).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/fusion_sweep.py
"""
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 1)[0])

import jax
import jax.numpy as jnp
import numpy as np

L, H, D = 8, 20, 64
DM = H * D
N_CALLS = 48


def mk_proj(rs):
    qw = rs.randint(-127, 127, (L, DM, DM)).astype(np.int8)
    sc = (rs.rand(DM) * 0.01).astype(np.float32)
    b = (rs.randn(DM) * 0.01).astype(np.float32)
    return jnp.asarray(qw), jnp.asarray(sc), jnp.asarray(b)


def dense_out(ctx, qw_l, sc, b, dtype):
    from eddie_wang_hackathon2023_tpu.ops.quant_matmul import \
        weight_only_quant_matmul
    x = ctx.transpose(0, 2, 1, 3).reshape(1, 1, DM)
    return weight_only_quant_matmul(x, qw_l, sc) + b.astype(dtype)


def run(variant: str):
    from eddie_wang_hackathon2023_tpu.builder import enable_compile_cache
    from eddie_wang_hackathon2023_tpu.ops.pallas_decode_attention import \
        fused_decode_attention
    from eddie_wang_hackathon2023_tpu.ops.quant_matmul import \
        weight_only_quant_matmul
    enable_compile_cache()
    rs = np.random.RandomState(0)
    cross = variant.startswith("cross")
    if cross:
        S, valid = 1504, 1500
        cache = jnp.asarray(
            rs.randint(-127, 127, (L, 1, 2, H, D, S)), jnp.int8)
        kscale = jnp.float32(0.02)
        fresh = None
    else:
        S, valid = 448, 24
        cache = jnp.asarray(rs.randn(L, 1, 2, H, D, S) * 0.1, jnp.bfloat16)
        kscale = None
        fresh = (jnp.asarray(rs.randn(1, H, D, 1) * 0.1, jnp.bfloat16),
                 jnp.asarray(rs.randn(1, H, D, 1) * 0.1, jnp.bfloat16))
    pqw, psc, pb = mk_proj(rs)
    xqw, xsc, xb = mk_proj(rs)
    seq_len = jnp.asarray([valid + (1 if fresh is not None else 0)],
                          jnp.int32)
    x0 = jnp.asarray(rs.randn(1, 1, DM) * 0.1, jnp.bfloat16)

    @jax.jit
    def chain(x, cache):
        def step(h, i):
            li = i % L
            if True:
                # per-layer dynamic slices, matching the real scan-xs
                # pattern (incl. any materialised slice-copy cost)
                q = (weight_only_quant_matmul(h, xqw[li], xsc)
                     + xb.astype(h.dtype))
                q = q.reshape(1, 1, H, D).transpose(0, 2, 1, 3)
                if variant.endswith("_proj"):
                    out = fused_decode_attention(
                        cache, li, q, seq_len, 0.125,
                        kv_quant_orig_scale=kscale, fresh_kv=fresh,
                        proj=(pqw, psc, pb))[:, None, :]
                else:
                    ctx = fused_decode_attention(
                        cache, li, q, seq_len, 0.125,
                        kv_quant_orig_scale=kscale, fresh_kv=fresh)
                    out = dense_out(ctx, pqw[li], psc, pb, h.dtype)
            return (out.astype(h.dtype) + 1e-6 * h), None
        h, _ = jax.lax.scan(step, x, jnp.arange(N_CALLS, dtype=jnp.int32))
        return h

    out = jax.block_until_ready(chain(x0, cache))
    trace_dir = f"/tmp/ewt_fusion_sweep_{variant}"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        out = chain(x0 + jnp.bfloat16(1e-4), cache)
        jax.block_until_ready(out)
    from analyze_trace import device_total_ms
    us = device_total_ms(trace_dir)["_total"] / N_CALLS * 1e3
    print(f"[{variant}] {us:.2f} us/layer (device, kernel + outside GEMVs)",
          file=sys.stderr)
    return us


def main():
    variants = sys.argv[1:] or ["cross_plain", "cross_proj",
                                "self_plain", "self_proj"]
    res = {v: run(v) for v in variants}
    print(res)


if __name__ == "__main__":
    main()
