#!/usr/bin/env python
"""Sweep the fused decode-attention kernel's sequence-panel width.

Chains N data-dependent kernel calls in ONE jit (output feeds the next
query) so wall/N is trustworthy through the axon tunnel.  Covers the two
shapes the Whisper decode step actually runs per layer:

  cross — int8 stacked cache [L,1,2,20,64,1504], always-full 1500 valid
  self  — bf16 stacked cache [L,1,2,20,64,448], short valid length

Usage: PYTHONPATH=... python benchmarks/decode_chunk_sweep.py [cross|self ...]
"""
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 1)[0])

import jax
import jax.numpy as jnp
import numpy as np

L, H, D = 8, 20, 64          # 8 layers is enough to amortise; per-layer cost
CHUNKS = [128, 256, 384, 512, 768]   # must be 128-multiples (Mosaic tiling)


def run(case: str, n: int = 48):
    from eddie_wang_hackathon2023_tpu.builder import enable_compile_cache
    from eddie_wang_hackathon2023_tpu.ops.pallas_decode_attention import \
        fused_decode_attention
    enable_compile_cache()
    rs = np.random.RandomState(0)
    if case == "cross":
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
    q0 = jnp.asarray(rs.randn(1, H, 1, D) * 0.1, jnp.bfloat16)
    seq_len = jnp.asarray([valid + (1 if fresh is not None else 0)],
                          jnp.int32)

    results = {}
    for cs in CHUNKS:
        if cs > S:
            continue

        @jax.jit
        def chain(q, cache):
            def step(h, i):
                o = fused_decode_attention(
                    cache, i % L, h, seq_len, scale=0.125,
                    kv_quant_orig_scale=kscale, fresh_kv=fresh, chunk=cs)
                return (o + 1e-6 * h).astype(h.dtype), None
            h, _ = jax.lax.scan(step, q, jnp.arange(n, dtype=jnp.int32))
            return h

        try:
            out = jax.block_until_ready(chain(q0, cache))
        except Exception as e:  # noqa: BLE001
            print(f"[{case}] chunk={cs}: FAILED {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue
        # wall clocks through the axon tunnel lie even for chained scans;
        # only the xplane device time is trustworthy
        trace_dir = f"/tmp/ewt_chunk_sweep_{case}_{cs}"
        os.system(f"rm -rf {trace_dir}")
        with jax.profiler.trace(trace_dir):
            out = chain(q0 + jnp.bfloat16(1e-4), cache)
            jax.block_until_ready(out)
        from analyze_trace import device_total_ms
        us = device_total_ms(trace_dir)["_total"] / n * 1e3
        results[cs] = us
        print(f"[{case}] chunk={cs}: {us:.2f} us/call (device)",
              file=sys.stderr)
    if results:
        best = min(results, key=results.get)
        print(f"[{case}] best chunk={best} at {results[best]:.2f} us "
              f"(256 default: {results.get(256, float('nan')):.2f})",
              file=sys.stderr)


def main():
    for case in (sys.argv[1:] or ["cross", "self"]):
        run(case)


if __name__ == "__main__":
    main()
