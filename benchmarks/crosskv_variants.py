#!/usr/bin/env python
"""A/B cross-KV warping formulations on device (xplane-verified).

The warping engine (models/whisper/model.py CrossAttnKV) must emit the
SEQ-MINOR stacked layout [L,B,2,H,hd,S] the decode cache wants.  The
op_profile of the einsum "bsi,loi->lbos" formulation shows the two GEMMs
at the compute roofline (1.65 ms) but 7.4 ms of data formatting /
copies / reduce passes around them.  Variant B flips the GEMM operands
so S is the GEMM's natural minor output axis (out [L*d, S] = W[L*d,i] @
xa^T[i,S]) — the seq-minor layout falls straight out of the MXU with no
transpose.

  TRACE_DIR=/tmp/ckv_var python benchmarks/crosskv_variants.py
"""
import glob
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from eddie_wang_hackathon2023_tpu.builder import enable_compile_cache
from eddie_wang_hackathon2023_tpu.functional import round_half_away

L, D, S, H = 32, 1280, 1500, 20
HD = D // H
B = 1


def quant_chain(k, v, layer_axes):
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(kf), axis=layer_axes),
                       jnp.max(jnp.abs(vf), axis=layer_axes))
    scale = jnp.maximum(amax, 1e-6) / 127.0
    shape = [1] * k.ndim
    shape[0] = L
    s = scale.reshape(shape)
    qk = jnp.clip(round_half_away(kf / s), -127, 127).astype(jnp.int8)
    qv = jnp.clip(round_half_away(vf / s), -127, 127).astype(jnp.int8)
    return qk, qv, scale


def variant_a(xa, wk, wv, bv):
    """Current model formulation: einsum with lbos output."""
    k = jnp.einsum("bsi,loi->lbos", xa, wk)
    v = jnp.einsum("bsi,loi->lbos", xa, wv)
    v = v + bv[:, None, :, None].astype(v.dtype)
    qk, qv, scale = quant_chain(k, v, (1, 2, 3))
    q = jnp.stack([qk, qv], axis=2).reshape(L, B, 2, H, HD, S)
    return q, scale


def variant_b(xa, wk, wv, bv):
    """S-minor straight out of the MXU: out[L*d, S] = W[L*d,i] @ xa.T."""
    xt = xa[0].T                                   # [i, S]
    k = (wk.reshape(L * D, D) @ xt).reshape(L, D, S)
    v = (wv.reshape(L * D, D) @ xt).reshape(L, D, S)
    v = v + bv[:, :, None].astype(v.dtype)
    qk, qv, scale = quant_chain(k, v, (1, 2))
    q = jnp.stack([qk, qv], axis=1).reshape(L, 1, 2, H, HD, S)
    return q, scale


def variant_c(xa, wk, wv, bv):
    """B with the k/v GEMMs fused into ONE stacked GEMM (one [L,2,d,S]
    write, quantize slices it)."""
    xt = xa[0].T                                   # [i, S]
    w = jnp.concatenate([wk.reshape(L, 1, D, D), wv.reshape(L, 1, D, D)],
                        axis=1)                    # [L, 2, D(out), D(in)]
    kv = (w.reshape(L * 2 * D, D) @ xt).reshape(L, 2, D, S)
    kv = kv + jnp.pad(bv[:, None, :, None], ((0, 0), (1, 0), (0, 0),
                                             (0, 0))).astype(kv.dtype)
    kvf = kv.astype(jnp.float32)
    amax = jnp.max(jnp.abs(kvf), axis=(1, 2, 3))
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(round_half_away(kvf / scale[:, None, None, None]),
                 -127, 127).astype(jnp.int8)
    return q.reshape(L, 1, 2, H, HD, S), scale


def main():
    enable_compile_cache()
    rs = np.random.RandomState(0)
    xa = jnp.asarray(rs.randn(B, S, D) * 0.1, jnp.bfloat16)
    wk = jnp.asarray(rs.randn(L, D, D) * 0.02, jnp.bfloat16)
    wv = jnp.asarray(rs.randn(L, D, D) * 0.02, jnp.bfloat16)
    bv = jnp.asarray(rs.randn(L, D) * 0.01, jnp.bfloat16)

    fns = {"a_einsum_lbos": variant_a, "b_sminor_gemm": variant_b,
           "c_fused_kv_gemm": variant_c}
    outs = {}
    for name, fn in fns.items():
        jf = jax.jit(fn)
        q, scale = jf(xa, wk, wv, bv)
        jax.block_until_ready(q)
        outs[name] = (np.asarray(q), np.asarray(scale))
        trace_dir = os.environ.get("TRACE_DIR", "/tmp/ckv_var") + "_" + name
        with jax.profiler.trace(trace_dir):
            for _ in range(5):
                q, scale = jf(xa, wk, wv, bv)
            jax.block_until_ready(q)
        # wall (axon-unreliable, but order-of-magnitude)
        t0 = time.time()
        for _ in range(10):
            q, scale = jf(xa, wk, wv, bv)
        jax.block_until_ready(q)
        print(f"{name}: wall {(time.time() - t0) / 10 * 1e3:.2f} ms "
              f"(trace: {trace_dir})", file=sys.stderr)

    ref_q, ref_s = outs["a_einsum_lbos"]
    for name in ("b_sminor_gemm", "c_fused_kv_gemm"):
        q, s = outs[name]
        print(f"{name}: scale maxdiff {np.abs(s - ref_s).max():.2e}, "
              f"q mismatch {(q != ref_q).mean() * 100:.4f}%",
              file=sys.stderr)


if __name__ == "__main__":
    main()
