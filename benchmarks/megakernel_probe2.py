#!/usr/bin/env python
"""Probe 2: in-kernel relayout [1, H*D] -> [H, D] feasibility/cost.

The flat GEMV (probe 1: 91% HBM bw) produces q/k/v as [1, 1280]
lane-major; the attention dots need [H, 1, D].  Round 3 hit Mosaic
"unsupported shape cast" on packed bf16 reshapes — this probe checks the
fp32 variants this kernel would actually use, inside a realistic
streamed-GEMV loop so the relayout cost shows up against the 2.2
us/panel baseline.

Variants:
  none     — GEMV only (baseline from probe 1)
  reshape  — acc.reshape(H, D) consumed by a batched [H,1,D]x[H,D,cs] dot

Round-4 device results (v5e, 2026-08-19):

    none    :  0.280 ms  750.1 GB/s  (2.18 us/panel)
    reshape :  FAILED — Mosaic "infer-vector-layout: unsupported shape
               cast  (1x1280xf32) -> (20x1x64xf32)"

The fix that works (probe 3, inlined in the round-4 session log and
now load-bearing in ops/pallas_decoder_layer.py): reshape to the
lane-native PAIR layout [1, 1280] -> [10, 128] (two 64-wide heads per
128-lane row) — supported, and the full GEMV + pair-batched attention
dot chain still runs at 744 GB/s.  Attention math then runs in pair
space with lo/hi lane masks; the KV cache's pair view
[H, D, S] -> [H/2, 2D, S] is a free reinterpretation of the same bytes.
"""
import functools
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 1)[0])

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 1280
N = 1280
H, D = 20, 64
NP = 128


def _kernel(x_ref, w_ref, kv_ref, o_ref, *, mode):
    x = x_ref[...]
    w = w_ref[0].astype(jnp.bfloat16)
    acc = jax.lax.dot(x, w, preferred_element_type=jnp.float32)  # [1, N]
    if mode == "none":
        o_ref[0] = acc.astype(jnp.bfloat16)
        return
    q = acc.reshape(H, D)[:, None, :]           # [H, 1, D] fp32
    kv = kv_ref[0].astype(jnp.float32)          # [H, D, 128]
    s = jax.lax.dot_general(
        q, kv, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)     # [H, 1, 128]
    # fold back to [1, N] so the out spec stays uniform: sum over chunk
    red = jnp.sum(s, axis=2)                    # [H, 1]
    o_ref[0] = (acc * 0.0 + jnp.sum(red)).astype(jnp.bfloat16)


def probe(blob, x, kv, mode):
    return pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        grid=(NP,),
        in_specs=[
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, D, 128), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NP, 1, N), jnp.bfloat16),
    )(x, blob, kv)


def device_ms(fn, *args, tag=""):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    trace_dir = f"/tmp/ewt_mk2_{tag}"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
    from analyze_trace import device_total_ms
    return device_total_ms(trace_dir)["_total"]


def main():
    rs = np.random.RandomState(0)
    blob = jnp.asarray(rs.randint(-127, 128, (NP, K, N)), jnp.int8)
    x = jnp.asarray(rs.randn(1, K) * 0.1, jnp.bfloat16)
    kv = jnp.asarray(rs.randn(1, H, D, 128) * 0.1, jnp.bfloat16)
    total_mb = NP * K * N / 1e6
    for mode in ("none", "reshape"):
        try:
            ms = device_ms(lambda b, xx, kk: probe(b, xx, kk, mode),
                           blob, x, kv, tag=mode)
            print(f"{mode:8s}: {ms:7.3f} ms  {total_mb/ms:7.1f} GB/s  "
                  f"({ms/NP*1e3:6.2f} us/panel)")
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:200]
            print(f"{mode:8s}: FAILED {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
