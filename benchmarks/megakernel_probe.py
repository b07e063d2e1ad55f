#!/usr/bin/env python
"""Feasibility probes for the fused whole-decoder-layer kernel (round 4).

The megakernel streams every per-layer weight through VMEM as uniform
~1.6 MB int8 panels and does all the layer's GEMVs/LN/softmax in one
pallas_call.  Whether that can beat the current XLA op stream comes down
to one number: the sustained HBM rate of a *streamed panel dequant-GEMV
chain* inside a single kernel.  History says an isolated hand GEMV loses
to XLA's fused dequant GEMM by ~13% (ops/quant_matmul.py) — but the
megakernel removes ~19 us/layer of op-dispatch floor, so a modest GEMV
deficit still nets out ahead.  Probes:

  flat  — grid (NP,), panel [1280, 1280] int8, out[i] = (x @ W_i) * s
  hm    — head-major panel [60, 1280, 64] (the q/k/v layout the kernel
          needs so attention gets [H,1,D] without any Mosaic reshape):
          batched-over-rows dot, x broadcast to [60, 1, 1280]
  hm20  — same but [20, 1280, 64] (one projection per panel)
  xla   — the XLA dequant-GEMV chain over the same blob (the baseline
          the hand kernels must approach)

Prints device-trace us/panel and effective GB/s for each.

Round-4 device results (v5e, 2026-08-19):

    xla    :   0.789 ms   265.7 GB/s  ( 6.17 us/panel)
    flat   :   0.281 ms   745.8 GB/s  ( 2.20 us/panel)
    hm60   :   1.669 ms   125.7 GB/s  (39.73 us/panel)
    hm20   :   1.758 ms   119.3 GB/s  (13.73 us/panel)

Conclusions that shaped ops/pallas_decoder_layer.py:
  * the streamed FLAT dequant-GEMV chain runs at 91% of HBM bandwidth
    inside one kernel — faster than XLA's own dequant-GEMV stream at
    the same shapes (the 6.17 us/panel XLA number IS the per-op
    dispatch floor the megakernel exists to remove);
  * head-major [rows, K, 64] panels are MXU-hostile (~120 GB/s) — this
    is also why round 3's fused cross-q prologue lost 5x (deleted).
    All megakernel GEMVs therefore run flat [K, N] and attention
    consumes q through the supported lane-native fp32 reshape
    [1, H*D] -> [H/2, 128] (probe 2/3: 744 GB/s with the attention dot
    in the loop; the direct [1,1280]->[20,1,64] cast is rejected by
    Mosaic "infer-vector-layout: unsupported shape cast").
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
NP = 128          # panels; 128 * 1.64 MB = 210 MB streamed


def _flat_kernel(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[...]                                   # [1, K] bf16
    w = w_ref[0].astype(jnp.bfloat16)                # [K, N]
    acc = jax.lax.dot(x, w, preferred_element_type=jnp.float32)
    o_ref[0] = (acc * s_ref[0]).astype(jnp.bfloat16)


def probe_flat(blob, x, scales):
    return pl.pallas_call(
        _flat_kernel,
        grid=(NP,),
        in_specs=[
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NP, 1, N), jnp.bfloat16),
    )(x, blob, scales)


def _hm_kernel(xb_ref, w_ref, s_ref, o_ref, *, rows):
    xb = xb_ref[...]                                 # [rows, 1, K] bf16
    w = w_ref[0].astype(jnp.bfloat16)                # [rows, K, D]
    acc = jax.lax.dot_general(
        xb, w, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [rows, 1, D]
    o_ref[...] = (acc[:, 0, :] * s_ref[0]).astype(jnp.bfloat16)[None]


def probe_hm(blob_hm, xb, scales_hm, rows, np_):
    return pl.pallas_call(
        functools.partial(_hm_kernel, rows=rows),
        grid=(np_,),
        in_specs=[
            pl.BlockSpec((rows, 1, K), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, K, 64), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 64), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, 64), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, rows, 64), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(xb, blob_hm, scales_hm)


def probe_xla(blob, x, scales):
    def step(_, i):
        w = jax.lax.dynamic_index_in_dim(blob, i, 0, keepdims=False)
        s = jax.lax.dynamic_index_in_dim(scales, i, 0, keepdims=False)
        acc = jnp.matmul(x, w.astype(x.dtype),
                         preferred_element_type=jnp.float32)
        return (acc * s).astype(jnp.bfloat16), None
    outs, _ = jax.lax.scan(step, jnp.zeros((1, N), jnp.bfloat16),
                           jnp.arange(NP, dtype=jnp.int32))
    return outs


def device_ms(fn, *args, tag=""):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    trace_dir = f"/tmp/ewt_mk_probe_{tag}"
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
    scales = jnp.asarray(rs.rand(NP, 1, N).astype(np.float32) * 0.01)
    total_mb = NP * K * N / 1e6

    ms = device_ms(probe_xla, blob, x, scales, tag="xla")
    print(f"xla    : {ms:7.3f} ms  {total_mb/ms:7.1f} GB/s  "
          f"({ms/NP*1e3:6.2f} us/panel)")

    ms = device_ms(probe_flat, blob, x, scales, tag="flat")
    print(f"flat   : {ms:7.3f} ms  {total_mb/ms:7.1f} GB/s  "
          f"({ms/NP*1e3:6.2f} us/panel)")

    for rows, tag in ((60, "hm60"), (20, "hm20")):
        np_ = NP * K * N // (rows * K * 64)
        blob_hm = jnp.asarray(
            rs.randint(-127, 128, (np_, rows, K, 64)), jnp.int8)
        xb = jnp.broadcast_to(x[None], (rows, 1, K))
        s_hm = jnp.asarray(rs.rand(np_, rows, 64).astype(np.float32))
        ms = device_ms(lambda b, xx, ss: probe_hm(b, xx, ss, rows, np_),
                       blob_hm, xb, s_hm, tag=tag)
        print(f"{tag:7s}: {ms:7.3f} ms  {total_mb/ms:7.1f} GB/s  "
              f"({ms/np_*1e3:6.2f} us/panel, {np_} panels)")


if __name__ == "__main__":
    main()
