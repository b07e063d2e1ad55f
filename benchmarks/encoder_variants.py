#!/usr/bin/env python
"""A/B harness for the Whisper encoder block-loop formulation.

The xplane trace of the scanned encoder shows every layer's weights being
materialised by a dynamic-slice+squeeze kLoop fusion (~25 MB at ~18% bw per
GEMM operand) before the GEMM reads them — lax.scan's per-iteration xs
slicing costs a full weight copy per layer.  Variants:

  scan       — current production path (lax.scan over stacked params,
               pad-once to the flash block multiple)
  nopad      — scan but with the pre-pad-once behaviour: x stays at 1500
               and every flash_mha call pads q/k/v and slices the output
  unroll     — Python loop, static x[i] indexing into the stacked params
               (static slices can fold into bitcasts / operand offsets)
  split      — Python loop over 32 separate per-layer param trees passed
               as distinct jit arguments (no slicing at all)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/encoder_variants.py [variant ...]
Each variant is profiled into /tmp/ewt_enc_<variant>; read with
analyze_trace.py.  Wall timings through axon lie — trust only the traces.
"""
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def build():
    from eddie_wang_hackathon2023_tpu.builder import enable_compile_cache
    from eddie_wang_hackathon2023_tpu.models.whisper import (WhisperEncoder,
                                                             whisper_config)
    enable_compile_cache()
    config = whisper_config("large-v2", dtype="bfloat16")
    enc = WhisperEncoder(config)
    enc.zeros_init()
    return enc, config


def _stem(enc, mel, pad_once=True):
    from eddie_wang_hackathon2023_tpu.functional import gelu
    x = gelu(enc.conv1(mel))
    x = gelu(enc.conv2(x))
    x = x.transpose(0, 2, 1)
    x = x + enc.positional_embedding.value.astype(x.dtype)
    valid = x.shape[1]
    pad = (-valid) % 128 if (pad_once and valid >= 128) else 0
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return x, valid, pad


def run_variant(name: str, enc, config):
    mel = jnp.asarray(np.random.RandomState(0).randn(1, 80, 3000) * 0.1,
                      jnp.bfloat16)
    params = enc.state_dict()
    block = enc.blocks
    block_keys = list(dict(block.named_parameters()))

    if name in ("scan", "nopad"):
        pad_once = name == "scan"

        @jax.jit
        def run(params, mel):
            def fwd(mel):
                x, valid, pad = _stem(enc, mel, pad_once=pad_once)
                vl = valid if pad else None
                stacked = {k: params[f"blocks.{k}"] for k in block_keys}

                def step(h, layer_params):
                    return block.apply(dict(layer_params), h,
                                       valid_len=vl), None

                x, _ = jax.lax.scan(step, x, stacked)
                if pad:
                    x = x[:, :valid]
                return enc.ln_post(x)
            return enc.apply(params, mel, method=fwd)

        args = (params, mel)
    elif name == "unroll":
        n_layer = params[f"blocks.{block_keys[0]}"].shape[0]

        @jax.jit
        def run(params, mel):
            def fwd(mel):
                x, valid, pad = _stem(enc, mel)
                vl = valid if pad else None
                for i in range(n_layer):
                    layer = {k: params[f"blocks.{k}"][i] for k in block_keys}
                    x = block.apply(layer, x, valid_len=vl)
                if pad:
                    x = x[:, :valid]
                return enc.ln_post(x)
            return enc.apply(params, mel, method=fwd)

        args = (params, mel)
    elif name == "split":
        n_layer = params[f"blocks.{block_keys[0]}"].shape[0]
        layers = [{k: np.asarray(params[f"blocks.{k}"][i])
                   for k in block_keys} for i in range(n_layer)]
        rest = {k: v for k, v in params.items()
                if not k.startswith("blocks.")}
        # keep the full state for apply's bind (blocks.* unused in fwd)
        full = dict(params)

        @jax.jit
        def run(rest, layers, mel):
            def fwd(mel):
                x, valid, pad = _stem(enc, mel)
                vl = valid if pad else None
                for layer in layers:
                    x = block.apply(layer, x, valid_len=vl)
                if pad:
                    x = x[:, :valid]
                return enc.ln_post(x)
            return enc.apply({**full, **rest}, mel, method=fwd)

        args = (rest, layers, mel)
    else:
        raise ValueError(name)

    t0 = time.time()
    out = jax.block_until_ready(run(*args))
    print(f"[{name}] compile+first: {time.time() - t0:.1f} s "
          f"out={out.shape}", file=sys.stderr)
    t0 = time.time()
    for _ in range(10):
        out = run(*args)
    jax.block_until_ready(out)
    print(f"[{name}] wall (unreliable): {(time.time() - t0) / 10 * 1e3:.2f} ms",
          file=sys.stderr)
    trace_dir = f"/tmp/ewt_enc_{name}"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(5):
            out = run(*args)
        jax.block_until_ready(out)
    return out


def main():
    variants = sys.argv[1:] or ["scan", "unroll"]
    enc, config = build()
    outs = {}
    for v in variants:
        outs[v] = np.asarray(run_variant(v, enc, config), np.float32)
    base = next(iter(outs.values()))
    for v, o in outs.items():
        print(f"[{v}] max|diff vs first| = {np.abs(o - base).max():.3e}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
