#!/usr/bin/env python
"""Capture an xplane trace of the Whisper large-v2 decode step and dump the
op-level time breakdown (the nsys-equivalent workflow for this stack;
ref D/2023-05-19-how-to-debug.md uses engine inspection + nsys).

PROFILE_TARGET=step (default) traces the bare decoder forward;
PROFILE_TARGET=loop traces the full on-device generate loop (decode +
logit filters + sampling + stop tracking) for LOOP_STEPS tokens."""
import glob
import os
import sys
import time
from functools import partial

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def profile_loop():
    """Trace the whole jitted main_loop (pipeline hot path)."""
    import numpy as np

    from eddie_wang_hackathon2023_tpu.builder import enable_compile_cache
    from eddie_wang_hackathon2023_tpu.models.whisper import (
        CrossAttnKV, WhisperDecoder, WhisperEncoder, whisper_config)
    from eddie_wang_hackathon2023_tpu.models.whisper.pipeline import (
        DecodingOptions, WhisperPipeline)
    enable_compile_cache()
    steps = int(os.environ.get("LOOP_STEPS", "16"))
    config = whisper_config("large-v2", dtype="bfloat16")
    from eddie_wang_hackathon2023_tpu.quantization import QuantMode
    parts = set(p for p in os.environ.get("BENCH_QUANT", "").split("+") if p)
    qmode = QuantMode(0)
    if "woq8" in parts or "woq4" in parts:
        qmode = QuantMode.use_weight_only(use_int4_weights="woq4" in parts)
    if "kv8" in parts:
        qmode = qmode.set_int8_kv_cache()
    enc, dec, ckv = (WhisperEncoder(config, qmode),
                     WhisperDecoder(config, qmode,
                                    quantize_lm_head="lmq8" in parts),
                     CrossAttnKV(config, int8_output="ckv8" in parts))
    if qmode.is_weight_only():
        from eddie_wang_hackathon2023_tpu.quantization.surgery import \
            weight_only_quantize
        enc = weight_only_quantize(enc, qmode)
        dec = weight_only_quantize(dec, qmode)
    for m in (enc, dec, ckv):
        m.zeros_init()
    if "lmq8" in parts:
        dec.lm_head_scale.value = jnp.ones(dec.lm_head_scale.value.shape,
                                           jnp.float32)
    if qmode.has_int8_kv_cache():
        for name, p in dec.named_parameters():
            if name.endswith("kv_orig_quant_scale") or \
                    name.endswith("kv_quant_orig_scale"):
                p.value = jnp.ones(p.value.shape, jnp.float32)
    pipe = WhisperPipeline(config, enc, dec, ckv,
                           DecodingOptions(language="en", sample_len=steps))
    pipe.bind_params()
    mel = np.random.RandomState(0).randn(1, config.n_mels,
                                         3000).astype(np.float32) * 0.1
    xa = pipe.get_audio_features(mel)
    cross = pipe.precompute_cross_kv(xa)
    tokens, lengths, _, _ = pipe.main_loop(xa, cross)   # compile
    jax.block_until_ready(tokens)
    t0 = time.time()
    tokens, lengths, _, _ = pipe.main_loop(xa, cross)
    jax.block_until_ready(tokens)
    print(f"main_loop wall: {(time.time() - t0) * 1e3:.1f} ms for {steps} "
          f"steps", file=sys.stderr)
    log_dir = os.environ.get("TRACE_DIR", "/tmp/ewt_trace")
    with jax.profiler.trace(log_dir):
        tokens, _, _, _ = pipe.main_loop(xa, cross)
        jax.block_until_ready(tokens)
    print("trace:", glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                              recursive=True), file=sys.stderr)


def profile_encoder():
    import numpy as np

    from eddie_wang_hackathon2023_tpu.builder import enable_compile_cache
    from eddie_wang_hackathon2023_tpu.models.whisper import (WhisperEncoder,
                                                             whisper_config)
    enable_compile_cache()
    config = whisper_config("large-v2", dtype="bfloat16")
    enc = WhisperEncoder(config)
    enc.zeros_init()
    params = enc.state_dict()
    mel = jnp.asarray(np.random.RandomState(0).randn(1, 80, 3000) * 0.1,
                      enc.conv1.weight.value.dtype)

    n = int(os.environ.get("ENC_ITERS", "8"))

    # chain data-DEPENDENT calls in one jit: repeated same-arg dispatches
    # through the axon tunnel get elided/misreported (wall said 0.1 ms
    # for 10 encoder calls), and XLA would CSE identical calls — the
    # tiny input perturbation defeats both without changing the numbers
    @jax.jit
    def chain(params, mel):
        xa = None
        for _ in range(n):
            xa = enc.apply(params, mel)
            mel = mel + xa[0, 0, 0].astype(mel.dtype) * 1e-12
        return xa

    xa = chain(params, mel)
    jax.block_until_ready(xa)
    t0 = time.time()
    xa = chain(params, mel)
    jax.block_until_ready(xa)
    print(f"encoder: {(time.time() - t0) / n * 1e3:.1f} ms/call "
          f"(chained x{n})", file=sys.stderr)
    log_dir = os.environ.get("TRACE_DIR", "/tmp/ewt_trace")
    with jax.profiler.trace(log_dir):
        xa = chain(params, mel)
        jax.block_until_ready(xa)


def profile_crosskv():
    """Trace the cross-KV warping engine alone (bench attributes ~12 ms
    to it vs a ~2 ms GEMM roofline — find where the other 10 ms go)."""
    import numpy as np

    from eddie_wang_hackathon2023_tpu.builder import enable_compile_cache
    from eddie_wang_hackathon2023_tpu.models.whisper import (CrossAttnKV,
                                                             whisper_config)
    enable_compile_cache()
    config = whisper_config("large-v2", dtype="bfloat16")
    int8 = os.environ.get("BENCH_QUANT", "ckv8").find("ckv8") >= 0
    ckv = CrossAttnKV(config, int8_output=int8)
    ckv.zeros_init()
    params = ckv.state_dict()
    xa = jnp.asarray(
        np.random.RandomState(0).randn(1, config.n_audio_ctx,
                                       config.n_audio_state) * 0.1,
        jnp.bfloat16)

    @jax.jit
    def run(params, xa):
        return ckv.apply(params, xa)

    out = run(params, xa)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(20):
        out = run(params, xa)
    jax.block_until_ready(out)
    print(f"cross-kv (int8={int8}): {(time.time() - t0) / 20 * 1e3:.2f} ms",
          file=sys.stderr)
    log_dir = os.environ.get("TRACE_DIR", "/tmp/ewt_trace")
    with jax.profiler.trace(log_dir):
        for _ in range(5):
            out = run(params, xa)
        jax.block_until_ready(out)


def profile_utt():
    """Trace ONE full utterance (pipe.transcribe) in the bench recipe and
    print per-program device totals + the wall time — the breakdown of
    the bench's 'encode+cross-kv+prefill+host' residue."""
    import numpy as np

    from eddie_wang_hackathon2023_tpu.builder import enable_compile_cache
    from eddie_wang_hackathon2023_tpu.models.whisper import (
        CrossAttnKV, WhisperDecoder, WhisperEncoder, whisper_config)
    from eddie_wang_hackathon2023_tpu.models.whisper.pipeline import (
        DecodingOptions, WhisperPipeline)
    from eddie_wang_hackathon2023_tpu.quantization import QuantMode
    enable_compile_cache()
    steps = int(os.environ.get("LOOP_STEPS", "40"))
    config = whisper_config("large-v2", dtype="bfloat16")
    parts = set(p for p in os.environ.get(
        "BENCH_QUANT", "woq8+ckv8+lmq8").split("+") if p)
    qmode = QuantMode(0)
    if "woq8" in parts:
        qmode = QuantMode.use_weight_only()
    enc, dec, ckv = (WhisperEncoder(config, qmode),
                     WhisperDecoder(config, qmode,
                                    quantize_lm_head="lmq8" in parts),
                     CrossAttnKV(config, int8_output="ckv8" in parts,
                                 static_scale=True))
    if qmode.is_weight_only():
        from eddie_wang_hackathon2023_tpu.quantization.surgery import \
            weight_only_quantize
        enc = weight_only_quantize(enc, qmode)
        dec = weight_only_quantize(dec, qmode)
    for m in (enc, dec, ckv):
        m.zeros_init()
    if "ckv8" in parts:
        ckv.kv_scale.value = jnp.ones(ckv.kv_scale.value.shape, jnp.float32)
    if "lmq8" in parts:
        dec.lm_head_scale.value = jnp.ones(dec.lm_head_scale.value.shape,
                                           jnp.float32)
    beam = int(os.environ.get("BEAM", "0"))
    opts = (DecodingOptions(language="en", sample_len=steps,
                            beam_size=beam) if beam > 1 else
            DecodingOptions(language="en", sample_len=steps))
    pipe = WhisperPipeline(config, enc, dec, ckv, opts, qmode)
    pipe.bind_params()
    mel = np.random.RandomState(0).randn(1, config.n_mels,
                                         3000).astype(np.float32) * 0.1
    pipe.transcribe(mel)   # compile
    t0 = time.time()
    pipe.transcribe(mel)
    wall = (time.time() - t0) * 1e3
    print(f"utterance wall: {wall:.1f} ms ({steps} decode steps)",
          file=sys.stderr)
    log_dir = os.environ.get("TRACE_DIR", "/tmp/ewt_trace_utt")
    os.system(f"rm -rf {log_dir}")
    with jax.profiler.trace(log_dir):
        pipe.transcribe(mel)
    from analyze_trace import device_total_ms
    per = device_total_ms(log_dir)
    total = per.pop("_total")
    for name, ms in sorted(per.items(), key=lambda kv: -kv[1]):
        print(f"  {ms:8.2f} ms  {name}", file=sys.stderr)
    print(f"  {total:8.2f} ms  device total; host/dispatch gap "
          f"{wall - total:.1f} ms", file=sys.stderr)


def main():
    if os.environ.get("PROFILE_TARGET") == "utt":
        return profile_utt()
    if os.environ.get("PROFILE_TARGET") == "loop":
        return profile_loop()
    if os.environ.get("PROFILE_TARGET") == "encoder":
        return profile_encoder()
    if os.environ.get("PROFILE_TARGET") == "crosskv":
        return profile_crosskv()
    from eddie_wang_hackathon2023_tpu.builder import enable_compile_cache
    from eddie_wang_hackathon2023_tpu.models.whisper import (WhisperDecoder,
                                                             whisper_config)
    from eddie_wang_hackathon2023_tpu.quantization import QuantMode
    enable_compile_cache()
    quant = os.environ.get("BENCH_QUANT", "")
    parts = set(p for p in quant.split("+") if p)
    qmode = QuantMode(0)
    if "woq8" in parts or "woq4" in parts:
        qmode = QuantMode.use_weight_only(use_int4_weights="woq4" in parts)
    if "kv8" in parts:
        qmode = qmode.set_int8_kv_cache()
    config = whisper_config("large-v2", dtype="bfloat16")
    dec = WhisperDecoder(config, qmode, quantize_lm_head="lmq8" in parts)
    if qmode.is_weight_only():
        from eddie_wang_hackathon2023_tpu.quantization.surgery import \
            weight_only_quantize
        dec = weight_only_quantize(dec, qmode)
    dec.zeros_init()
    if "lmq8" in parts:
        dec.lm_head_scale.value = jnp.ones(dec.lm_head_scale.value.shape,
                                           jnp.float32)
    if qmode.has_int8_kv_cache():
        for name, p in dec.named_parameters():
            if name.endswith("kv_orig_quant_scale") or \
                    name.endswith("kv_quant_orig_scale"):
                p.value = jnp.ones(p.value.shape, jnp.float32)
    params = dec.state_dict()
    b = 1
    cache = dec.new_kv_cache(b)
    # seq-minor cross-KV [L,B,2,H,head_dim,1500], int8 tuple when ckv8
    cross = jnp.zeros((config.n_text_layer, b, 2, config.n_text_head,
                       config.head_dim, config.n_audio_ctx), jnp.bfloat16)
    if "ckv8" in parts:
        cross = (cross.astype(jnp.int8),
                 jnp.ones((config.n_text_layer,), jnp.float32))
    tokens = jnp.zeros((b, 1), jnp.int32)
    widx = jnp.asarray(17, jnp.int32)
    slen = jnp.full((b,), 18, jnp.int32)

    @partial(jax.jit, donate_argnums=(2,))  # cache in-place, as in the
    def step(params, tokens, cache, cross, widx, slen):  # real while_loop
        return dec.apply(params, tokens, cache, cross, widx, slen)

    logits, cache = step(params, tokens, cache, cross, widx, slen)
    jax.block_until_ready(logits)
    t0 = time.time()
    n = 50
    for _ in range(n):
        logits, cache = step(params, tokens, cache, cross, widx, slen)
        jax.block_until_ready(logits)
    per = (time.time() - t0) / n
    print(f"single decode step: {per * 1e3:.2f} ms (sync each step; "
          f"includes dispatch latency)", file=sys.stderr)

    log_dir = os.environ.get("TRACE_DIR", "/tmp/ewt_trace")
    with jax.profiler.trace(log_dir):
        for _ in range(10):
            logits, cache = step(params, tokens, cache, cross, widx, slen)
        jax.block_until_ready(logits)
    xplanes = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                        recursive=True)
    print("trace:", xplanes, file=sys.stderr)


if __name__ == "__main__":
    main()
