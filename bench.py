#!/usr/bin/env python
"""Headline bench: Whisper large-v2 inference throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "whisper_large_v2_utt_per_s", "value": N, "unit": "utt/s",
   "vs_baseline": N / 1.965}

Baseline derivation (BASELINE.md): the reference's best published number is
the full LibriSpeech test-clean transcription wall time on 1x A10 with
TRT-LLM + plugins: ~1333 s for the 2620-utterance set => 1.965 utt/s.
We model one utterance as: encoder forward (30 s mel window) + cross-KV
precompute + prompt prefill + 40 greedy decode steps through the full
on-device loop (40 ~= avg tokens/utt incl. timestamp tokens on test-clean).
Weights are zero-initialised (values don't affect timing; no checkpoint is
available in this environment); the decode loop is forced to run all steps.
"""
import json
import os
import sys
import time

DECODE_TOKENS = int(os.environ.get("BENCH_DECODE_TOKENS", "40"))
BASELINE_UTT_PER_S = 2620.0 / 1333.0  # reference TRT-LLM+plugins on A10


def main():
    import jax
    if os.environ.get("BENCH_DEVICE") == "cpu":
        # smoke-test mode: pin the platform list BEFORE the first device
        # touch (the jax.config update is the only reliable guard — the
        # JAX_PLATFORMS env var alone does not stop a wedged axon plugin
        # from hanging backend discovery)
        jax.config.update("jax_platforms", "cpu")
    elif os.environ.get("JAX_PLATFORMS") == "axon":
        # fail fast when the remote TPU is unreachable: backend discovery
        # would otherwise hang forever (see axon_health.py), and CPU
        # numbers would be meaningless for this bench
        from eddie_wang_hackathon2023_tpu.axon_health import tpu_reachable
        if not tpu_reachable():
            sys.exit("[bench] axon TPU unreachable (relay dead or wedged) "
                     "— not benchmarking on CPU")
    import jax.numpy as jnp
    import numpy as np

    from eddie_wang_hackathon2023_tpu.builder import enable_compile_cache
    from eddie_wang_hackathon2023_tpu.models.whisper import (
        CrossAttnKV, WhisperDecoder, WhisperEncoder, whisper_config)
    from eddie_wang_hackathon2023_tpu.models.whisper.pipeline import (
        DecodingOptions, WhisperPipeline)

    enable_compile_cache()
    dev = jax.devices()[0]
    print(f"[bench] device: {dev.device_kind}", file=sys.stderr)

    config = whisper_config(os.environ.get("BENCH_MODEL", "large-v2"),
                            dtype="bfloat16")
    # BENCH_QUANT: "+"-joined subset of {woq8, woq4, kv8, ckv8, lmq8}, e.g.
    # "woq8+kv8+ckv8" = the reference's weight_only+int8_kv_cache combo
    # plus the beyond-reference int8 cross-KV.  Default is the framework's
    # speed-optimal deployment recipe (int8 weights + int8 cross-KV +
    # int8 lm_head) — the reference's baseline number is likewise its
    # best plugin+quant configuration.  "bf16"/"none" = unquantized.
    # + sqenc adopted round 5: SmoothQuant W8A8 encoder measured 8.00
    # vs 7.89 utt/s same-session AND 0.00% transcription divergence vs
    # the fp32 pipeline (WER.md sqenc row)
    quant = os.environ.get("BENCH_QUANT", "woq8+ckv8+lmq8+sqenc")
    if quant in ("bf16", "none"):
        quant = ""
    parts = set(p for p in quant.split("+") if p)
    ckv8 = "ckv8" in parts
    from eddie_wang_hackathon2023_tpu.quantization import QuantMode
    qmode = QuantMode(0)
    if "woq8" in parts or "woq4" in parts:
        qmode = QuantMode.use_weight_only(use_int4_weights="woq4" in parts)
    if "kv8" in parts:
        qmode = qmode.set_int8_kv_cache()
    # "sqenc": SmoothQuant W8A8 the ENCODER only — it is compute-bound
    # (~75% MXU at bf16), so int8 MXU (2x peak) is its lever, unlike the
    # HBM-bound decoder where weight-only already wins
    enc = WhisperEncoder(config, QuantMode(0) if "sqenc" in parts else qmode)
    dec = WhisperDecoder(config, qmode, quantize_lm_head="lmq8" in parts)
    # static calibrated cross-KV scales = the deployment recipe (matches
    # the reference's static int8-KV calibration model); the dynamic
    # amax path costs two full-tensor reduction passes per utterance.
    # BENCH_CKV_DYNAMIC=1 benches the dynamic fallback for the ablation
    ckv = CrossAttnKV(config, int8_output=ckv8,
                      static_scale=os.environ.get("BENCH_CKV_DYNAMIC") != "1")
    if qmode.is_weight_only():
        from eddie_wang_hackathon2023_tpu.quantization.surgery import \
            weight_only_quantize
        if "sqenc" not in parts:
            enc = weight_only_quantize(enc, qmode)
        dec = weight_only_quantize(dec, qmode)
    if "sqenc" in parts:
        from eddie_wang_hackathon2023_tpu.quantization.surgery import \
            smooth_quantize
        enc = smooth_quantize(
            enc, QuantMode.use_smooth_quant(per_token=True,
                                            per_channel=True))
    for m in (enc, dec, ckv):
        m.zeros_init()
    if ckv8 and ckv.static_scale:
        ckv.kv_scale.value = jnp.ones(ckv.kv_scale.value.shape, jnp.float32)
    if "lmq8" in parts:
        import jax.numpy as jnp
        dec.lm_head_scale.value = jnp.ones(dec.lm_head_scale.value.shape,
                                           jnp.float32)
    if qmode.has_int8_kv_cache():
        # unit scales (zeros would divide by 0; values don't affect timing)
        import jax.numpy as jnp
        for name, p in dec.named_parameters():
            if name.endswith("kv_orig_quant_scale") or \
                    name.endswith("kv_quant_orig_scale"):
                p.value = jnp.ones(p.value.shape, jnp.float32)
    print(f"[bench] quant mode: {quant or 'bf16'}", file=sys.stderr)

    opts = DecodingOptions(language="en", sample_len=DECODE_TOKENS)
    pipe = WhisperPipeline(config, enc, dec, ckv, opts, qmode)
    pipe.bind_params()

    batch = int(os.environ.get("BENCH_BATCH", "1"))
    rs = np.random.RandomState(0)
    mel = rs.randn(batch, config.n_mels, 3000).astype(np.float32) * 0.1

    def run_once():
        # staged path (fused single-program measured slower — see
        # WhisperPipeline.transcribe docstring), incl. the host-side
        # post-processing the reference's wall time also pays
        res = pipe.transcribe(mel)
        return res

    t0 = time.time()
    res = run_once()  # compile
    steps_run = len(res[0].tokens)
    print(f"[bench] first call (compile): {time.time() - t0:.1f}s; "
          f"decoded {steps_run} tokens", file=sys.stderr)
    if steps_run < DECODE_TOKENS - 2:    # result strips prompt + trailing eot
        print(f"[bench] warning: loop exited early at {steps_run} steps",
              file=sys.stderr)

    # timed runs
    n_iter = int(os.environ.get("BENCH_ITERS", "5"))
    times = []
    for _ in range(n_iter):
        t0 = time.time()
        run_once()
        times.append(time.time() - t0)
    per_call = min(times)
    utt_per_s = batch / per_call
    print(f"[bench] per-call {per_call * 1e3:.1f} ms (best of {n_iter}), "
          f"batch {batch}, {DECODE_TOKENS} decode steps "
          f"=> {utt_per_s:.2f} utt/s; "
          f"decode {batch * steps_run / per_call:.1f} tok/s (incl. "
          f"encode+cross-kv amortised)", file=sys.stderr)

    # stage breakdown via the two-length slope: time the same pipeline at
    # 2x the decode budget and attribute the difference to the decode
    # loop.  (Timing stages in isolation double-counts the axon tunnel's
    # per-dispatch round-trip — it once reported encoder alone slower
    # than the whole utterance and a negative decode loop.)  The slope
    # cancels every per-call constant: encoder, cross-KV, prefill,
    # transfers, host post-processing.
    if os.environ.get("BENCH_STAGES", "1") != "0":
        opts2 = DecodingOptions(language="en", sample_len=2 * DECODE_TOKENS)
        pipe2 = WhisperPipeline(config, enc, dec, ckv, opts2, qmode)
        pipe2.bind_params()
        pipe2.transcribe(mel)  # compile
        times2 = []
        for _ in range(max(3, n_iter // 2)):
            t0 = time.time()
            pipe2.transcribe(mel)
            times2.append(time.time() - t0)
        per_call2 = min(times2)
        slope = (per_call2 - per_call) / DECODE_TOKENS
        prologue = per_call - slope * steps_run
        print(f"[bench] decode-loop slope {slope * 1e3:.2f} ms/tok "
              f"({steps_run} steps => {slope * steps_run * 1e3:.1f} ms); "
              f"encode+cross-kv+prefill+host {prologue * 1e3:.1f} ms "
              f"(2x-len call {per_call2 * 1e3:.1f} ms)", file=sys.stderr)

    print(json.dumps({
        "metric": "whisper_large_v2_utt_per_s",
        "value": round(utt_per_s, 3),
        "unit": "utt/s",
        "vs_baseline": round(utt_per_s / BASELINE_UTT_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
