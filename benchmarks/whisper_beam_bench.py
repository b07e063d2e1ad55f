"""Whisper large-v2 beam-search transcription benchmark.

The full reference decoding recipe (beam_size, joint group expansion,
frozen-EOS carry, timestamp rules) through the real pipeline on device.
BEAM=n (default 5; 1 = greedy control), Q=none for bf16 weights.

  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/whisper_beam_bench.py
"""
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from eddie_wang_hackathon2023_tpu.builder import enable_compile_cache
from eddie_wang_hackathon2023_tpu.models.whisper import (
    CrossAttnKV, WhisperDecoder, WhisperEncoder, whisper_config)
from eddie_wang_hackathon2023_tpu.models.whisper.pipeline import (
    DecodingOptions, WhisperPipeline)
from eddie_wang_hackathon2023_tpu.quantization import QuantMode

enable_compile_cache()
config = whisper_config("large-v2", dtype="bfloat16")
qmode = QuantMode.use_weight_only() if os.environ.get("Q", "woq8") != "none" else QuantMode(0)
enc = WhisperEncoder(config, qmode)
quant = os.environ.get("Q", "woq8") != "none"
dec = WhisperDecoder(config, qmode, quantize_lm_head=quant)
ckv = CrossAttnKV(config, int8_output=quant, static_scale=True)
if quant:
    from eddie_wang_hackathon2023_tpu.quantization.surgery import \
        weight_only_quantize
    enc = weight_only_quantize(enc, qmode)
    dec = weight_only_quantize(dec, qmode)
for m in (enc, dec, ckv):
    m.zeros_init()
if quant:
    ckv.kv_scale.value = jnp.ones(ckv.kv_scale.value.shape, jnp.float32)
    dec.lm_head_scale.value = jnp.ones(dec.lm_head_scale.value.shape,
                                       jnp.float32)

beam = int(os.environ.get("BEAM", "5"))
opts = DecodingOptions(language="en", sample_len=40,
                       beam_size=beam if beam > 1 else None)
pipe = WhisperPipeline(config, enc, dec, ckv, opts, qmode)
pipe.bind_params()
rs = np.random.RandomState(0)
mel = rs.randn(1, config.n_mels, 3000).astype(np.float32) * 0.1
t0 = time.time()
res = pipe.transcribe(mel)
print(f"compile+first: {time.time() - t0:.1f}s, "
      f"{len(res[0].tokens)} tokens", file=sys.stderr)
times = []
for i in range(5):
    m = mel + np.float32(i) * 1e-7
    t0 = time.time()
    pipe.transcribe(m)
    times.append(time.time() - t0)
best = min(times)
print(f"[BENCHMARK] whisper_beam beam {beam} per_call_ms {best * 1e3:.1f} "
      f"utt_per_s {1.0 / best:.2f}")
# one-line JSON for tooling
import json
print(json.dumps({"metric": f"whisper_beam{beam}_utt_per_s",
                  "value": round(1.0 / best, 3), "unit": "utt/s"}))
