#!/bin/bash
# Round-5 TPU measurement suite.  Focus: (1) beam search through the
# in-kernel cache_indirection (whisper beam=5 + GPT beam=4 A/Bs), (2)
# int4 megakernel eligibility (nibble panels stream HALF the weight
# bytes), (3) MQA grouped kernels (SantaCoder-class), (4) the bounded
# manual-stream ring at LLaMA-7B shapes (ADVICE r4 high fix), (5) a
# ctx>=2048 megakernel row, (6) fp8-KV megakernel compile check.
# Results land in /tmp/r5suite; summarise with:
#     python benchmarks/r2_suite_summary.py /tmp/r5suite
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
OUT=/tmp/r5suite
mkdir -p $OUT
cd /root/repo

if ! python -m eddie_wang_hackathon2023_tpu.axon_health; then
    echo "axon TPU unreachable (relay dead or wedged) — aborting"
    exit 1
fi

run() {  # run <name> <timeout_s> <cmd...>
    local name=$1 to=$2; shift 2
    echo "=== $name ($(date +%H:%M:%S)) ==="
    timeout "$to" "$@" > "$OUT/$name.log" 2>&1
    echo "    exit=$? tail:"; tail -3 "$OUT/$name.log" | sed 's/^/    /'
}

# ---- headline (cold compile) + int4 megakernel ------------------------------
run bench_mk 3600 python bench.py
BENCH_QUANT="woq4+ckv8+lmq8" BENCH_STAGES=0 run bench_int4_mk 2400 python bench.py
BENCH_QUANT="woq4+ckv8+lmq8" EWT_MEGAKERNEL=0 BENCH_STAGES=0 run bench_int4_nomk 2000 python bench.py
BENCH_QUANT="woq8+ckv8+lmq8+sqenc" BENCH_STAGES=0 run bench_sqenc 2400 python bench.py

# ---- whisper beam=5: in-kernel cache_indirection A/B ------------------------
run whisper_beam5 2400 python benchmarks/whisper_beam_bench.py
EWT_BEAM_PALLAS=0 run whisper_beam5_xla 2000 python benchmarks/whisper_beam_bench.py

# ---- GPT beam=4 at ctx 2048: beam-kernel A/B --------------------------------
run beam_ind 1600 python benchmarks/beam_bench.py --modes indirection
EWT_BEAM_PALLAS=0 run beam_ind_xla 1400 python benchmarks/beam_bench.py --modes indirection

# ---- megakernel at long context (r4 weak#6: cache-dominated stream) ---------
run gpt_ctx2k_mk 2000 python benchmarks/benchmark.py --quant woq8 --batch_size 1 --input_output_len 1900,64
EWT_MEGAKERNEL=0 run gpt_ctx2k_nomk 1600 python benchmarks/benchmark.py --quant woq8 --batch_size 1 --input_output_len 1900,64

# ---- SantaCoder-class MQA: grouped megakernel / grouped decode kernel -------
run santa_mqa_mk 2000 python benchmarks/benchmark.py -m santacoder_1b --quant woq8 --batch_size 1
EWT_MEGAKERNEL=0 run santa_mqa_nomk 1600 python benchmarks/benchmark.py -m santacoder_1b --quant woq8 --batch_size 1
EWT_MEGAKERNEL=0 EWT_PALLAS_DECODE=0 run santa_mqa_xla 1600 python benchmarks/benchmark.py -m santacoder_1b --quant woq8 --batch_size 1

# ---- LLaMA family: bounded ring at 7B (ADVICE fix) + int4 gated -------------
run llama7b_woq8_mk 2400 python benchmarks/benchmark.py -m llama_7b --quant woq8 --batch_size 1 --num_runs 2
run llama1b_int4_mk 2000 python benchmarks/benchmark.py -m llama_1b --quant woq4 --batch_size 1
EWT_MEGAKERNEL=0 run llama1b_int4_nomk 1600 python benchmarks/benchmark.py -m llama_1b --quant woq4 --batch_size 1

# ---- fp8-KV megakernel: device compile + run check --------------------------
run fp8_mk_check 1600 python - <<'EOF'
import jax, jax.numpy as jnp, numpy as np
from eddie_wang_hackathon2023_tpu.builder import enable_compile_cache
from eddie_wang_hackathon2023_tpu.models.decoder import DecoderConfig, DecoderLMHead
from eddie_wang_hackathon2023_tpu.quantization import QuantMode
enable_compile_cache()
qm = QuantMode(0).set_fp8_kv_cache()
cfg = DecoderConfig(vocab_size=51200, hidden_size=1024, num_layers=24,
                    num_heads=16, dtype="bfloat16", quant_mode=qm)
m = DecoderLMHead(cfg); m.zeros_init()
sd = m.state_dict()
sd["blocks.attention.kv_orig_quant_scale"] = np.full((24, 1), 4.0, np.float32)
sd["blocks.attention.kv_quant_orig_scale"] = np.full((24, 1), .25, np.float32)
m.load_state_dict(sd, strict=False)
assert m.megakernel_eligible()
blobs = jax.jit(m.megakernel_blobs)(m.state_dict())
cache = m.new_kv_cache(1, 128)
assert cache.dtype == jnp.float8_e4m3fn
logits, cache = m(jnp.ones((1, 8), jnp.int32), cache, 0, jnp.asarray([8], jnp.int32))
import time
from functools import partial
params = m.state_dict()

@jax.jit
def step(params, blobs, tok, cache, widx, seqlen):
    return m.apply(params, tok, cache, widx, seqlen,
                   megakernel_blobs=blobs)

tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
for i in range(8, 16):
    logits, cache = step(params, blobs, tok, cache, jnp.asarray(i),
                         jnp.asarray([i + 1], jnp.int32))
    tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
jax.block_until_ready(logits)
t0 = time.perf_counter()
for i in range(16, 48):
    logits, cache = step(params, blobs, tok, cache, jnp.asarray(i),
                         jnp.asarray([i + 1], jnp.int32))
    tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
jax.block_until_ready(logits)
dt = (time.perf_counter() - t0) / 32
print(f"[BENCHMARK] fp8_kv_megakernel gpt350m decode_ms_per_tok {dt*1e3:.2f} OK "
      "(per-step host round trips included — the offline loop amortises them)")
EOF

# ---- regression rows --------------------------------------------------------
run gpt_woq8_mk 1600 python benchmarks/benchmark.py --quant woq8 --batch_size 1,8
run serve_matrix 1800 python benchmarks/serve_bench.py --matrix
run serve_beam_dense 1400 python benchmarks/serve_bench.py --beam 4 --requests 16

echo "=== suite done ($(date +%H:%M:%S)) ==="
