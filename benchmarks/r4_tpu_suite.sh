#!/bin/bash
# Round-4 TPU measurement suite.  Focus: the decode megakernel and the
# manual async-DMA weight stream (both adopted default-ON after
# same-session device A/Bs), the batch-1 gate (batch-8 megakernel lost
# 3.84 vs 15.29 utt/s), and the SmoothQuant-encoder knob.  Results land
# in /tmp/r4suite; each step is timeout-guarded and independent.
# Summarise with:
#     python benchmarks/r2_suite_summary.py /tmp/r4suite
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
OUT=/tmp/r4suite
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

# ---- headline: megakernel A/B + weight-stream A/B ---------------------------
# (first row owns the cold compile — give it the big budget)
# default = manual-stream megakernel (both adopted on round-4 A/Bs)
run bench_mk 3600 python bench.py
EWT_MEGAKERNEL=0 BENCH_STAGES=0 run bench_nomk 2000 python bench.py
# ablation: the round-3 BlockSpec-pipelined weight stream
EWT_MK_WSTREAM=pipeline BENCH_STAGES=0 run bench_mk_pipeline 2400 python bench.py
# bf16 megakernel (float panel stream)
BENCH_QUANT=bf16 BENCH_STAGES=0 run bench_bf16_mk 2400 python bench.py
BENCH_QUANT=bf16 EWT_MEGAKERNEL=0 BENCH_STAGES=0 run bench_bf16_nomk 2000 python bench.py
# SmoothQuant W8A8 encoder on the speed recipe
BENCH_QUANT="woq8+ckv8+lmq8+sqenc" BENCH_STAGES=0 run bench_sqenc 2400 python bench.py
# batch-8 throughput mode: default (scanned — the megakernel is gated to
# batch 1 after its 3.84-vs-15.29 utt/s loss) + the forced-megakernel row
BENCH_BATCH=8 BENCH_STAGES=0 run bench_b8_default 2000 python bench.py
BENCH_BATCH=8 EWT_MK_MAX_BATCH=8 BENCH_STAGES=0 run bench_b8_mk_forced 2400 python bench.py

# ---- whole-utterance trace (README breakdown) -------------------------------
PROFILE_TARGET=utt run prof_utt 2400 python benchmarks/profile_decode.py
EWT_MK_WSTREAM=manual PROFILE_TARGET=utt TRACE_DIR=/tmp/ewt_trace_utt_man \
    run prof_utt_manual 2400 python benchmarks/profile_decode.py

# ---- GPT-350M grid: megakernel x quant --------------------------------------
run gpt_woq8_mk 1600 python benchmarks/benchmark.py --quant woq8 --batch_size 1,8
EWT_MEGAKERNEL=0 run gpt_woq8_nomk 1200 python benchmarks/benchmark.py --quant woq8 --batch_size 1,8
run gpt_bf16_mk 1600 python benchmarks/benchmark.py --quant none --batch_size 1,8
EWT_MEGAKERNEL=0 run gpt_bf16_nomk 1200 python benchmarks/benchmark.py --quant none --batch_size 1
EWT_MK_WSTREAM=pipeline run gpt_woq8_pipeline 1200 python benchmarks/benchmark.py --quant woq8 --batch_size 1
run gpt_sq 1200 python benchmarks/benchmark.py --quant sq --batch_size 1,8

# ---- LLaMA-class topology (round-4 megakernel family extension) -------------
run llama1b_woq8_mk 1600 python benchmarks/benchmark.py -m llama_1b --quant woq8 --batch_size 1
EWT_MEGAKERNEL=0 run llama1b_woq8_nomk 1400 python benchmarks/benchmark.py -m llama_1b --quant woq8 --batch_size 1
run llama7b_woq8_mk 2400 python benchmarks/benchmark.py -m llama_7b --quant woq8 --batch_size 1 --num_runs 2
EWT_MEGAKERNEL=0 run llama7b_woq8_nomk 2400 python benchmarks/benchmark.py -m llama_7b --quant woq8 --batch_size 1 --num_runs 2

# ---- regression rows (unchanged subsystems, spot checks) --------------------
run bert_base 1200 python benchmarks/bert_bench.py -m bert_base --batch_size 1,8 --input_len 128,512
run serve_matrix 1800 python benchmarks/serve_bench.py --matrix
run serve_beam_dense 1400 python benchmarks/serve_bench.py --beam 4 --requests 16
run beam_ind 1200 python benchmarks/beam_bench.py --modes indirection
run whisper_beam5 1800 python benchmarks/whisper_beam_bench.py

echo "=== suite done ($(date +%H:%M:%S)) ==="
