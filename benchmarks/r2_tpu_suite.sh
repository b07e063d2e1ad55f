#!/bin/bash
# Round-2 TPU measurement suite: run when the axon relay is healthy.
# Results land in /tmp/r2suite/*.log; each step is timeout-guarded and
# independent, so a wedged tunnel only loses the current step.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
OUT=/tmp/r2suite
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

# 1. headline bench, speed-optimal recipe (fused proj+q default on)
run bench_fused 1400 python bench.py
# 2. ablation: fusions off (isolate the epilogue/prologue win)
EWT_FUSE_PROJ=0 EWT_FUSE_Q=0 run bench_nofuse 1400 python bench.py
# 2b. ablation: dynamic cross-KV scales (isolate the static-scale win)
BENCH_CKV_DYNAMIC=1 run bench_ckvdyn 1400 python bench.py
# 2c. candidate: fully-fused self-attention step (default-off knob)
EWT_FUSE_QKV=1 run bench_fuseqkv 1400 python bench.py
# 3. bf16 row
BENCH_QUANT=bf16 run bench_bf16 1400 python bench.py
# 4. batch-8 throughput row
BENCH_BATCH=8 run bench_b8 1400 python bench.py
# 5. decode-loop trace for the README roofline table
BENCH_QUANT="woq8+ckv8+lmq8" PROFILE_TARGET=loop LOOP_STEPS=32 \
    run prof_loop 1400 python benchmarks/profile_decode.py
# 6. encoder trace (chained, data-dependent)
PROFILE_TARGET=encoder run prof_enc 1200 python benchmarks/profile_decode.py
# 6b. per-layer fusion-variant grid (decides proj/xq defaults)
run fusion_sweep 1400 python benchmarks/fusion_sweep.py
# 7. GPT-350M quant grid: bf16 / woq8 / SmoothQuant (VERDICT #9)
run gpt_bf16 1200 python benchmarks/benchmark.py --quant none --batch_size 1,8
run gpt_woq8 1200 python benchmarks/benchmark.py --quant woq8 --batch_size 1,8
run gpt_sq   1200 python benchmarks/benchmark.py --quant sq   --batch_size 1,8
# 7b. BERT forward grid (ref bert_benchmark parity)
run bert_base 1200 python benchmarks/bert_bench.py -m bert_base --batch_size 1,8 --input_len 128,512
# 8. serving grid: (dense|paged) x (greedy|top-p)
run serve_matrix 1400 python benchmarks/serve_bench.py --matrix
echo "=== suite done ($(date +%H:%M:%S)) ==="
