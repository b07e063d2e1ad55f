#!/bin/bash
# Post-suite follow-ups: the re-engineered int4 megakernel (no-concat
# split dots), the sqenc row with a bigger compile budget, and the
# whisper beam=5 device trace (VERDICT asked for a trace-backed account
# of the remaining beam cost).
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
OUT=/tmp/r5suite
mkdir -p $OUT
cd /root/repo
run() {
    local name=$1 to=$2; shift 2
    echo "=== $name ($(date +%H:%M:%S)) ==="
    timeout "$to" "$@" > "$OUT/$name.log" 2>&1
    echo "    exit=$? tail:"; tail -3 "$OUT/$name.log" | sed 's/^/    /'
}
BENCH_QUANT="woq4+ckv8+lmq8" BENCH_STAGES=0 run bench_int4_mk2 3600 python bench.py
BENCH_QUANT="woq8+ckv8+lmq8+sqenc" BENCH_STAGES=0 run bench_sqenc2 3600 python bench.py
BEAM=5 PROFILE_TARGET=utt TRACE_DIR=/tmp/ewt_trace_beam LOOP_STEPS=40 \
    run prof_beam5 3000 python benchmarks/profile_decode.py
run llama1b_int4_mk2 2400 python benchmarks/benchmark.py -m llama_1b --quant woq4 --batch_size 1
EWT_MEGAKERNEL=0 run llama7b_woq8_nomk 2400 python benchmarks/benchmark.py -m llama_7b --quant woq8 --batch_size 1 --num_runs 2
echo "=== followup done ($(date +%H:%M:%S)) ==="
