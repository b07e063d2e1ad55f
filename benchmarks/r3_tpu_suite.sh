#!/bin/bash
# Round-3 TPU measurement suite.  The kernel-fusion A/Bs at the top were
# RUN on v5e early in round 3 (results in README.md; the q/qkv/ln/res
# fusion candidates lost and were deleted — the rows here re-capture the
# surviving configs for the record).  Results land in /tmp/r3suite;
# each step is timeout-guarded and independent, so a wedged tunnel only
# loses the current step.  Summarise with:
#     python benchmarks/r2_suite_summary.py /tmp/r3suite
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
OUT=/tmp/r3suite
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

# ---- headline + surviving fusion A/Bs --------------------------------------
run bench_fused 1400 python bench.py
EWT_FUSE_PROJ=0 BENCH_STAGES=0 run bench_nofuse 1400 python bench.py
BENCH_CKV_DYNAMIC=1 BENCH_STAGES=0 run bench_ckvdyn 1400 python bench.py
BENCH_QUANT=bf16 BENCH_STAGES=0 run bench_bf16 1400 python bench.py
BENCH_QUANT=bf16 EWT_FUSE_PROJ_BF16=0 BENCH_STAGES=0 run bench_bf16_nofuse 1400 python bench.py
BENCH_BATCH=8 BENCH_STAGES=0 run bench_b8 1400 python bench.py

# ---- int4: group-wise vs per-channel, pallas vs xla (r3) --------------------
BENCH_QUANT=woq4 BENCH_STAGES=0 run bench_woq4_g128 1400 python bench.py
BENCH_QUANT=woq4 EWT_INT4_GROUP=0 BENCH_STAGES=0 run bench_woq4_perchan 1400 python bench.py
BENCH_QUANT=woq4 EWT_INT4_XLA=1 BENCH_STAGES=0 run bench_woq4_xla 1400 python bench.py

# ---- traces for the README roofline table ----------------------------------
BENCH_QUANT="woq8+ckv8+lmq8" PROFILE_TARGET=loop LOOP_STEPS=32 \
    run prof_loop 1400 python benchmarks/profile_decode.py
PROFILE_TARGET=encoder run prof_enc 1200 python benchmarks/profile_decode.py
run fusion_sweep 1400 python benchmarks/fusion_sweep.py

# ---- GPT-350M quant grid (bf16 bs1 is VERDICT next#6's baseline row) -------
run gpt_bf16 1200 python benchmarks/benchmark.py --quant none --batch_size 1,8
run gpt_woq8 1200 python benchmarks/benchmark.py --quant woq8 --batch_size 1,8
run gpt_sq   1200 python benchmarks/benchmark.py --quant sq   --batch_size 1,8

# ---- BERT forward grid ------------------------------------------------------
run bert_base 1200 python benchmarks/bert_bench.py -m bert_base --batch_size 1,8 --input_len 128,512

# ---- serving: (dense|paged) x (greedy|top-p) x (sync|async) (r3) ------------
run serve_matrix 1800 python benchmarks/serve_bench.py --matrix
# async depth sweep at the headline slot count
run serve_async2 1200 python benchmarks/serve_bench.py --async_depth 2
# steps_per_tick x async interaction
run serve_spt8_async 1200 python benchmarks/serve_bench.py --steps_per_tick 8 --async_depth 1
run serve_spt8_sync  1200 python benchmarks/serve_bench.py --steps_per_tick 8

# ---- beam serving (r3): dense + paged ---------------------------------------
run serve_beam_dense 1400 python benchmarks/serve_bench.py --beam 4 --requests 16
run serve_beam_paged 1400 python benchmarks/serve_bench.py --beam 4 --requests 16 --paged
run serve_beam_mixed 2700 python benchmarks/serve_bench.py --beam 4 --requests 16 --mixed

# ---- offline beam (indirection only; gather mode is a documented OOM) -------
run beam_ind 1200 python benchmarks/beam_bench.py --modes indirection
# whisper pipeline beam=5 (the reference decoding recipe, on device)
run whisper_beam5 1800 python benchmarks/whisper_beam_bench.py
# decode-chunk sweep (re-validate the shape-aware default per toolchain)
run chunk_sweep 1400 python benchmarks/decode_chunk_sweep.py

# ---- mixed admission: dense vs paged (r3) -----------------------------------
run serve_mixed_dense 1200 python benchmarks/serve_bench.py --mixed
run serve_mixed_paged 1200 python benchmarks/serve_bench.py --mixed --paged

echo "=== suite done ($(date +%H:%M:%S)) ==="
