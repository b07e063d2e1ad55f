#!/bin/bash
# combined int8 weight-only + int8 KV cache (ref run_weight_only_int8_kv_cache.sh)
set -e
python examples/whisper/build.py --model_path "${MODEL_PT:-large-v2.pt}" \
    --output_dir whisper_outputs_w8kv8 --use_weight_only int8 --int8_kv_cache \
    --calib_dataset "${CALIB_DIR:-LibriSpeech/valid-clean}" --calib_clips 16
python examples/whisper/run.py --engine_dir whisper_outputs_w8kv8 "$@"
