#!/bin/bash
# calibrated int8 KV cache (ref E/whisper/run_int8_kv_cache.sh; the
# torch-hook calibration is replaced by on-device calibrate_int8_kv)
set -e
python examples/whisper/build.py --model_path "${MODEL_PT:-large-v2.pt}" \
    --output_dir whisper_outputs_int8kv --int8_kv_cache \
    --calib_dataset "${CALIB_DIR:-LibriSpeech/valid-clean}" --calib_clips 16
python examples/whisper/run.py --engine_dir whisper_outputs_int8kv "$@"
