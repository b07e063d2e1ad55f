#!/bin/bash
# fp16/bf16 path (ref E/whisper/run.sh)
set -e
python examples/whisper/build.py --model_path "${MODEL_PT:-large-v2.pt}" \
    --output_dir whisper_outputs
python examples/whisper/run.py --engine_dir whisper_outputs "$@"
