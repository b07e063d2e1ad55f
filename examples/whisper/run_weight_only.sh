#!/bin/bash
# int8 weight-only linears (ref E/whisper/run_weight_only.sh)
set -e
python examples/whisper/build.py --model_path "${MODEL_PT:-large-v2.pt}" \
    --output_dir whisper_outputs_weight_only --use_weight_only int8
python examples/whisper/run.py --engine_dir whisper_outputs_weight_only "$@"
