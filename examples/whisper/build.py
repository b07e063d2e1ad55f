#!/usr/bin/env python
"""Build a deployable Whisper checkpoint from an OpenAI ``.pt``
(ref E/whisper/build.py — same flag surface, but the artifact is converted
+ optionally quantised weights + config JSONs; compilation happens lazily
on first run and lands in the persistent XLA cache).

  python examples/whisper/build.py --model_path large-v2.pt \
      --output_dir whisper_outputs --use_weight_only int8
  python examples/whisper/build.py --model_path large-v2.pt \
      --output_dir out_int8kv --int8_kv_cache \
      --calib_dataset LibriSpeech/valid-clean --calib_clips 16
"""
import argparse
import sys

sys.path.insert(0, __file__.rsplit("/examples/", 1)[0])


def parse_arguments():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", type=str, required=True,
                   help="OpenAI whisper checkpoint (.pt)")
    p.add_argument("--output_dir", type=str, default="whisper_outputs")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float16", "float32"])
    p.add_argument("--use_weight_only", type=str, default=None,
                   choices=[None, "int8", "int4"],
                   help="weight-only-quantised linears (ref --use_weight_only)")
    p.add_argument("--int8_kv_cache", action="store_true",
                   help="calibrated int8 decoder KV cache (ref --int8_kv_cache)")
    p.add_argument("--int8_cross_kv", action="store_true",
                   help="calibrated static-scale int8 cross-KV (beyond-ref; "
                        "same scale model as the reference's int8-KV "
                        "calibration, needs --calib_dataset)")
    p.add_argument("--calib_dataset", type=str, default=None,
                   help="dir of .flac clips for int8-KV calibration "
                        "(ref torch_whisper_convert over valid-clean)")
    p.add_argument("--calib_clips", type=int, default=16)
    p.add_argument("--log_level", type=str, default="info")
    return p.parse_args()


def main():
    args = parse_arguments()
    from eddie_wang_hackathon2023_tpu import logger
    from eddie_wang_hackathon2023_tpu.builder import build_from_openai_pt
    from eddie_wang_hackathon2023_tpu.quantization import QuantMode

    logger.set_level(args.log_level)
    quant_mode = QuantMode(0)
    if args.use_weight_only:
        quant_mode = QuantMode.use_weight_only(
            use_int4_weights=args.use_weight_only == "int4")
    if args.int8_kv_cache:
        quant_mode = quant_mode | QuantMode.INT8_KV_CACHE

    int8_kv_scales = None
    cross_kv_scales = None
    if args.int8_kv_cache or args.int8_cross_kv:
        if not args.calib_dataset:
            sys.exit("--int8_kv_cache/--int8_cross_kv need "
                     "--calib_dataset (flac dir)")
        import glob
        import os

        import torch

        from eddie_wang_hackathon2023_tpu.audio import (log_mel_spectrogram,
                                                        pad_or_trim,
                                                        read_flac)
        from eddie_wang_hackathon2023_tpu.models.whisper import (
            CrossAttnKV, WhisperConfig, WhisperDecoder, WhisperEncoder)
        from eddie_wang_hackathon2023_tpu.models.whisper.convert import (
            load_openai_state_dict)
        from eddie_wang_hackathon2023_tpu.models.whisper.pipeline import (
            DecodingOptions, WhisperPipeline)
        from eddie_wang_hackathon2023_tpu.quantization.calibration import (
            calibrate_int8_kv)
        ckpt = torch.load(args.model_path, map_location="cpu",
                          weights_only=False)
        d = ckpt["dims"]
        config = WhisperConfig(
            n_mels=d["n_mels"], n_vocab=d["n_vocab"],
            n_audio_ctx=d["n_audio_ctx"], n_audio_state=d["n_audio_state"],
            n_audio_head=d["n_audio_head"], n_audio_layer=d["n_audio_layer"],
            n_text_ctx=d["n_text_ctx"], n_text_state=d["n_text_state"],
            n_text_head=d["n_text_head"], n_text_layer=d["n_text_layer"],
            dtype=args.dtype)
        enc, dec, ckv = load_openai_state_dict(ckpt["model_state_dict"],
                                               config)
        pipe = WhisperPipeline(config, enc, dec, ckv,
                               DecodingOptions(language="en"))
        clips = sorted(glob.glob(os.path.join(args.calib_dataset,
                                              "**", "*.flac"),
                                 recursive=True))[:args.calib_clips]
        if not clips:
            sys.exit(f"no .flac under {args.calib_dataset}")
        mels = [log_mel_spectrogram(pad_or_trim(read_flac(c)))
                for c in clips]
        if args.int8_kv_cache:
            logger.info(f"calibrating int8 KV on {len(mels)} clips")
            int8_kv_scales = calibrate_int8_kv(pipe, mels)
        if args.int8_cross_kv:
            import numpy as np

            from eddie_wang_hackathon2023_tpu.quantization.calibration import (
                calibrate_cross_kv_scales)
            logger.info(f"calibrating cross-KV scales on {len(mels)} clips")
            pipe._ensure_params()
            xas = [np.asarray(pipe.get_audio_features(np.stack([m])))
                   for m in mels]
            cross_kv_scales = calibrate_cross_kv_scales(
                pipe.cross_kv, pipe._params_ckv, xas)

    build_from_openai_pt(args.model_path, args.output_dir, dtype=args.dtype,
                         quant_mode=quant_mode,
                         int8_kv_scales=int8_kv_scales,
                         cross_kv_scales=cross_kv_scales)
    logger.info(f"checkpoint written to {args.output_dir}")


if __name__ == "__main__":
    main()
