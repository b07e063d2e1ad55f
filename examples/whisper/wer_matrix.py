#!/usr/bin/env python
"""WER config matrix over LibriSpeech valid-clean (ref README.md:166-174
table: fp16 / int8_kv_cache / int8_weight_only / combined).

Without a downloadable checkpoint, runs tiny-dim random weights SHARED
across configs through the full real pipeline (FLAC decode -> mel ->
encode -> cross-KV -> filtered greedy decode -> tokenizer -> English
normalizer) and reports, per config:
  * corpus WER vs ground truth (meaningless in absolute terms with random
    weights — reported for harness completeness), and
  * WER vs the fp32 config's hypotheses — the *relative* transcription
    divergence each quantisation mode introduces, the measurable analogue
    of the reference's quant WER deltas.
With --checkpoint <large-v2.pt> the same command produces the real
ground-truth WER table (one run per config, real weights).

  python examples/whisper/wer_matrix.py --device cpu --max_clips 40 \
      --out WER.md
"""
import argparse
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/examples/", 1)[0])

from summarize import DEFAULT_DATASET, load_dataset  # noqa: E402


def build_pipeline(config, enc_sd, dec_sd, ckv_sd, quant, kv_scales, opts,
                   ckv_scales=None):
    import numpy as np
    from eddie_wang_hackathon2023_tpu.models.whisper import (
        CrossAttnKV, WhisperDecoder, WhisperEncoder)
    from eddie_wang_hackathon2023_tpu.models.whisper.pipeline import (
        WhisperPipeline)
    from eddie_wang_hackathon2023_tpu.quantization import QuantMode
    from eddie_wang_hackathon2023_tpu.quantization.surgery import (
        weight_only_quantize_state)

    qmode = QuantMode(0)
    if "woq8" in quant:
        qmode = qmode | QuantMode.use_weight_only(False)
    if "woq4" in quant:
        qmode = qmode | QuantMode.use_weight_only(True)
    if "kv8" in quant:
        qmode = qmode.set_int8_kv_cache()
    # "sqenc": SmoothQuant W8A8 the ENCODER only (the bench.py speed
    # knob) — the decoder keeps its own quant recipe
    sqenc = "sqenc" in quant
    enc = WhisperEncoder(config, QuantMode(0) if sqenc else qmode)
    dec = WhisperDecoder(config, qmode, quantize_lm_head="lmq8" in quant)
    # "ckv8s" = static calibrated scales (the deployment recipe);
    # "ckv8" = dynamic per-utterance amax
    static_ckv = "ckv8s" in quant
    ckv = CrossAttnKV(config,
                      int8_output=static_ckv or "ckv8" in quant,
                      static_scale=static_ckv)
    ckv_sd = dict(ckv_sd)
    if static_ckv:
        ckv_sd["kv_scale"] = np.asarray(ckv_scales, np.float32)
    enc_sd, dec_sd = dict(enc_sd), dict(dec_sd)
    if "kv8" in quant:
        t = np.asarray(kv_scales, np.float32).reshape(-1, 1)
        dec_sd["blocks.attn.kv_orig_quant_scale"] = 1.0 / t
        dec_sd["blocks.attn.kv_quant_orig_scale"] = t
    if qmode.is_weight_only():
        if not sqenc:
            enc, enc_sd = weight_only_quantize_state(enc, enc_sd, qmode)
        dec, dec_sd = weight_only_quantize_state(dec, dec_sd, qmode)
    if sqenc:
        from eddie_wang_hackathon2023_tpu.quantization.surgery import (
            smooth_quantize, smooth_quantize_state_dict)
        sq_mode = QuantMode.use_smooth_quant(per_token=True,
                                             per_channel=True)
        enc = smooth_quantize(enc, sq_mode)
        enc_sd = smooth_quantize_state_dict(enc, enc_sd, sq_mode)
    if "lmq8" in quant:
        from eddie_wang_hackathon2023_tpu.models.whisper.model import (
            quantize_lm_head_state)
        dec_sd.update(quantize_lm_head_state(dec_sd))
    enc.load_state_dict(enc_sd, strict=False)
    dec.load_state_dict(dec_sd, strict=False)
    ckv.load_state_dict(dict(ckv_sd))
    pipe = WhisperPipeline(config, enc, dec, ckv, opts, qmode)
    pipe.bind_params()
    return pipe


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default=DEFAULT_DATASET)
    p.add_argument("--checkpoint", default=None,
                   help="OpenAI .pt checkpoint; omit for tiny random")
    p.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--max_clips", type=int, default=0)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--sample_len", type=int, default=24)
    p.add_argument("--out", default=None, help="write a markdown table here")
    p.add_argument("--configs",
                   default="fp,woq8,woq4,kv8,ckv8,ckv8s,lmq8,sqenc,"
                           "woq8+kv8,woq8+ckv8+lmq8,woq8+ckv8s+lmq8,"
                           "woq8+ckv8s+lmq8+sqenc")
    args = p.parse_args()

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")   # pin BEFORE first device
        # touch: enumerating devices would initialise the axon TPU backend
        # too, which hangs forever when the relay is wedged
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    import numpy as np
    from eddie_wang_hackathon2023_tpu.audio import (N_SAMPLES,
                                                    log_mel_spectrogram,
                                                    pad_or_trim, read_flac)
    from eddie_wang_hackathon2023_tpu.models.whisper import (
        CrossAttnKV, WhisperConfig, WhisperDecoder, WhisperEncoder)
    from eddie_wang_hackathon2023_tpu.models.whisper.pipeline import (
        DecodingOptions)
    from eddie_wang_hackathon2023_tpu.quantization.calibration import (
        calibrate_int8_kv)
    from eddie_wang_hackathon2023_tpu.text.normalizers import \
        EnglishTextNormalizer
    from eddie_wang_hackathon2023_tpu.text.wer import wer

    if args.checkpoint:
        import torch
        from eddie_wang_hackathon2023_tpu.models.whisper.convert import (
            cross_kv_state_dict, decoder_state_dict, encoder_state_dict)
        ckpt = torch.load(args.checkpoint, map_location="cpu",
                          weights_only=False)
        dims = ckpt["dims"]
        config = WhisperConfig(**{k: dims[k] for k in (
            "n_mels", "n_vocab", "n_audio_ctx", "n_audio_state",
            "n_audio_head", "n_audio_layer", "n_text_ctx", "n_text_state",
            "n_text_head", "n_text_layer")}, dtype="bfloat16")
        sd = ckpt["model_state_dict"]
        enc_sd = encoder_state_dict(sd, config)
        dec_sd = decoder_state_dict(sd, config)
        ckv_sd = cross_kv_state_dict(sd, config)
        opts = DecodingOptions(language="en")
    else:
        config = WhisperConfig(n_audio_state=64, n_audio_head=4,
                               n_audio_layer=2, n_text_state=64,
                               n_text_head=4, n_text_layer=2, n_text_ctx=64,
                               dtype="float32")
        enc = WhisperEncoder(config)
        dec = WhisperDecoder(config)
        ckv = CrossAttnKV(config)
        enc.random_init(jax.random.PRNGKey(0), 0.05)
        dec.random_init(jax.random.PRNGKey(1), 0.05)
        ckv.random_init(jax.random.PRNGKey(2), 0.05)
        enc_sd, dec_sd, ckv_sd = (enc.state_dict(), dec.state_dict(),
                                  ckv.state_dict())
        opts = DecodingOptions(language="en", sample_len=args.sample_len)

    items = load_dataset(args.dataset)
    if args.max_clips:
        items = items[:args.max_clips]
    mels, refs_raw = [], []
    for flac, ref_text in items:
        audio = read_flac(flac)
        if audio.shape[0] > N_SAMPLES:
            continue
        mels.append(np.asarray(log_mel_spectrogram(
            pad_or_trim(audio, N_SAMPLES))))
        refs_raw.append(ref_text)
    print(f"dataset: {len(mels)} clips <=30s from {args.dataset}")

    normalizer = EnglishTextNormalizer()
    refs = [normalizer(r) for r in refs_raw]

    # int8-KV calibration on the fp pipeline over (a subset of) the set —
    # the torch_whisper_convert.py capture_activation_range equivalent
    fp_pipe = build_pipeline(config, enc_sd, dec_sd, ckv_sd, "fp", None,
                             opts)
    kv_scales = calibrate_int8_kv(fp_pipe, mels[:8], batch_size=args.batch)
    print(f"int8-KV calibration amax/layer: {np.round(kv_scales, 4)}")
    from eddie_wang_hackathon2023_tpu.quantization.calibration import (
        calibrate_cross_kv_scales)
    fp_pipe._ensure_params()
    xas = [np.asarray(fp_pipe.get_audio_features(np.stack(mels[i:i + 1])))
           for i in range(min(8, len(mels)))]
    ckv_scales = calibrate_cross_kv_scales(fp_pipe.cross_kv,
                                           fp_pipe._params_ckv, xas)
    print(f"cross-KV calibration scale/layer: {np.round(ckv_scales, 5)}")

    rows = []
    fp_hyps = None
    for quant in args.configs.split(","):
        pipe = (fp_pipe if quant == "fp" else
                build_pipeline(config, enc_sd, dec_sd, ckv_sd, quant,
                               kv_scales, opts, ckv_scales=ckv_scales))
        hyps = []
        t0 = time.time()
        for i in range(0, len(mels), args.batch):
            batch = np.stack(mels[i:i + args.batch])
            for r in pipe.transcribe(batch):
                hyps.append(normalizer(r.text))
        dt = time.time() - t0
        w_gt = 100.0 * wer(refs, hyps)
        if fp_hyps is None:
            fp_hyps = hyps
            w_fp = 0.0
        else:
            w_fp = 100.0 * wer(fp_hyps, hyps)
        rows.append((quant, w_gt, w_fp, dt))
        print(f"[BENCHMARK] wer_matrix config {quant} clips {len(hyps)} "
              f"wer_gt {w_gt:.2f}% wer_vs_fp {w_fp:.2f}% wall_s {dt:.1f}")

    if args.out:
        src = (os.path.basename(args.checkpoint) if args.checkpoint
               else "tiny-random (shared seed)")
        lines = [
            "# WER matrix — LibriSpeech valid-clean",
            "",
            f"Weights: {src}; {len(mels)} clips; full pipeline "
            "(FLAC → mel → encode → cross-KV → filtered greedy decode → "
            "EnglishTextNormalizer).",
            "",
            "`wer_vs_fp32` is the transcription divergence each quant mode "
            "introduces relative to the fp32 pipeline on identical weights "
            "— the measurable analogue of the reference's quant WER deltas "
            "(README.md:166-174) until a real checkpoint is available.",
            "",
            "| config | WER vs ground truth | WER vs fp32 hyps | wall s |",
            "|---|---|---|---|",
        ]
        for quant, w_gt, w_fp, dt in rows:
            lines.append(f"| {quant} | {w_gt:.2f}% | {w_fp:.2f}% | "
                         f"{dt:.1f} |")
        lines += [
            "",
            "To reproduce the reference's real-weights table the moment a "
            "`large-v2.pt` is available:",
            "",
            "```bash",
            "python examples/whisper/wer_matrix.py "
            "--checkpoint large-v2.pt \\",
            "    --dataset .../LibriSpeech/test-clean --out WER.md",
            "```",
            "",
        ]
        with open(args.out, "w") as f:
            f.write("\n".join(lines))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
