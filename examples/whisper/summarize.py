#!/usr/bin/env python
"""LibriSpeech WER evaluation harness (ref E/whisper/summarize.py:31-196):
walks a LibriSpeech-style directory (flac + trans.txt), transcribes each
clip, normalises both sides with EnglishTextNormalizer and reports corpus
WER plus latency, in the reference's [BENCHMARK]-style one-liner.

Clips longer than 30 s are skipped (ref summarize.py:118-119).
"""
import argparse
import glob
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/examples/", 1)[0])

DEFAULT_DATASET = ("/root/reference/tensorrt_llm_july-release-v1/examples/"
                   "whisper/LibriSpeech/valid-clean")


def parse_arguments():
    p = argparse.ArgumentParser()
    p.add_argument("--engine_dir", type=str, default="whisper_outputs")
    p.add_argument("--dataset", type=str, default=DEFAULT_DATASET)
    p.add_argument("--device", type=str, default=None)
    p.add_argument("--tiny-random", action="store_true")
    p.add_argument("--max_clips", type=int, default=0)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--log_level", type=str, default="warning")
    return p.parse_args()


def load_dataset(root):
    trans = {}
    for tf in glob.glob(os.path.join(root, "**/*trans.txt"), recursive=True):
        with open(tf) as f:
            for line in f:
                parts = line.strip().split(" ", 1)
                if len(parts) == 2:
                    trans[parts[0]] = parts[1]
    items = []
    for flac in sorted(glob.glob(os.path.join(root, "**/*.flac"),
                                 recursive=True)):
        key = os.path.splitext(os.path.basename(flac))[0]
        if key in trans:
            items.append((flac, trans[key]))
    return items


def main():
    args = parse_arguments()
    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")   # pin BEFORE first device
        # touch: enumerating devices would initialise the axon TPU backend
        # too, which hangs forever when the relay is wedged
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    import numpy as np
    from eddie_wang_hackathon2023_tpu import logger, profiler
    from eddie_wang_hackathon2023_tpu.audio import (N_SAMPLES,
                                                    log_mel_spectrogram,
                                                    pad_or_trim, read_flac)
    from eddie_wang_hackathon2023_tpu.builder import load_whisper_checkpoint
    from eddie_wang_hackathon2023_tpu.models.whisper import (
        CrossAttnKV, WhisperConfig, WhisperDecoder, WhisperEncoder)
    from eddie_wang_hackathon2023_tpu.models.whisper.pipeline import (
        DecodingOptions, WhisperPipeline)
    from eddie_wang_hackathon2023_tpu.text.normalizers import \
        EnglishTextNormalizer
    from eddie_wang_hackathon2023_tpu.text.wer import wer

    logger.set_level(args.log_level)

    if args.tiny_random:
        config = WhisperConfig(n_audio_state=64, n_audio_head=4,
                               n_audio_layer=2, n_text_state=64, n_text_head=4,
                               n_text_layer=2, n_text_ctx=64, dtype="float32")
        enc, dec, ckv = (WhisperEncoder(config), WhisperDecoder(config),
                         CrossAttnKV(config))
        enc.random_init(jax.random.PRNGKey(0), 0.05)
        dec.random_init(jax.random.PRNGKey(1), 0.05)
        ckv.random_init(jax.random.PRNGKey(2), 0.05)
        opts = DecodingOptions(language="en", sample_len=16)
    else:
        config, enc, dec, ckv, _ = load_whisper_checkpoint(args.engine_dir)
        opts = DecodingOptions(language="en")

    pipe = WhisperPipeline(config, enc, dec, ckv, opts)
    pipe.bind_params()

    items = load_dataset(args.dataset)
    if args.max_clips:
        items = items[:args.max_clips]
    if not items:
        print(f"no (flac, transcript) pairs found under {args.dataset}")
        return

    normalizer = EnglishTextNormalizer()
    refs, hyps = [], []
    total_audio_s = 0.0
    profiler.start("tensorrt_llm_tpu")
    batch_mels, batch_refs = [], []

    def flush():
        nonlocal batch_mels, batch_refs
        if not batch_mels:
            return
        mel = np.stack(batch_mels)
        results = pipe.transcribe(mel)
        for r, ref_text in zip(results, batch_refs):
            refs.append(normalizer(ref_text))
            hyps.append(normalizer(r.text))
        batch_mels, batch_refs = [], []

    skipped = 0
    for flac, ref_text in items:
        audio = read_flac(flac)
        if audio.shape[0] > N_SAMPLES:  # >30s clips skipped like reference
            skipped += 1
            continue
        total_audio_s += audio.shape[0] / 16000.0
        batch_mels.append(log_mel_spectrogram(pad_or_trim(audio, N_SAMPLES)))
        batch_refs.append(ref_text)
        if len(batch_mels) == args.batch:
            flush()
    flush()
    elapsed = profiler.stop("tensorrt_llm_tpu")

    score = wer(refs, hyps)
    n = len(refs)
    print(f"[BENCHMARK] clips {n} skipped {skipped} "
          f"audio_s {total_audio_s:.1f} wall_s {elapsed:.1f} "
          f"rtf {total_audio_s / max(elapsed, 1e-9):.2f} "
          f"wer {100 * score:.2f}%")
    for i in range(min(3, n)):
        print(f"  ref: {refs[i][:80]}")
        print(f"  hyp: {hyps[i][:80]}")


if __name__ == "__main__":
    main()
