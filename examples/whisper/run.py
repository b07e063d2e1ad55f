#!/usr/bin/env python
"""Single-utterance Whisper transcription (ref E/whisper/run.py).

Examples:
  # random tiny model, synthetic audio, CPU — smoke test
  python examples/whisper/run.py --tiny-random --device cpu

  # real checkpoint dir built with build.py, real flac
  python examples/whisper/run.py --engine_dir whisper_outputs \
      --input_file path/to/audio.flac
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/examples/", 1)[0])


def parse_arguments():
    p = argparse.ArgumentParser()
    p.add_argument("--log_level", type=str, default="info")
    p.add_argument("--engine_dir", type=str, default="whisper_outputs")
    p.add_argument("--input_file", type=str, default=None)
    p.add_argument("--language", type=str, default=None)
    p.add_argument("--device", type=str, default=None,
                   choices=[None, "cpu", "tpu"])
    p.add_argument("--tiny-random", action="store_true",
                   help="random-initialised tiny model (no checkpoint)")
    p.add_argument("--batch", type=int, default=1)
    return p.parse_args()


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
        opts = DecodingOptions(language=args.language)

    pipe = WhisperPipeline(config, enc, dec, ckv, opts)
    pipe.bind_params()

    if args.input_file:
        audio = read_flac(args.input_file)
    else:
        rng = np.random.RandomState(0)
        audio = (rng.randn(16000 * 3) * 0.02).astype(np.float32)
        print("(no --input_file: using 3s of synthetic noise)")
    audio = pad_or_trim(audio, N_SAMPLES)
    mel = log_mel_spectrogram(audio)[None]
    if args.batch > 1:
        mel = np.repeat(mel, args.batch, axis=0)

    t0 = time.time()
    results = pipe.transcribe(mel)
    dt = time.time() - t0
    for r in results:
        print(f"[{r.language}] ({r.no_speech_prob:.3f} no-speech, "
              f"{r.avg_logprob:.3f} avg-lp): {r.text!r}")
    print(f"pipeline wall time: {dt:.2f}s (includes compile on first run)")

    # second call is compile-free
    t0 = time.time()
    pipe.transcribe(mel)
    print(f"second run: {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
