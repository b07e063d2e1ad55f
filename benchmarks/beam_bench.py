#!/usr/bin/env python
"""Beam-decode cost: full-cache gather-per-step vs cache_indirection.

The gather mode physically reorders the whole [L, B*beam, 2, H, D, S]
cache by parent every step (O(cache) copies — the cliff the reference
avoids with its cache_indirection plugin argument, T/functional.py:2738);
the indirection mode advances a [B, beam, S] row map and gathers inside
the attention read.  Reports marginal ms/token for each at a long context
so the difference is visible.

  python benchmarks/beam_bench.py --device tpu --ctx 2048 --beam 4
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def run(session, prompt, lengths, n_new, seed=0):
    t, l, c = session.decode(prompt, lengths, max_new_tokens=n_new,
                             seed=seed)
    return t


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--ctx", type=int, default=2048)
    p.add_argument("--beam", type=int, default=4)
    p.add_argument("--layers", type=int, default=24)
    p.add_argument("--hidden", type=int, default=1024)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--vocab", type=int, default=50257)
    p.add_argument("--prompt_len", type=int, default=None,
                   help="default ctx - 136 (so decode runs near full ctx)")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--modes", default="gather,indirection",
                   help="comma list; gather at beam>1 with a ~2k cache "
                        "crashes the axon TPU worker (platform bug), so "
                        "long-ctx runs should pass --modes indirection")
    args = p.parse_args()

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")   # pin BEFORE first device
        # touch: enumerating devices would initialise the axon TPU backend
        # too, which hangs forever when the relay is wedged
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    import numpy as np

    from eddie_wang_hackathon2023_tpu.builder import enable_compile_cache
    from eddie_wang_hackathon2023_tpu.models.decoder import (DecoderConfig,
                                                             DecoderLMHead)
    from eddie_wang_hackathon2023_tpu.runtime import (GenerationSession,
                                                      ModelConfig,
                                                      SamplingConfig)
    enable_compile_cache()
    config = DecoderConfig(vocab_size=args.vocab, hidden_size=args.hidden,
                           num_layers=args.layers, num_heads=args.heads,
                           max_position_embeddings=args.ctx,
                           dtype=args.dtype)
    model = DecoderLMHead(config)
    model.zeros_init()
    mc = ModelConfig(vocab_size=args.vocab, num_layers=args.layers,
                     num_heads=args.heads, hidden_size=args.hidden,
                     max_seq_len=args.ctx)
    plen = args.prompt_len or max(args.ctx - 136, 8)
    rs = np.random.RandomState(0)
    prompt = rs.randint(0, args.vocab, (1, plen)).astype(np.int32)
    lengths = np.array([plen])
    sc = SamplingConfig(end_id=-1, pad_id=0, num_beams=args.beam)

    modes = [m.strip() for m in args.modes.split(",") if m.strip()]
    for label, flag in (("gather", False), ("indirection", True)):
        if label not in modes:
            continue
        sess = GenerationSession(mc, model, sc, use_cache_indirection=flag)
        # marginal per-token cost from two decode lengths (removes the
        # prefill + dispatch fixed cost)
        run(sess, prompt, lengths, 8)                 # compile short
        run(sess, prompt, lengths, 40)                # compile long
        t0 = time.time()
        run(sess, prompt, lengths, 8)
        t_short = time.time() - t0
        t0 = time.time()
        run(sess, prompt, lengths, 40)
        t_long = time.time() - t0
        marginal = (t_long - t_short) / 32 * 1e3
        print(f"[BENCHMARK] beam_decode mode {label} beam {args.beam} "
              f"ctx {args.ctx} layers {args.layers} "
              f"short_s {t_short:.3f} long_s {t_long:.3f} "
              f"marginal_ms_per_tok {marginal:.2f}")


if __name__ == "__main__":
    main()
