#!/usr/bin/env python
"""Continuous-batching serving benchmark (the batch-manager counterpart of
gptManagerBenchmark): saturated request queue through
ContinuousBatchingManager, reports request and token throughput.

  python benchmarks/serve_bench.py -m gpt_125m --requests 64 \
      --max_batch_size 8 --device cpu [--paged] [--top_p 0.9] [--matrix]

--matrix sweeps (dense|paged) x (greedy|top-p) and prints one [BENCHMARK]
line per cell (the serving capability/perf grid).
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

MODELS = {
    "gpt_350m": (24, 1024, 16, 51200),
    "gpt_125m": (12, 768, 12, 50257),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model", default="gpt_350m", choices=sorted(MODELS))
    p.add_argument("--requests", type=int, default=64)
    p.add_argument("--max_batch_size", type=int, default=8)
    p.add_argument("--max_new_tokens", type=int, default=20)
    p.add_argument("--steps_per_tick", type=int, default=1)
    p.add_argument("--prompt_len", type=int, default=60)
    p.add_argument("--max_seq_len", type=int, default=128)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--paged", action="store_true",
                   help="block-paged KV pool instead of dense slot cache")
    p.add_argument("--tokens_per_block", type=int, default=32)
    p.add_argument("--top_p", type=float, default=0.0,
                   help=">0: nucleus sampling at temperature 0.8")
    p.add_argument("--mixed", action="store_true",
                   help="mixed context+generation tick (admission prefill "
                        "chunks ride the decode step program)")
    p.add_argument("--beam", type=int, default=0,
                   help="per-request beam width (beam-enabled manager)")
    p.add_argument("--matrix", action="store_true",
                   help="sweep (dense|paged) x (greedy|top_p=0.9)")
    args = p.parse_args()

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")   # pin BEFORE first device
        # touch: enumerating devices would initialise the axon TPU backend
        # too, which hangs forever when the relay is wedged
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    import numpy as np

    from eddie_wang_hackathon2023_tpu.models.decoder import (DecoderConfig,
                                                             DecoderLMHead)
    from eddie_wang_hackathon2023_tpu.runtime.batch_manager import (
        ContinuousBatchingManager, InferenceRequest)
    from eddie_wang_hackathon2023_tpu.runtime.sampling import SamplingConfig

    layers, hidden, heads, vocab = MODELS[args.model]
    config = DecoderConfig(vocab_size=vocab, hidden_size=hidden,
                           num_layers=layers, num_heads=heads,
                           max_position_embeddings=args.max_seq_len,
                           dtype=args.dtype)
    model = DecoderLMHead(config)
    model.zeros_init()

    cells = ([(pg, tp) for pg in (False, True) for tp in (0.0, 0.9)]
             if args.matrix else [(args.paged, args.top_p)])
    for paged, top_p in cells:
        run_cell(args, model, vocab, paged, top_p, args.mixed, args.beam)


def run_cell(args, model, vocab, paged, top_p, mixed=False, beam=0):
    import numpy as np
    import time
    from eddie_wang_hackathon2023_tpu.runtime.batch_manager import (
        ContinuousBatchingManager, InferenceRequest)
    from eddie_wang_hackathon2023_tpu.runtime.sampling import SamplingConfig

    rs = np.random.RandomState(0)
    queue = [InferenceRequest(i,
                              rs.randint(0, vocab,
                                         (args.prompt_len,)).astype(np.int32),
                              max_new_tokens=args.max_new_tokens, end_id=-1)
             for i in range(args.requests)]
    done = []
    admitted_at = {}   # rid -> admission wall time
    first_tok = {}     # rid -> admission->first-token latency (s)

    def pull(n):
        out = [queue.pop(0) for _ in range(min(n, len(queue)))]
        now = time.time()
        for r in out:
            admitted_at[r.request_id] = now
        return out

    def push(r):
        if r.request_id not in first_tok and r.request_id in admitted_at:
            first_tok[r.request_id] = time.time() - admitted_at[r.request_id]
        if r.finished:
            done.append(r)

    sc = (SamplingConfig(end_id=-1, pad_id=0, temperature=0.8, top_p=top_p)
          if top_p > 0 else SamplingConfig(end_id=-1, pad_id=0))
    if beam > 1:
        sc = SamplingConfig(end_id=-1, pad_id=0, num_beams=beam)
        for r in queue:
            r.sampling = sc
    mgr = ContinuousBatchingManager(
        model, sc,
        max_batch_size=args.max_batch_size, max_seq_len=args.max_seq_len,
        steps_per_tick=args.steps_per_tick,
        paged=paged, tokens_per_block=args.tokens_per_block,
        mixed_admission=mixed,
        max_beam_width=max(beam, 1),
        get_inference_requests=pull,
        send_response=push)
    # warm the two programs (prefill bucket + step) on one request
    warm = [InferenceRequest(10**6, np.zeros((args.prompt_len,), np.int32),
                             max_new_tokens=2, end_id=-1)]
    wdone = []
    mgr.get_inference_requests = lambda n: [warm.pop()] if warm else []
    mgr.send_response = lambda r: wdone.append(r)
    mgr.run()
    mgr.get_inference_requests = pull
    mgr.send_response = push

    t0 = time.time()
    mgr.run()
    dt = time.time() - t0
    toks = sum(len(r.output_ids) for r in done)
    lat = sorted(first_tok.values())
    lat_line = (f"first_token_ms_mean {1e3 * sum(lat) / len(lat):.1f} "
                f"p95 {1e3 * lat[int(0.95 * (len(lat) - 1))]:.1f} "
                if lat else "")
    print(f"[BENCHMARK] serve model {args.model} slots {args.max_batch_size} "
          f"kv {'paged' if paged else 'dense'} "
          f"sampling {'top_p' + str(top_p) if top_p > 0 else 'greedy'} "
          f"steps_per_tick {args.steps_per_tick} "
          f"admission {'mixed' if mixed else 'prefill'} "
          f"beam {beam} "
          f"requests {len(done)} total_new_tokens {toks} wall_s {dt:.2f} "
          f"req_per_s {len(done) / dt:.2f} tokens_per_sec {toks / dt:.2f} "
          f"{lat_line}"
          f"scheduler {'native' if mgr.sched.__class__.__name__.startswith('Native') else 'python'}")


if __name__ == "__main__":
    main()
