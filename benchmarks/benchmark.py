#!/usr/bin/env python
"""GPT-family generation benchmark emitting one-line ``[BENCHMARK]``
records (ref benchmarks/benchmark.py + gptSessionBenchmark.cpp; record
shape per benchmarks/README.md:33-35).

Example:
  python benchmarks/benchmark.py -m gpt_350m --batch_size 1,8 \
      --input_output_len 60,20 128,20
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

MODELS = {
    # name: (layers, hidden, heads, vocab)
    "gpt_350m": (24, 1024, 16, 51200),
    "gpt_125m": (12, 768, 12, 50257),
    "llama_7b_shape": (32, 4096, 32, 32000),   # GPT topology at 7B shape
    # true LLaMA topology (RoPE + rmsnorm + SwiGLU, no biases) — the
    # round-4 megakernel family extension's A/B targets
    "llama_7b": (32, 4096, 32, 32000),
    "llama_1b": (16, 2048, 16, 32000),
    # SantaCoder-class MQA (gpt_bigcode: head_dim 128, 1 KV head) — the
    # round-5 grouped megakernel / grouped decode-kernel A/B target
    "santacoder_1b": (24, 2048, 16, 49152),
}
LLAMA_FFN = {4096: 11008, 2048: 5504}
LLAMA_KW = dict(position_embedding="rope", norm="rmsnorm", norm_eps=1e-6,
                hidden_act="silu", gated_mlp=True, attn_bias=False,
                mlp_bias=False, tie_word_embeddings=False)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model", default="gpt_350m",
                   choices=sorted(MODELS))
    p.add_argument("--batch_size", default="1,8")
    p.add_argument("--input_output_len", nargs="+", default=["60,20"])
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--quant", default="none",
                   choices=["none", "woq8", "woq4", "sq"],
                   help="woq*: weight-only int8/int4; sq: SmoothQuant "
                        "W8A8 (int8 x int8 MXU GEMMs, per-channel + "
                        "per-token scales)")
    p.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--warm_up", type=int, default=2)
    p.add_argument("--num_runs", type=int, default=3)
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
    from eddie_wang_hackathon2023_tpu.runtime import (GenerationSession,
                                                      ModelConfig,
                                                      SamplingConfig)

    layers, hidden, heads, vocab = MODELS[args.model]
    max_len = max(sum(map(int, io.split(","))) for io in args.input_output_len)
    fam_kw = {}
    if args.model.startswith("llama_") and args.model != "llama_7b_shape":
        fam_kw = dict(LLAMA_KW, ffn_hidden_size=LLAMA_FFN[hidden])
    elif args.model.startswith("santacoder"):
        fam_kw = dict(num_kv_heads=1)
    config = DecoderConfig(vocab_size=vocab, hidden_size=hidden,
                           num_layers=layers, num_heads=heads,
                           max_position_embeddings=max(2048, max_len),
                           dtype=args.dtype, **fam_kw)
    model = DecoderLMHead(config)
    model.zeros_init()
    if args.quant in ("woq8", "woq4"):
        from eddie_wang_hackathon2023_tpu.quantization import QuantMode
        from eddie_wang_hackathon2023_tpu.quantization.surgery import (
            weight_only_quantize_state)
        qmode = QuantMode.use_weight_only(args.quant == "woq4")
        model, qstate = weight_only_quantize_state(model, model.state_dict(),
                                                   qmode)
        model.load_state_dict(qstate, strict=False)
    elif args.quant == "sq":
        from eddie_wang_hackathon2023_tpu.quantization import QuantMode
        from eddie_wang_hackathon2023_tpu.quantization.surgery import (
            smooth_quantize, smooth_quantize_state_dict)
        qmode = QuantMode.use_smooth_quant(per_token=True, per_channel=True)
        state = model.state_dict()
        model = smooth_quantize(model, qmode)
        qstate = smooth_quantize_state_dict(model, state, qmode)
        model.load_state_dict(qstate, strict=False)
    mc = ModelConfig(vocab_size=vocab, num_layers=layers, num_heads=heads,
                     hidden_size=hidden, max_seq_len=max(2048, max_len),
                     num_kv_heads=config.num_kv_heads)
    # end_id outside vocab => decode never stops early (pure throughput)
    sess = GenerationSession(mc, model, SamplingConfig(end_id=-1, pad_id=0))
    rs = np.random.RandomState(0)

    for bs in (int(b) for b in args.batch_size.split(",")):
        for io in args.input_output_len:
            in_len, out_len = map(int, io.split(","))
            ids = rs.randint(0, vocab, (bs, in_len)).astype(np.int32)
            lens = np.full((bs,), in_len, np.int32)
            for _ in range(args.warm_up):
                sess.decode(ids, lens, max_new_tokens=out_len)
            # distinct prompts per timed run: repeated same-arg dispatches
            # can be served from the axon tunnel's result cache without
            # re-executing (see bench.py / bert_bench.py)
            runs_ids = [rs.randint(0, vocab, (bs, in_len)).astype(np.int32)
                        for _ in range(args.num_runs)]
            times = []
            for rids in runs_ids:
                t0 = time.time()
                sess.decode(rids, lens, max_new_tokens=out_len)
                times.append(time.time() - t0)
            latency = min(times)
            toks = bs * out_len
            print(f"[BENCHMARK] model_name {args.model} world_size 1 "
                  f"num_heads {heads} num_layers {layers} hidden_size {hidden} "
                  f"vocab_size {vocab} precision {args.dtype} "
                  f"quant {args.quant} "
                  f"batch_size {bs} input_length {in_len} "
                  f"output_length {out_len} latency(ms) {latency * 1e3:.2f} "
                  f"tokens_per_sec {toks / latency:.2f}")


if __name__ == "__main__":
    main()
