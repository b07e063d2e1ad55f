#!/usr/bin/env python
"""BERT inference benchmark (ref benchmarks/bert_benchmark.py: bert_base /
bert_large forward latency over a (batch, input_len) grid, one
``[BENCHMARK]`` line per cell).

  PYTHONPATH=... python benchmarks/bert_bench.py -m bert_base \
      --batch_size 1,8 --input_len 128,512 [--device cpu]
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

MODELS = {
    # ref benchmarks/allowed_configs.py:146-170
    "bert_base": dict(num_layers=12, num_heads=12, hidden_size=768,
                      vocab_size=30522, max_position_embeddings=1024),
    "bert_large": dict(num_layers=24, num_heads=16, hidden_size=1024,
                       vocab_size=30522, max_position_embeddings=1024),
    "bert_tiny": dict(num_layers=2, num_heads=4, hidden_size=64,
                      vocab_size=512, max_position_embeddings=128),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model", default="bert_base",
                   choices=sorted(MODELS))
    p.add_argument("--batch_size", default="1,8")
    p.add_argument("--input_len", default="128,512")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--warm_up", type=int, default=2)
    p.add_argument("--num_runs", type=int, default=5)
    args = p.parse_args()

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")   # pin BEFORE first device
        # touch: enumerating devices would initialise the axon TPU backend
        # too, which hangs forever when the relay is wedged
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    import jax.numpy as jnp
    import numpy as np

    from eddie_wang_hackathon2023_tpu.builder import enable_compile_cache
    from eddie_wang_hackathon2023_tpu.models.bert.model import (BertConfig,
                                                                BertModel)
    enable_compile_cache()
    spec = MODELS[args.model]
    config = BertConfig(dtype=args.dtype, **spec)
    model = BertModel(config)
    model.zeros_init()
    params = model.state_dict()

    @jax.jit
    def run(params, ids, lens):
        return model.apply(params, ids, input_lengths=lens)

    rs = np.random.RandomState(0)
    for inlen in (int(x) for x in args.input_len.split(",")):
        if inlen > spec["max_position_embeddings"]:
            continue
        for bs in (int(x) for x in args.batch_size.split(",")):
            ids = jnp.asarray(
                rs.randint(0, spec["vocab_size"], (bs, inlen)), jnp.int32)
            lens = jnp.full((bs,), inlen, jnp.int32)

            def sink(outs):
                # block_until_ready alone is NOT a sync barrier through
                # the axon tunnel (it once reported 0.06 ms for a
                # bert_base@512 forward).  A data-dependent host fetch
                # cannot materialise without every forward executing.
                return np.asarray(sum(jnp.sum(leaf.astype(jnp.float32))
                                      for leaf in jax.tree.leaves(outs)))

            sink([run(params, ids, lens)])     # compile forward AND sink
            for _ in range(args.warm_up):
                sink([run(params, ids, lens)])
            # distinct inputs per timed run: same-arg dispatch repeats get
            # served from the tunnel's result cache (see bench.py)
            batches = [
                jnp.asarray(rs.randint(0, spec["vocab_size"], (bs, inlen)),
                            jnp.int32) for _ in range(args.num_runs)]
            jax.block_until_ready(batches)
            t0 = time.time()
            sink([run(params, b, lens) for b in batches])
            ms = (time.time() - t0) / args.num_runs * 1e3
            print(f"[BENCHMARK] model_name {args.model} precision "
                  f"{args.dtype} batch_size {bs} input_length {inlen} "
                  f"latency(ms) {ms:.2f} "
                  f"seq_per_sec {bs / ms * 1e3:.2f}")


if __name__ == "__main__":
    main()
