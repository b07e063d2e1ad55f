#!/usr/bin/env python
"""GPT-family text generation example (ref E/gpt/run.py).

No model downloads are possible in this environment, so by default this
runs a random-initialised model of the requested family to demonstrate the
full path: HF-config -> DecoderLMHead -> GenerationSession (greedy /
sampling / beam).  Point --hf_model at a local checkpoint directory to use
real weights.
"""
import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/examples/", 1)[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="gpt2",
                   choices=["gpt2", "llama", "opt", "bloom", "gptj", "gptneox",
                            "chatglm6b", "santacoder"])
    p.add_argument("--hf_model", default=None,
                   help="local transformers checkpoint dir (optional)")
    p.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--max_new_tokens", type=int, default=24)
    p.add_argument("--num_beams", type=int, default=1)
    p.add_argument("--top_k", type=int, default=1)
    p.add_argument("--top_p", type=float, default=0.0)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--input_tokens", default="1,2,3,4,5",
                   help="comma-separated token ids (no tokenizer downloads)")
    args = p.parse_args()

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")   # pin BEFORE first device
        # touch: enumerating devices would initialise the axon TPU backend
        # too, which hangs forever when the relay is wedged
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    import numpy as np
    import torch
    import transformers as T
    from eddie_wang_hackathon2023_tpu.models.families import build_from_hf
    from eddie_wang_hackathon2023_tpu.runtime import (GenerationSession,
                                                      ModelConfig,
                                                      SamplingConfig)

    torch.manual_seed(0)
    if args.family == "chatglm6b":
        # transformers ships no ChatGLM class (THUDM uses trust_remote_code);
        # demo with random weights in the THUDM state-dict layout
        import types

        import numpy as np

        from eddie_wang_hackathon2023_tpu.models.decoder import DecoderLMHead
        from eddie_wang_hackathon2023_tpu.models.families import (
            chatglm6b_config, from_hf_chatglm6b)
        hid, n_layer, heads, vocab = 256, 4, 8, 1000
        cfg = types.SimpleNamespace(
            vocab_size=vocab, hidden_size=hid, num_layers=n_layer,
            num_attention_heads=heads, inner_hidden_size=4 * hid,
            max_sequence_length=256, layernorm_epsilon=1e-5)
        config = chatglm6b_config(cfg, dtype="float32")
        rng = np.random.default_rng(0)
        sd = {"transformer.word_embeddings.weight":
              rng.normal(size=(vocab, hid)),
              "transformer.final_layernorm.weight": np.ones(hid),
              "transformer.final_layernorm.bias": np.zeros(hid),
              "lm_head.weight": rng.normal(size=(vocab, hid)) * 0.02}
        for i in range(n_layer):
            pre = f"transformer.layers.{i}."
            sd.update({
                pre + "input_layernorm.weight": np.ones(hid),
                pre + "input_layernorm.bias": np.zeros(hid),
                pre + "attention.query_key_value.weight":
                    rng.normal(size=(3 * hid, hid)) * 0.02,
                pre + "attention.query_key_value.bias": np.zeros(3 * hid),
                pre + "attention.dense.weight":
                    rng.normal(size=(hid, hid)) * 0.02,
                pre + "attention.dense.bias": np.zeros(hid),
                pre + "post_attention_layernorm.weight": np.ones(hid),
                pre + "post_attention_layernorm.bias": np.zeros(hid),
                pre + "mlp.dense_h_to_4h.weight":
                    rng.normal(size=(4 * hid, hid)) * 0.02,
                pre + "mlp.dense_h_to_4h.bias": np.zeros(4 * hid),
                pre + "mlp.dense_4h_to_h.weight":
                    rng.normal(size=(hid, 4 * hid)) * 0.02,
                pre + "mlp.dense_4h_to_h.bias": np.zeros(hid),
            })
        sd = {k: v.astype(np.float32) for k, v in sd.items()}
        model = DecoderLMHead(config)
        model.load_state_dict(from_hf_chatglm6b(sd, config), strict=False)
    elif args.hf_model:
        hf = T.AutoModelForCausalLM.from_pretrained(args.hf_model)
    else:
        mk = {
            "gpt2": lambda: T.GPT2LMHeadModel(T.GPT2Config(
                vocab_size=1000, n_positions=256, n_embd=256, n_layer=4,
                n_head=8)),
            "llama": lambda: T.LlamaForCausalLM(T.LlamaConfig(
                vocab_size=1000, hidden_size=256, intermediate_size=688,
                num_hidden_layers=4, num_attention_heads=8,
                max_position_embeddings=256, tie_word_embeddings=False)),
            "opt": lambda: T.OPTForCausalLM(T.OPTConfig(
                vocab_size=1000, hidden_size=256, ffn_dim=1024,
                num_hidden_layers=4, num_attention_heads=8,
                max_position_embeddings=256, word_embed_proj_dim=256)),
            "bloom": lambda: T.BloomForCausalLM(T.BloomConfig(
                vocab_size=1000, hidden_size=256, n_layer=4, n_head=8)),
            "gptj": lambda: T.GPTJForCausalLM(T.GPTJConfig(
                vocab_size=1000, n_positions=256, n_embd=256, n_layer=4,
                n_head=8, rotary_dim=16)),
            "gptneox": lambda: T.GPTNeoXForCausalLM(T.GPTNeoXConfig(
                vocab_size=1000, hidden_size=256, intermediate_size=1024,
                num_hidden_layers=4, num_attention_heads=8,
                max_position_embeddings=256)),
            # GPT-2 + multi-query attention (ref SantaCoder variant)
            "santacoder": lambda: T.GPTBigCodeForCausalLM(T.GPTBigCodeConfig(
                vocab_size=1000, n_positions=256, n_embd=256, n_layer=4,
                n_head=8, multi_query=True)),
        }[args.family]
        hf = mk().eval()

    if args.family != "chatglm6b":
        model, config = build_from_hf(args.family, hf, dtype="float32")
    mc = ModelConfig(vocab_size=config.vocab_size,
                     num_layers=config.num_layers,
                     num_heads=config.num_heads,
                     hidden_size=config.hidden_size,
                     max_seq_len=config.max_position_embeddings)
    sc = SamplingConfig(end_id=config.vocab_size - 1,
                        pad_id=config.vocab_size - 1,
                        num_beams=args.num_beams, top_k=args.top_k,
                        top_p=args.top_p, temperature=args.temperature)
    sess = GenerationSession(mc, model, sc)
    prompt = np.asarray([[int(t) for t in args.input_tokens.split(",")]],
                        np.int32)
    t0 = time.time()
    tokens, lens, cum = sess.decode(prompt, np.array([prompt.shape[1]]),
                                    max_new_tokens=args.max_new_tokens)
    dt = time.time() - t0
    best, best_len = sess.best_sequences(tokens, lens, cum)
    out = best[0][prompt.shape[1]:best_len[0]].tolist()
    print(f"family={args.family} beams={args.num_beams}")
    print("prompt :", prompt[0].tolist())
    print("output :", out)
    print(f"({dt:.2f}s incl. compile; "
          f"{args.max_new_tokens / max(dt, 1e-9):.1f} tok/s)")


if __name__ == "__main__":
    main()
