#!/usr/bin/env python
"""GPT-family summarization + ROUGE harness (ref E/gpt/summarize.py).

The reference scores TRT-LLM GPT against HuggingFace on CNN/DailyMail
with ROUGE (``load_dataset('ccdv/cnn_dailymail')`` + ``load_metric
('rouge')``, summarize.py:63-77,159-181).  This environment has no
network, so the harness is offline-first:

* ``--dataset_dir``: a local dataset — either a HuggingFace
  ``datasets.load_from_disk`` directory or a ``.jsonl`` with
  ``{"article": ..., "highlights": ...}`` rows (the CNN/DailyMail
  schema).  Without it, a small built-in article set keeps the full
  path runnable unattended.
* ``--hf_model``: a local transformers checkpoint directory (weights +
  tokenizer).  Without it, a random-initialised model of ``--family``
  plus a byte-level fallback tokenizer demonstrate the complete
  pipeline (ROUGE will be ~0 on random weights, by construction).
* ``--test_hf`` additionally runs the HF model on the same articles
  (the reference's ``eval_torch`` twin) for a side-by-side table.

Emits one ``[BENCHMARK]`` line + ROUGE-1/2/L, matching the reference's
report format (``benchmarks/README.md:33-35`` one-line records).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/examples/", 1)[0])

# a tiny built-in set so the harness runs with zero downloads (schema =
# CNN/DailyMail); replace with --dataset_dir for real evaluation
_BUILTIN = [
    {"article": "The city council voted on Tuesday to expand the downtown "
                "bike lane network by twelve miles after months of public "
                "hearings. Supporters said the lanes reduce traffic "
                "accidents, while opponents worried about parking. "
                "Construction begins in March and is funded by the state "
                "transportation grant awarded last year.",
     "highlights": "Council approves twelve miles of new bike lanes. "
                   "Construction starts in March with state funding."},
    {"article": "Researchers at the marine institute reported that the "
                "coral reef survey this summer found a surprising rebound "
                "in staghorn coral coverage, up eight percent from the "
                "previous survey. The team credits cooler water "
                "temperatures and the nursery transplant program started "
                "five years ago.",
     "highlights": "Staghorn coral coverage rose eight percent. Cooler "
                   "water and a transplant program are credited."},
    {"article": "The regional airline announced it will add three daily "
                "flights between the coastal hub and the mountain resort "
                "town starting in December, citing record demand from "
                "winter tourists. Ticket sales open next week and the "
                "airline expects the route to be profitable in its first "
                "season.",
     "highlights": "Three daily flights added between the coast and the "
                   "mountains in December. Sales open next week."},
]


class _ByteTokenizer:
    """Zero-download fallback: utf-8 bytes + 1 as ids, 0 = pad/eos.
    Lets the whole pipeline (encode -> generate -> decode -> ROUGE) run
    against random weights without any vocab file."""
    eos_token_id = 0
    pad_token_id = 0

    def encode(self, text):
        return [b + 1 for b in text.encode("utf-8")[:512]]

    def decode(self, ids):
        return bytes(i - 1 for i in ids if 0 < i <= 256).decode(
            "utf-8", errors="ignore")


def load_articles(path, limit):
    if path is None:
        return _BUILTIN[:limit]
    if os.path.isdir(path):
        import datasets
        ds = datasets.load_from_disk(path)
        if hasattr(ds, "keys") and "test" in ds:
            ds = ds["test"]
        return [dict(article=r["article"], highlights=r["highlights"])
                for r in list(ds)[:limit]]
    rows = []
    with open(path) as f:
        for line in f:
            rows.append(json.loads(line))
            if len(rows) >= limit:
                break
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="gpt2")
    p.add_argument("--hf_model", default=None,
                   help="local transformers checkpoint dir")
    p.add_argument("--dataset_dir", default=None,
                   help="local datasets dir or .jsonl (article/highlights)")
    p.add_argument("--max_articles", type=int, default=3)
    p.add_argument("--max_new_tokens", type=int, default=48)
    p.add_argument("--max_input_len", type=int, default=368)
    p.add_argument("--num_beams", type=int, default=1)
    p.add_argument("--use_weight_only", default=None,
                   choices=[None, "int8", "int4"])
    p.add_argument("--test_hf", action="store_true",
                   help="also score the HF model (ref eval_torch)")
    p.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    args = p.parse_args()

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    import numpy as np
    import torch
    import transformers as T
    from rouge_score import rouge_scorer

    from eddie_wang_hackathon2023_tpu.models.families import build_from_hf
    from eddie_wang_hackathon2023_tpu.quantization import QuantMode
    from eddie_wang_hackathon2023_tpu.runtime import (GenerationSession,
                                                      ModelConfig,
                                                      SamplingConfig)

    torch.manual_seed(0)
    if args.hf_model:
        hf = T.AutoModelForCausalLM.from_pretrained(args.hf_model).eval()
        tok = T.AutoTokenizer.from_pretrained(args.hf_model)
        vocab_pad = 0
    else:
        # random weights in the requested family's architecture; byte
        # tokenizer (ids < 260 stay well inside any vocab)
        cfg = T.GPT2Config(vocab_size=1024, n_positions=1024, n_embd=128,
                           n_layer=4, n_head=4)
        hf = T.GPT2LMHeadModel(cfg).eval()
        tok = _ByteTokenizer()
        vocab_pad = 0

    quant_mode = QuantMode(0)
    if args.use_weight_only:
        quant_mode = QuantMode.use_weight_only(
            use_int4_weights=args.use_weight_only == "int4")
    model, config = build_from_hf(args.family, hf, dtype="float32"
                                  if args.device == "cpu" else "bfloat16",
                                  quant_mode=quant_mode)
    mc = ModelConfig(vocab_size=config.vocab_size,
                     num_layers=config.num_layers,
                     num_heads=config.num_heads,
                     hidden_size=config.hidden_size,
                     num_kv_heads=config.num_kv_heads,
                     max_seq_len=args.max_input_len + args.max_new_tokens)
    end_id = getattr(tok, "eos_token_id", 0) or 0
    sess = GenerationSession(
        mc, model, SamplingConfig(end_id=end_id, pad_id=end_id,
                                  num_beams=args.num_beams))

    articles = load_articles(args.dataset_dir, args.max_articles)
    scorer = rouge_scorer.RougeScorer(["rouge1", "rouge2", "rougeL"],
                                      use_stemmer=True)

    def rouge_of(hyps):
        agg = {k: 0.0 for k in ("rouge1", "rouge2", "rougeL")}
        for hyp, row in zip(hyps, articles):
            s = scorer.score(row["highlights"], hyp)
            for k in agg:
                agg[k] += s[k].fmeasure
        return {k: v / max(len(hyps), 1) for k, v in agg.items()}

    # ours
    hyps, n_tok = [], 0
    t0 = time.time()
    for row in articles:
        prompt = ("Summarize the following article:\n" + row["article"]
                  + "\nTL;DR: ")
        ids = tok.encode(prompt)[-args.max_input_len:]
        ids_np = np.asarray([ids], np.int32)
        toks, lens, _ = sess.decode(ids_np, np.asarray([len(ids)]),
                                    max_new_tokens=args.max_new_tokens)
        if args.num_beams > 1:
            best, blens = sess.best_sequences(toks, lens, _)
            out = best[0][len(ids):int(blens[0])]
        else:
            out = toks[0, 0][len(ids):int(lens[0, 0])]
        n_tok += len(out)
        hyps.append(tok.decode(list(map(int, out))))
    dt = time.time() - t0
    ours = rouge_of(hyps)

    label = args.use_weight_only or "float"
    print(f"[ours/{label}] {len(articles)} articles in {dt:.2f}s "
          f"({n_tok / max(dt, 1e-9):.1f} tok/s)")
    for k, v in ours.items():
        print(f"  {k}: {v * 100:.2f}")

    if args.test_hf:
        t0 = time.time()
        hf_hyps = []
        for row in articles:
            prompt = ("Summarize the following article:\n" + row["article"]
                      + "\nTL;DR: ")
            ids = tok.encode(prompt)[-args.max_input_len:]
            with torch.no_grad():
                out = hf.generate(torch.tensor([ids]),
                                  max_new_tokens=args.max_new_tokens,
                                  num_beams=args.num_beams,
                                  do_sample=False, pad_token_id=end_id)
            hf_hyps.append(tok.decode(list(map(int, out[0][len(ids):]))))
        hf_rouge = rouge_of(hf_hyps)
        print(f"[hf] {len(articles)} articles in {time.time() - t0:.2f}s")
        for k, v in hf_rouge.items():
            print(f"  {k}: {v * 100:.2f}")

    print(f"[BENCHMARK] gpt_summarize family {args.family} quant {label} "
          f"beams {args.num_beams} articles {len(articles)} "
          f"latency_s {dt:.3f} tok_per_s {n_tok / max(dt, 1e-9):.2f} "
          f"rouge1 {ours['rouge1'] * 100:.2f} "
          f"rouge2 {ours['rouge2'] * 100:.2f} "
          f"rougeL {ours['rougeL'] * 100:.2f}")


if __name__ == "__main__":
    main()
