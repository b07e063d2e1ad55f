"""examples/gpt/summarize.py — the CNN/DailyMail ROUGE harness analogue
(ref E/gpt/summarize.py) must run offline end-to-end: built-in articles,
random weights, byte tokenizer, [BENCHMARK] + ROUGE lines."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_summarize_offline_smoke():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples/gpt/summarize.py"),
         "--device", "cpu", "--max_new_tokens", "8", "--test_hf"],
        capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "[BENCHMARK] gpt_summarize" in out.stdout
    assert "rouge1" in out.stdout and "[hf]" in out.stdout


def test_summarize_jsonl_dataset(tmp_path):
    ds = tmp_path / "mini.jsonl"
    ds.write_text(json.dumps({"article": "A dog ran in the park today.",
                              "highlights": "Dog runs in park."}) + "\n")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples/gpt/summarize.py"),
         "--device", "cpu", "--max_new_tokens", "4",
         "--dataset_dir", str(ds)],
        capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "articles 1" in out.stdout
