"""Keep the real-weights WER trigger loaded (VERDICT r2 next#9): the moment
a genuine ``large-v2.pt`` lands, ``wer_matrix.py --checkpoint`` must produce
the reference's 6-row table unattended.  This dry run drives the EXACT
checkpoint code path (torch.load -> convert -> real FLAC clips -> table)
with a fabricated OpenAI-format checkpoint, so converter or CLI drift is
caught in CI instead of on the day the checkpoint shows up."""
import os
import subprocess
import sys

import pytest

from test_builder_e2e import _fake_openai_pt

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATASET = ("/root/reference/tensorrt_llm_july-release-v1/examples/whisper/"
           "LibriSpeech/valid-clean")

# real-clip dims: the audio front end produces 3000-frame mels (30 s
# windows), so the fake checkpoint must carry the real n_audio_ctx
WER_DIMS = dict(n_mels=80, n_vocab=51865, n_audio_ctx=1500,
                n_audio_state=64, n_audio_head=4, n_audio_layer=2,
                n_text_ctx=48, n_text_state=64, n_text_head=4,
                n_text_layer=2)


@pytest.mark.skipif(not os.path.isdir(DATASET),
                    reason="LibriSpeech valid-clean not present")
def test_wer_matrix_checkpoint_path_alive(tmp_path):
    pt = _fake_openai_pt(str(tmp_path / "fake-large.pt"), dims=WER_DIMS)
    out_md = str(tmp_path / "WER_dry.md")
    r = subprocess.run(
        [sys.executable, "examples/whisper/wer_matrix.py",
         "--checkpoint", pt, "--device", "cpu", "--max_clips", "2",
         "--configs", "fp,woq8", "--sample_len", "6", "--out", out_md],
        cwd=REPO, capture_output=True, text=True, timeout=560)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert r.stdout.count("[BENCHMARK] wer_matrix") == 2, r.stdout[-1500:]
    table = open(out_md).read()
    assert "| fp |" in table and "| woq8 |" in table
    # the table records which weights produced it
    assert "fake-large.pt" in table
