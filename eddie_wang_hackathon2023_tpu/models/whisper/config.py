"""Whisper model dimensions.

Matches the ``ModelDimensions`` metadata stored in OpenAI checkpoints and
read by the reference build (``E/whisper/build.py:389-399`` pulls dims from
the .pt file; e.g. large-v2: n_audio_state=1280, n_audio_head=20,
n_audio_layer=32, n_text_ctx=448, n_vocab=51865).
"""
from __future__ import annotations

import dataclasses
import json
from typing import Optional


@dataclasses.dataclass
class WhisperConfig:
    n_mels: int = 80
    n_vocab: int = 51865
    n_audio_ctx: int = 1500
    n_audio_state: int = 1280
    n_audio_head: int = 20
    n_audio_layer: int = 32
    n_text_ctx: int = 448
    n_text_state: int = 1280
    n_text_head: int = 20
    n_text_layer: int = 32
    dtype: str = "bfloat16"
    # pad the vocab to a multiple (usually tp_size) so embedding/lm-head
    # shard on the mesh instead of replicating (ref pad_vocab_size,
    # T/_utils.py:194).  Logits are sliced back to n_vocab — callers never
    # see the pad rows
    vocab_pad_multiple: int = 1

    @property
    def head_dim(self) -> int:
        return self.n_text_state // self.n_text_head

    @property
    def padded_vocab(self) -> int:
        from ...parallel.mapping import pad_vocab_size
        return pad_vocab_size(self.n_vocab, self.vocab_pad_multiple)

    def to_json(self, path) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)

    @staticmethod
    def from_json(path) -> "WhisperConfig":
        with open(path) as f:
            return WhisperConfig(**json.load(f))


# OpenAI model-family dims (multilingual vocab 51865; *.en vocab 51864)
PRESETS = {
    "tiny": dict(n_audio_state=384, n_audio_head=6, n_audio_layer=4,
                 n_text_state=384, n_text_head=6, n_text_layer=4),
    "base": dict(n_audio_state=512, n_audio_head=8, n_audio_layer=6,
                 n_text_state=512, n_text_head=8, n_text_layer=6),
    "small": dict(n_audio_state=768, n_audio_head=12, n_audio_layer=12,
                  n_text_state=768, n_text_head=12, n_text_layer=12),
    "medium": dict(n_audio_state=1024, n_audio_head=16, n_audio_layer=24,
                   n_text_state=1024, n_text_head=16, n_text_layer=24),
    "large-v2": dict(n_audio_state=1280, n_audio_head=20, n_audio_layer=32,
                     n_text_state=1280, n_text_head=20, n_text_layer=32),
}


def whisper_config(name: str, dtype: str = "bfloat16",
                   english_only: Optional[bool] = None) -> WhisperConfig:
    base = name.replace(".en", "")
    if base not in PRESETS:
        raise ValueError(f"unknown whisper preset {name!r}; one of {list(PRESETS)}")
    en = english_only if english_only is not None else name.endswith(".en")
    return WhisperConfig(n_vocab=51864 if en else 51865, dtype=dtype,
                         **PRESETS[base])
