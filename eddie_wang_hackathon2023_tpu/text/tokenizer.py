"""Whisper tiktoken tokenizer.

Behavioural counterpart of ``E/whisper/tokenizer.py`` (Tokenizer:126) and
the encoding construction in ``E/whisper/decoding.py:425-457``: GPT-2 BPE
ranks plus Whisper's special tokens (<|startoftranscript|>, 99 language
tags, task tokens, <|nospeech|>, <|notimestamps|>, 1501 timestamp tokens at
0.02 s resolution).  Vocab data files live in ``../assets``.
"""
from __future__ import annotations

import base64
import os
from dataclasses import dataclass, field
from functools import cached_property, lru_cache
from typing import List, Optional, Tuple

import tiktoken

from .languages import LANGUAGES, TO_LANGUAGE_CODE

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets")

_SPEC_PAT = r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""


@lru_cache(maxsize=None)
def get_encoding(name: str = "multilingual") -> tiktoken.Encoding:
    vocab_path = os.path.join(_ASSET_DIR, f"{name}.tiktoken")
    with open(vocab_path) as f:
        ranks = {
            base64.b64decode(token): int(rank)
            for token, rank in (line.split() for line in f if line)
        }
    n_vocab = len(ranks)
    specials = [
        "<|endoftext|>",
        "<|startoftranscript|>",
        *[f"<|{lang}|>" for lang in LANGUAGES],
        "<|translate|>",
        "<|transcribe|>",
        "<|startoflm|>",
        "<|startofprev|>",
        "<|nospeech|>",
        "<|notimestamps|>",
        *[f"<|{i * 0.02:.2f}|>" for i in range(1501)],
    ]
    special_tokens = {tok: n_vocab + i for i, tok in enumerate(specials)}
    return tiktoken.Encoding(
        name=name,
        explicit_n_vocab=n_vocab + len(specials),
        pat_str=_SPEC_PAT,
        mergeable_ranks=ranks,
        special_tokens=special_tokens,
    )


@dataclass
class Tokenizer:
    encoding: tiktoken.Encoding
    language: Optional[str] = None
    task: Optional[str] = None
    sot_sequence: Tuple[int, ...] = field(default=())

    def __post_init__(self):
        self.special_tokens = dict(self.encoding._special_tokens)
        sot = self.special_tokens["<|startoftranscript|>"]
        seq = [sot]
        if self.language is not None:
            seq.append(sot + 1 + list(LANGUAGES).index(self.language))
        if self.task is not None:
            task_token = (self.special_tokens["<|transcribe|>"]
                          if self.task == "transcribe"
                          else self.special_tokens["<|translate|>"])
            seq.append(task_token)
        self.sot_sequence = tuple(seq)

    def encode(self, text: str, **kwargs) -> List[int]:
        return self.encoding.encode(text, **kwargs)

    def decode(self, token_ids, **kwargs) -> str:
        ids = [int(t) for t in token_ids if int(t) < self.timestamp_begin]
        return self.encoding.decode(ids, **kwargs)

    def decode_with_timestamps(self, token_ids, **kwargs) -> str:
        parts: List[str] = []
        run: List[int] = []
        for t in (int(x) for x in token_ids):
            if t >= self.timestamp_begin:
                if run:
                    parts.append(self.encoding.decode(run))
                    run = []
                parts.append(f"<|{(t - self.timestamp_begin) * 0.02:.2f}|>")
            else:
                run.append(t)
        if run:
            parts.append(self.encoding.decode(run))
        return "".join(parts)

    # -- special token ids -------------------------------------------------

    @cached_property
    def eot(self) -> int:
        return self.special_tokens["<|endoftext|>"]

    @cached_property
    def transcribe(self) -> int:
        return self.special_tokens["<|transcribe|>"]

    @cached_property
    def translate(self) -> int:
        return self.special_tokens["<|translate|>"]

    @cached_property
    def sot(self) -> int:
        return self.special_tokens["<|startoftranscript|>"]

    @cached_property
    def sot_lm(self) -> int:
        return self.special_tokens["<|startoflm|>"]

    @cached_property
    def sot_prev(self) -> int:
        return self.special_tokens["<|startofprev|>"]

    @cached_property
    def no_speech(self) -> int:
        return self.special_tokens["<|nospeech|>"]

    @cached_property
    def no_timestamps(self) -> int:
        return self.special_tokens["<|notimestamps|>"]

    @cached_property
    def timestamp_begin(self) -> int:
        return self.special_tokens["<|0.00|>"]

    @cached_property
    def language_token(self) -> int:
        if self.language is None:
            raise ValueError("tokenizer has no language specified")
        return self.sot + 1 + list(LANGUAGES).index(self.language)

    @cached_property
    def all_language_tokens(self) -> Tuple[int, ...]:
        return tuple(self.sot + 1 + i for i in range(len(LANGUAGES)))

    @cached_property
    def all_language_codes(self) -> Tuple[str, ...]:
        return tuple(LANGUAGES)

    @cached_property
    def sot_sequence_including_notimestamps(self) -> Tuple[int, ...]:
        return tuple(list(self.sot_sequence) + [self.no_timestamps])

    @cached_property
    def non_speech_tokens(self) -> Tuple[int, ...]:
        """Tokens for speaker tags / annotations to suppress
        (ref tokenizer.py:231-266; keeps basic punctuation)."""
        symbols = list('"#()*+/:;<=>@[\\]^_`{|}~「」『』')
        symbols += ("<< >> <<< >>> -- --- -( -[ (' (\" (( )) ((( ))) [[ ]] "
                    "{{ }} ♪♪ ♪♪♪").split()
        miscellaneous = set("♩♪♫♬♭♮♯")
        result = {self.encoding.encode(" -")[0],
                  self.encoding.encode(" '")[0]}
        for symbol in symbols + list(miscellaneous):
            for toks in [self.encoding.encode(symbol),
                         self.encoding.encode(" " + symbol)]:
                if len(toks) == 1 or symbol in miscellaneous:
                    result.add(toks[0])
        return tuple(sorted(result))


@lru_cache(maxsize=None)
def get_tokenizer(multilingual: bool = True,
                  language: Optional[str] = None,
                  task: Optional[str] = None) -> Tokenizer:
    """ref decoding.py get_tokenizer:457-480."""
    if language is not None:
        language = language.lower()
        if language not in LANGUAGES:
            if language in TO_LANGUAGE_CODE:
                language = TO_LANGUAGE_CODE[language]
            else:
                raise ValueError(f"Unsupported language: {language}")
    if multilingual:
        encoding_name = "multilingual"
        language = language or "en"
        task = task or "transcribe"
    else:
        encoding_name = "gpt2"
        language = None
        task = None
    return Tokenizer(encoding=get_encoding(encoding_name), language=language,
                     task=task)
