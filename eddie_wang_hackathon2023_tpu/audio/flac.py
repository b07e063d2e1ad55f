"""FLAC reading — placeholder until the native C++ decoder lands (the
reference shells out to ffmpeg, whisper_utils.py:17-54; this box has no
ffmpeg, so we ship our own decoder in native/)."""
from __future__ import annotations

import numpy as np


def read_flac(path: str) -> np.ndarray:
    from ..native import flac as _flac
    return _flac.decode_file(path)
