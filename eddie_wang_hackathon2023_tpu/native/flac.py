"""ctypes bindings for the native FLAC decoder (flac_decoder.cc)."""
from __future__ import annotations

import ctypes
from functools import lru_cache

import numpy as np

from . import flac_library_path


@lru_cache(maxsize=1)
def _lib():
    lib = ctypes.CDLL(flac_library_path())
    lib.ewt_flac_decode.restype = ctypes.c_int
    lib.ewt_flac_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.ewt_flac_free.argtypes = [ctypes.POINTER(ctypes.c_int32)]
    return lib


def decode_file(path: str, target_sr: int = 16000) -> np.ndarray:
    """Decode to mono float32 in [-1, 1] (the contract of the reference's
    load_audio, whisper_utils.py:17-54).  Raises on decode error or sample
    rate mismatch (no resampler yet — LibriSpeech is natively 16 kHz)."""
    lib = _lib()
    samples = ctypes.POINTER(ctypes.c_int32)()
    n = ctypes.c_int64()
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    bps = ctypes.c_int()
    rc = lib.ewt_flac_decode(path.encode(), ctypes.byref(samples),
                             ctypes.byref(n), ctypes.byref(sr),
                             ctypes.byref(ch), ctypes.byref(bps))
    if rc != 0:
        raise RuntimeError(f"FLAC decode failed ({rc}) for {path}")
    try:
        total = n.value * ch.value
        arr = np.ctypeslib.as_array(samples, shape=(total,)).copy()
    finally:
        lib.ewt_flac_free(samples)
    if ch.value > 1:
        arr = arr.reshape(-1, ch.value).mean(axis=1)
    scale = float(1 << (bps.value - 1))
    audio = (arr.astype(np.float32) / scale)
    if sr.value != target_sr:
        raise RuntimeError(
            f"{path}: sample rate {sr.value} != {target_sr} (no resampler)")
    return audio
