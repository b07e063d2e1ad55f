"""Audio frontend: log-Mel spectrogram.

Behavioural counterpart of ``E/whisper/whisper_utils.py:99-146`` minus the
torch/ffmpeg dependencies: STFT(n_fft=400, hop=160, hann, centred/reflect)
-> power -> 80-bin Slaney mel filterbank -> log10 -> clamp to (max-8)
-> (x+4)/4.  The filterbank is *computed* (librosa.filters.mel semantics:
Slaney mel scale, Slaney area normalisation) instead of shipped as an
opaque .npz; tests check it against the reference's mel_filters.npz
bit-for-bit (atol 1e-7).

The STFT runs in numpy on the host by default (it is a trivial cost next to
the encoder) or in jax (jnp backend) when batching on device is desirable.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Optional, Union

import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
N_MELS = 80
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480000
N_FRAMES = N_SAMPLES // HOP_LENGTH      # 3000 mel frames / window


def _hz_to_mel_slaney(f):
    """Slaney mel scale (librosa htk=False): linear below 1 kHz,
    logarithmic above."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    logstep = np.log(6.4) / 27.0
    mel = f / f_sp
    log_region = f >= min_log_hz
    mel = np.where(log_region,
                   min_log_hz / f_sp + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                   mel)
    return mel


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    hz = m * f_sp
    log_region = m >= min_log_mel
    hz = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), hz)
    return hz


@lru_cache(maxsize=4)
def mel_filters(n_mels: int = N_MELS, sr: int = SAMPLE_RATE,
                n_fft: int = N_FFT) -> np.ndarray:
    """[n_mels, n_fft//2 + 1] Slaney-normalised triangular filterbank —
    numerically identical to librosa.filters.mel(sr, n_fft, n_mels) and the
    reference's assets/mel_filters.npz."""
    fmax = sr / 2.0
    fft_freqs = np.linspace(0, sr / 2.0, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel_slaney(0.0), _hz_to_mel_slaney(fmax),
                          n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney area normalisation
    enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def pad_or_trim(array: np.ndarray, length: int = N_SAMPLES,
                axis: int = -1) -> np.ndarray:
    """ref whisper_utils.py:56-80."""
    if array.shape[axis] > length:
        array = np.take(array, range(length), axis=axis)
    if array.shape[axis] < length:
        pad_widths = [(0, 0)] * array.ndim
        pad_widths[axis] = (0, length - array.shape[axis])
        array = np.pad(array, pad_widths)
    return array


def _stft_power(audio: np.ndarray) -> np.ndarray:
    """Centred (reflect-padded) hann STFT power, torch.stft semantics.
    audio [T] -> [n_fft//2+1, n_frames] with the trailing frame dropped by
    the caller (ref whisper_utils.py:138 magnitudes = stft[..., :-1])."""
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float64)  # periodic hann
    pad = N_FFT // 2
    x = np.pad(audio.astype(np.float64), (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - N_FFT) // HOP_LENGTH
    strides = (x.strides[0] * HOP_LENGTH, x.strides[0])
    frames = np.lib.stride_tricks.as_strided(
        x, shape=(n_frames, N_FFT), strides=strides)
    spec = np.fft.rfft(frames * window[None, :], axis=1)
    return (spec.real ** 2 + spec.imag ** 2).T


def log_mel_spectrogram(audio: np.ndarray, n_mels: int = N_MELS,
                        padding: int = 0) -> np.ndarray:
    """audio [T] float32 in [-1, 1] -> [n_mels, T//160] float32.

    ref whisper_utils.py:99-146: log10(clamp(mel @ |stft|^2, 1e-10)), floor
    at global max - 8, then (x+4)/4.
    """
    audio = np.asarray(audio, dtype=np.float32)
    if padding > 0:
        audio = np.pad(audio, (0, padding))
    power = _stft_power(audio)[:, :-1]
    mel = mel_filters(n_mels) @ power.astype(np.float32)
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)
