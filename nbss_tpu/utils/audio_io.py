"""Audio file IO with graceful fallback.

Prefers soundfile (libsndfile) when present; otherwise falls back to
scipy.io.wavfile, which covers the PCM/float WAV files used by the corpora
here. Always returns float32 in [-1, 1] and shape [T] or [T, C].
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

try:
    import soundfile as _sf
except ImportError:  # pragma: no cover - depends on environment
    _sf = None

from scipy.io import wavfile as _wavfile


def read_audio(path: str, always_2d: bool = False) -> Tuple[np.ndarray, int]:
    if _sf is not None:
        data, sr = _sf.read(path, dtype="float32", always_2d=always_2d)
        return data, sr
    sr, data = _wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if always_2d and data.ndim == 1:
        data = data[:, None]
    return data, sr


def write_audio(path: str, data: np.ndarray, sr: int) -> None:
    data = np.asarray(data)
    if data.ndim == 2 and data.shape[0] < data.shape[1]:
        data = data.T  # [C, T] -> [T, C]
    if _sf is not None:
        _sf.write(path, data, sr)
        return
    _wavfile.write(path, sr, data.astype(np.float32))
