"""DNSMOS P.835 bridge (optional; requires onnxruntime + model files).

Counterpart of /root/reference/models/utils/dnsmos.py:166-251. The ONNX
models come from microsoft/DNS-Challenge; this environment has no network
egress, so models must be placed under ``~/.cache/nbss_tpu/dnsmos`` (or the
path in $DNSMOS_DIR): sig_bak_ovr.onnx and model_v8.onnx (and their p835
personalized variants). Raises ImportError/FileNotFoundError with that
message otherwise — callers degrade the metric to None.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import numpy as np

SAMPLING_RATE = 16000
INPUT_LENGTH = 9.01


def _model_dir() -> str:
    return os.environ.get(
        "DNSMOS_DIR", os.path.expanduser("~/.cache/nbss_tpu/dnsmos"))


@functools.lru_cache(maxsize=4)
def _session(personalized: bool):
    import onnxruntime as ort  # optional dependency

    sub = "pDNSMOS" if personalized else "DNSMOS"
    path = os.path.join(_model_dir(), sub, "sig_bak_ovr.onnx")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"DNSMOS model not found at {path}; download sig_bak_ovr.onnx from "
            "github.com/microsoft/DNS-Challenge and place it there (no egress here).")
    return ort.InferenceSession(path, providers=["CPUExecutionProvider"])


def _melspec(audio: np.ndarray, n_mels: int = 120) -> np.ndarray:
    """log-power mel spectrogram (librosa-compatible enough for DNSMOS)."""
    from scipy.signal import stft

    nfft = 321 * 2 - 2  # frame size 320, hop 160 per DNSMOS recipe
    _, _, S = stft(audio, fs=SAMPLING_RATE, nperseg=320, noverlap=160, nfft=640)
    power = np.abs(S) ** 2
    mel_fb = _mel_filterbank(n_mels, 640, SAMPLING_RATE)
    mel = mel_fb @ power
    return (np.log10(np.maximum(mel, 1e-10)) + 0.5).T.astype(np.float32)


def _mel_filterbank(n_mels: int, nfft: int, fs: int) -> np.ndarray:
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    n_freqs = nfft // 2 + 1
    mels = np.linspace(hz_to_mel(0), hz_to_mel(fs / 2), n_mels + 2)
    hz = mel_to_hz(mels)
    bins = np.floor((nfft + 1) * hz / fs).astype(int)
    fb = np.zeros((n_mels, n_freqs))
    for i in range(n_mels):
        lo, ce, hi = bins[i], bins[i + 1], bins[i + 2]
        if ce > lo:
            fb[i, lo:ce] = (np.arange(lo, ce) - lo) / (ce - lo)
        if hi > ce:
            fb[i, ce:hi] = (hi - np.arange(ce, hi)) / (hi - ce)
    return fb


def _poly_fit(sig, bak, ovr, personalized: bool):
    if personalized:
        p_ovr = np.poly1d([-0.00533021, 0.005101, 1.18058466, -0.11236046])
        p_sig = np.poly1d([-0.01019296, 0.02751166, 1.19576786, -0.24348726])
        p_bak = np.poly1d([-0.04976499, 0.44276479, -0.1644611, 0.96883132])
    else:
        p_ovr = np.poly1d([-0.06766283, 1.11546468, 0.04602535])
        p_sig = np.poly1d([-0.08397278, 1.22083953, 0.0052439])
        p_bak = np.poly1d([-0.13166888, 1.60915514, -0.39604546])
    return p_sig(sig), p_bak(bak), p_ovr(ovr)


def dnsmos(preds: np.ndarray, fs: int, personalized: bool = False) -> Optional[float]:
    """Mean OVRL MOS across sources. preds: [spk, T]."""
    from scipy.signal import resample_poly

    sess = _session(personalized)
    scores = []
    for wav in np.atleast_2d(preds):
        if fs != SAMPLING_RATE:
            g = np.gcd(fs, SAMPLING_RATE)
            wav = resample_poly(wav, SAMPLING_RATE // g, fs // g)
        seg_len = int(INPUT_LENGTH * SAMPLING_RATE)
        if len(wav) < seg_len:
            wav = np.tile(wav, -(-seg_len // len(wav)))[:seg_len]
        hops = range(0, max(len(wav) - seg_len + 1, 1), SAMPLING_RATE)
        seg_scores = []
        for s in hops:
            seg = wav[s:s + seg_len].astype(np.float32)
            out = sess.run(None, {"input_1": seg[None, :]})
            sig, bak, ovr = float(out[0][0][0]), float(out[0][0][1]), float(out[0][0][2])
            _, _, ovr_c = _poly_fit(sig, bak, ovr, personalized)
            seg_scores.append(ovr_c)
        scores.append(np.mean(seg_scores))
    return float(np.mean(scores))
