"""DNSMOS P.835 + P.808 bridge (optional; requires onnxruntime + models).

Counterpart of /root/reference/models/utils/dnsmos.py:107-251. Two ONNX
models per variant: ``sig_bak_ovr.onnx`` (raw SIG/BAK/OVR, polyfit-calibrated)
and ``model_v8.onnx`` (P.808 MOS from a log-mel spectrogram). The models come
from microsoft/DNS-Challenge; this environment has no network egress, so they
must be placed under ``~/.cache/nbss_tpu/dnsmos`` (or $DNSMOS_DIR):

    DNSMOS/sig_bak_ovr.onnx   DNSMOS/model_v8.onnx
    pDNSMOS/sig_bak_ovr.onnx  (personalized variant)

Raises ImportError/FileNotFoundError otherwise — callers degrade the metric
to None. Returns the reference's 4-tuple {p808, sig, bak, ovr} averaged over
9.01 s hops and sources (dnsmos.py:221-251).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import numpy as np

SAMPLING_RATE = 16000
INPUT_LENGTH = 9.01


def _model_dir() -> str:
    return os.environ.get(
        "DNSMOS_DIR", os.path.expanduser("~/.cache/nbss_tpu/dnsmos"))


_DNS_CHALLENGE_RAW = ("https://raw.githubusercontent.com/microsoft/"
                      "DNS-Challenge/master/DNSMOS")


def _maybe_download(path: str, sub: str, model: str) -> bool:
    """First-use model download, reference parity (dnsmos.py:41-69). The
    reference fetches the three ONNX files from microsoft/DNS-Challenge; we
    do the same via urllib unless NBSS_NO_DOWNLOAD=1 or the fetch fails
    (e.g. an egress-less environment), in which case the caller raises a
    FileNotFoundError and metric code degrades the value to None."""
    if os.environ.get("NBSS_NO_DOWNLOAD"):
        return False
    url = f"{_DNS_CHALLENGE_RAW}/{sub}/{model}"
    if sub == "pDNSMOS" and model == "model_v8.onnx":
        return False  # not published for the personalized variant
    if url in _failed_downloads:  # negative cache: lru_cache only memoizes
        return False              # successful _session calls, and a hanging
    try:                          # egress would otherwise stall every metric
        import urllib.request

        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".part"
        with urllib.request.urlopen(url, timeout=30) as r, open(tmp, "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
        os.replace(tmp, path)
        return True
    except Exception:
        _failed_downloads.add(url)
        return False


_failed_downloads: set = set()


@functools.lru_cache(maxsize=8)
def _session(personalized: bool, model: str = "sig_bak_ovr.onnx"):
    import onnxruntime as ort  # optional dependency

    sub = "pDNSMOS" if personalized else "DNSMOS"
    path = os.path.join(_model_dir(), sub, model)
    if not os.path.exists(path) and model == "model_v8.onnx":
        # the p808 model is shared between variants in the DNS release
        path = os.path.join(_model_dir(), "DNSMOS", model)
        sub = "DNSMOS"
    if not os.path.exists(path):
        _maybe_download(path, sub, model)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"DNSMOS model not found at {path} and auto-download failed; "
            f"fetch {model} from github.com/microsoft/DNS-Challenge and "
            "place it there.")
    return ort.InferenceSession(path, providers=["CPUExecutionProvider"])


def _melspec(audio: np.ndarray, n_mels: int = 120, frame_size: int = 320,
             hop: int = 160, fs: int = SAMPLING_RATE) -> np.ndarray:
    """log-power mel spectrogram matching the reference's librosa call
    (dnsmos.py:107-137: n_fft=frame_size+1, hop 160, slaney mel, power_to_db
    ref=max, then (dB + 40) / 40). audio [T] -> [T', n_mels] float32."""
    n_fft = frame_size + 1
    # librosa center=True: reflect-pad by n_fft // 2
    pad = n_fft // 2
    x = np.pad(audio.astype(np.float64), (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = x[idx] * np.hanning(n_fft + 1)[:-1]  # periodic hann, librosa-style
    spec = np.abs(np.fft.rfft(frames, n=n_fft, axis=-1)) ** 2  # [T', F]
    mel = spec @ _mel_filterbank(n_mels, n_fft, fs).T  # [T', n_mels]
    db = 10.0 * np.log10(np.maximum(mel, 1e-10))
    db = np.maximum(db, db.max() - 80.0) - 10.0 * np.log10(max(mel.max(), 1e-10))
    return ((db + 40.0) / 40.0).astype(np.float32)


def _mel_filterbank(n_mels: int, nfft: int, fs: int) -> np.ndarray:
    """Slaney-style mel filterbank (librosa default): triangular filters on
    the mel scale with 'slaney' area normalization. [n_mels, nfft//2+1]."""
    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        m = f / (200.0 / 3.0)
        log_region = f >= 1000.0
        m = np.where(log_region,
                     15.0 + np.log(np.maximum(f, 1e-9) / 1000.0) / np.log(6.4) * 27.0,
                     m)
        return m

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f = m * (200.0 / 3.0)
        return np.where(m >= 15.0, 1000.0 * np.exp(np.log(6.4) / 27.0 * (m - 15.0)), f)

    n_freqs = nfft // 2 + 1
    freqs = np.linspace(0, fs / 2, n_freqs)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(fs / 2.0), n_mels + 2))
    fb = np.zeros((n_mels, n_freqs))
    for i in range(n_mels):
        lo, ce, hi = mel_pts[i], mel_pts[i + 1], mel_pts[i + 2]
        up = (freqs - lo) / max(ce - lo, 1e-9)
        down = (hi - freqs) / max(hi - ce, 1e-9)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
        fb[i] *= 2.0 / (hi - lo)  # slaney normalization
    return fb


def _polyfit_val(sig, bak, ovr, personalized: bool):
    if personalized:
        p_ovr = np.poly1d([-0.00533021, 0.005101, 1.18058466, -0.11236046])
        p_sig = np.poly1d([-0.01019296, 0.02751166, 1.19576786, -0.24348726])
        p_bak = np.poly1d([-0.04976499, 0.44276479, -0.1644611, 0.96883132])
    else:
        p_ovr = np.poly1d([-0.06766283, 1.11546468, 0.04602535])
        p_sig = np.poly1d([-0.08397278, 1.22083953, 0.0052439])
        p_bak = np.poly1d([-0.13166888, 1.60915514, -0.39604546])
    return p_sig(sig), p_bak(bak), p_ovr(ovr)


def dnsmos(preds: np.ndarray, fs: int,
           personalized: bool = False) -> Dict[str, Optional[float]]:
    """{p808, sig, bak, ovr} MOS means across sources and 9.01 s hops
    (reference dnsmos.py:221-251). preds: [spk, T] or [T]. p808 is None when
    model_v8.onnx is absent (the other three still compute)."""
    from scipy.signal import resample_poly

    sess = _session(personalized)
    try:
        p808_sess = _session(personalized, "model_v8.onnx")
    except (FileNotFoundError, ImportError):
        p808_sess = None

    sums = {"p808": [], "sig": [], "bak": [], "ovr": []}
    for wav in np.atleast_2d(preds):
        if fs != SAMPLING_RATE:
            g = np.gcd(fs, SAMPLING_RATE)
            wav = resample_poly(wav, SAMPLING_RATE // g, fs // g)
        wav = wav / max(np.max(np.abs(wav)), 1e-9)  # dnsmos.py:219 normalize
        seg_len = int(INPUT_LENGTH * SAMPLING_RATE)
        while len(wav) < seg_len:
            wav = np.concatenate([wav, wav])
        num_hops = int(np.floor(len(wav) / SAMPLING_RATE) - INPUT_LENGTH) + 1
        for h in range(max(num_hops, 1)):
            seg = wav[h * SAMPLING_RATE: h * SAMPLING_RATE + seg_len]
            if len(seg) < seg_len:
                continue
            seg = seg.astype(np.float32)
            raw = sess.run(None, {"input_1": seg[None, :]})[0][0]
            sig, bak, ovr = _polyfit_val(float(raw[0]), float(raw[1]),
                                         float(raw[2]), personalized)
            sums["sig"].append(sig)
            sums["bak"].append(bak)
            sums["ovr"].append(ovr)
            if p808_sess is not None:
                feats = _melspec(seg[:-160])[None].astype(np.float32)
                sums["p808"].append(float(
                    p808_sess.run(None, {"input_1": feats})[0][0][0]))
    return {k: (float(np.mean(v)) if v else None) for k, v in sums.items()}
