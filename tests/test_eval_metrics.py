"""STOI/eSTOI sanity + cal_metrics plumbing."""

import numpy as np
import pytest

from nbss_tpu.eval.metrics import cal_metrics
from nbss_tpu.eval.stoi import stoi


def _speech_like(rng, n, fs):
    t = np.arange(n) / fs
    x = rng.standard_normal(n)
    from scipy.signal import lfilter

    x = lfilter([0.1], [1, -0.9], x)
    env = 0.5 * (1 + np.sin(2 * np.pi * 4 * t))
    return (x * env).astype(np.float32)


@pytest.mark.parametrize("extended", [False, True])
def test_stoi_orders_by_noise(rng, extended):
    fs = 8000
    clean = _speech_like(rng, fs * 3, fs)
    noise = rng.standard_normal(fs * 3).astype(np.float32)
    p = np.std(clean)
    clean_score = stoi(clean, clean, fs, extended=extended)
    light = stoi(clean, clean + 0.1 * p * noise, fs, extended=extended)
    heavy = stoi(clean, clean + 2.0 * p * noise, fs, extended=extended)
    assert clean_score > 0.95, clean_score
    assert clean_score >= light > heavy, (clean_score, light, heavy)
    assert heavy < 0.9


def test_cal_metrics_improvement(rng):
    fs = 8000
    t = np.stack([_speech_like(rng, fs, fs) for _ in range(2)])
    mix = t.sum(0, keepdims=True).repeat(2, 0)
    preds = t + 0.05 * rng.standard_normal(t.shape).astype(np.float32)
    m, im, imp = cal_metrics(["SI_SDR", "SDR", "STOI", "eSTOI", "NB_PESQ"],
                             preds, t, mix, fs)
    assert m["SI_SDR"] > 5 and im["input_SI_SDR"] < 5
    assert imp["SI_SDR_i"] > 3
    assert m["STOI"] is not None and 0 < m["STOI"] <= 1
    assert m["eSTOI"] is not None
    # without the pesq C library the native estimator reports under
    # NB_PESQ_est (never the P.862 name, eval/metrics.py); with the C
    # library it reports under NB_PESQ
    key = "NB_PESQ" if "NB_PESQ" in m else "NB_PESQ_est"
    assert m[key] is None or m[key] > 1.0


def test_cal_metrics_chunked(rng):
    fs = 8000
    t = rng.standard_normal((2, fs * 2)).astype(np.float32)
    p = t + 0.1 * rng.standard_normal((2, fs * 2)).astype(np.float32)
    m, _, _ = cal_metrics(["SI_SDR"], p, t, t, fs, device_only="device", chunk=(1.0, 1.0))
    chunk_keys = [k for k in m if "s-" in k]
    assert len(chunk_keys) == 2, m.keys()


def test_dnsmos_melspec_shape_and_scale():
    """librosa-recipe log-mel features for the p808 model: [T', 120] in the
    (power_to_db(ref=max) + 40) / 40 scale -> values <= 1, >= -1."""
    import numpy as np
    from nbss_tpu.eval.dnsmos import _melspec

    rng = np.random.default_rng(0)
    seg = rng.standard_normal(int(9.01 * 16000) - 160).astype(np.float32)
    feats = _melspec(seg)
    assert feats.shape[1] == 120
    # librosa center framing with odd n_fft=321: 1 + (T + 320 - 321) // 160
    # = 900 for the 9.01 s - 160 sample p808 segment (the model's input size)
    assert feats.shape[0] == 900
    assert feats.max() <= 1.0 + 1e-6 and feats.min() >= -1.0 - 1e-6
    assert np.isfinite(feats).all()


def test_dnsmos_download_gate(tmp_path, monkeypatch):
    """Auto-download (reference dnsmos.py:41-69 parity) is gated: the
    NBSS_NO_DOWNLOAD switch short-circuits, the personalized p808 model is
    never fetched, and egress failures degrade to False (caller then raises
    FileNotFoundError -> metric None) rather than crashing."""
    from nbss_tpu.eval.dnsmos import _maybe_download

    monkeypatch.setenv("NBSS_NO_DOWNLOAD", "1")
    assert _maybe_download(str(tmp_path / "m.onnx"), "DNSMOS", "model_v8.onnx") is False
    monkeypatch.delenv("NBSS_NO_DOWNLOAD")
    assert _maybe_download(str(tmp_path / "m.onnx"), "pDNSMOS", "model_v8.onnx") is False
    # zero-egress image: the urllib fetch fails and must return False quickly
    import urllib.request

    def boom(*a, **k):
        raise OSError("no egress")

    monkeypatch.setattr(urllib.request, "urlopen", boom)
    assert _maybe_download(str(tmp_path / "m.onnx"), "DNSMOS", "sig_bak_ovr.onnx") is False
    assert not (tmp_path / "m.onnx").exists()


def test_metric_dict_expansion():
    """Multi-valued metrics (DNSMOS-style dicts) expand into per-sub keys."""
    from unittest import mock

    import numpy as np
    from nbss_tpu.eval import metrics as M

    fake = {"p808": 3.0, "sig": 2.0, "bak": 4.0, "ovr": None}
    with mock.patch.object(M, "_one_metric", side_effect=[dict(fake), dict(fake)]):
        out, inp, imp = M.cal_metrics(["DNSMOS"], np.zeros((1, 100)),
                                      np.zeros((1, 100)), np.zeros((1, 100)), 8000)
    assert out["DNSMOS_p808"] == 3.0 and inp["input_DNSMOS_sig"] == 2.0
    assert imp["DNSMOS_bak_i"] == 0.0 and out["DNSMOS_ovr"] is None


# ---------------------------------------------------------------------------
# Native NB-PESQ fallback (eval/pesq_native.py)
# ---------------------------------------------------------------------------

def _speechlike(rng, fs=8000, secs=4.0):
    t = np.arange(int(fs * secs)) / fs
    x = rng.standard_normal(len(t)) * np.sin(2 * np.pi * 3 * t) ** 2
    X = np.fft.rfft(x)
    f = np.fft.rfftfreq(len(x), 1 / fs)
    X *= np.exp(-((f - 500) / 800) ** 2) + 0.3 * np.exp(-((f - 1500) / 500) ** 2)
    x = np.fft.irfft(X, len(x))
    return x / np.abs(x).max()


def test_pesq_native_invariants(rng):
    """Ceiling at the true MOS-LQO maximum (~4.55), monotone degradation
    with additive-noise SNR, invariance to scale and constant delay."""
    from nbss_tpu.eval.pesq_native import nb_pesq

    fs = 8000
    x = _speechlike(rng)
    clean = nb_pesq(fs, x, x)
    assert 4.5 < clean < 4.6, clean  # P.862.1 mapping ceiling

    last = clean
    for snr in [30, 20, 10, 0]:
        n = rng.standard_normal(len(x))
        n *= np.sqrt((x ** 2).mean() / (n ** 2).mean()) * 10 ** (-snr / 20)
        v = nb_pesq(fs, x, x + n)
        assert v < last - 0.2, (snr, v, last)  # strictly degrading
        last = v
    assert last < 2.6, last  # 0 dB SNR lands in the low-quality range

    # pure noise (zero speech content) lands in the "bad" MOS range
    n = rng.standard_normal(len(x))
    n *= np.sqrt((x ** 2).mean() / (n ** 2).mean())
    assert nb_pesq(fs, x, n) < 2.0

    # level alignment + cross-correlation guard
    assert abs(nb_pesq(fs, x, 0.25 * x) - clean) < 0.02
    assert abs(nb_pesq(fs, x, np.roll(x, 100)) - clean) < 0.05


def test_pesq_native_in_metric_dispatch(rng, monkeypatch):
    """cal_metrics NB_PESQ uses the native fallback when the C wheel is
    absent (this image), and degrades to None when NBSS_PESQ_NATIVE=0."""
    from nbss_tpu.eval.metrics import cal_metrics

    fs = 8000
    t = np.stack([_speechlike(rng), _speechlike(rng)]).astype(np.float32)
    p = t + 0.05 * rng.standard_normal(t.shape).astype(np.float32)
    m, im, imp = cal_metrics(["NB_PESQ"], p, t, t + 0.3 * rng.standard_normal(
        t.shape).astype(np.float32), fs)
    # the estimate must NOT be published under the P.862 key
    assert "NB_PESQ" not in m and m["NB_PESQ_est"] is not None
    assert 1.0 < m["NB_PESQ_est"] <= 4.6
    assert imp["NB_PESQ_est_i"] == pytest.approx(
        m["NB_PESQ_est"] - im["input_NB_PESQ_est"], abs=1e-6)

    monkeypatch.setenv("NBSS_PESQ_NATIVE", "0")
    m2, _, _ = cal_metrics(["NB_PESQ"], p, t, t, fs)
    assert m2["NB_PESQ"] is None


def test_wb_pesq_native_invariants(rng):
    """WB estimator battery (VERDICT round-4 item 9): P.862.2 mapping
    ceiling (~4.64), monotone SNR degradation, gain/delay invariance, and
    an 8 kHz rejection."""
    from nbss_tpu.eval.pesq_native import wb_pesq

    fs = 16000
    x = _speechlike(rng, fs=fs)
    clean = wb_pesq(fs, x, x)
    assert 4.6 < clean < 4.7, clean  # P.862.2 mapping ceiling

    last = clean
    for snr in [30, 20, 10, 0]:
        n = rng.standard_normal(len(x))
        n *= np.sqrt((x ** 2).mean() / (n ** 2).mean()) * 10 ** (-snr / 20)
        v = wb_pesq(fs, x, x + n)
        assert v < last - 0.2, (snr, v, last)
        last = v
    assert last < 2.6, last

    assert abs(wb_pesq(fs, x, 0.25 * x) - clean) < 0.02
    assert abs(wb_pesq(fs, x, np.roll(x, 160)) - clean) < 0.05

    with pytest.raises(ValueError):
        wb_pesq(8000, x, x)


def test_wb_pesq_in_metric_dispatch(rng, monkeypatch):
    """WB_PESQ at 16 kHz uses the native fallback under the WB_PESQ_est
    key; at 8 kHz it stays None (undefined, reference metrics.py:103-105);
    NBSS_PESQ_NATIVE=0 forces strict None."""
    from nbss_tpu.eval.metrics import cal_metrics

    fs = 16000
    t = np.stack([_speechlike(rng, fs=fs), _speechlike(rng, fs=fs)]).astype(np.float32)
    p = t + 0.05 * rng.standard_normal(t.shape).astype(np.float32)
    m, im, imp = cal_metrics(["WB_PESQ"], p, t, t + 0.3 * rng.standard_normal(
        t.shape).astype(np.float32), fs)
    assert "WB_PESQ" not in m and m["WB_PESQ_est"] is not None
    assert 1.0 < m["WB_PESQ_est"] <= 4.7
    assert imp["WB_PESQ_est_i"] == pytest.approx(
        m["WB_PESQ_est"] - im["input_WB_PESQ_est"], abs=1e-6)

    # 8 kHz: undefined either way
    m8, _, _ = cal_metrics(["WB_PESQ"], p, t, t, 8000)
    assert m8["WB_PESQ"] is None

    monkeypatch.setenv("NBSS_PESQ_NATIVE", "0")
    m2, _, _ = cal_metrics(["WB_PESQ"], p, t, t, fs)
    assert m2["WB_PESQ"] is None


def test_dnsmos_end_to_end_when_available(rng):
    """Gated integration test: runs the REAL DNSMOS inference end-to-end
    wherever onnxruntime + the ONNX models exist (they cannot exist in this
    egress-less image — see README; this documents the expected behavior
    for deployments that provide them)."""
    import os

    pytest.importorskip("onnxruntime")
    from nbss_tpu.eval import dnsmos as D

    path = os.path.join(D._model_dir(), "DNSMOS", "sig_bak_ovr.onnx")
    if not os.path.exists(path):
        pytest.skip("DNSMOS ONNX models not provisioned")
    x = _speechlike(rng, fs=16000, secs=10.0)[None].astype(np.float32)
    out = D.dnsmos(x, 16000, personalized=False)
    assert set(out) == {"p808", "sig", "bak", "ovr"}
    assert all(v is None or 1.0 <= v <= 5.0 for v in out.values())
