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
    # NB_PESQ degrades to None without the pesq C library
    assert m["NB_PESQ"] is None or m["NB_PESQ"] > 1.0


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
