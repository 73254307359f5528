"""Mixing algebra / diffuse noise / RTS window / geometry tests (several
checked directly against the reference implementations, which are pure
numpy and importable on CPU)."""

import os
import sys

import numpy as np
import pytest

from nbss_tpu.data import geometry, mixing as mx
from nbss_tpu.data.diffuse import gen_diffuse_noise, spatial_coherence_mixing_matrices
from nbss_tpu.data.windows import rts_window

HAS_REF = os.path.isdir("/root/reference")


def test_overlap_type_sampling(rng):
    assert mx.sample_overlap_type("full", 2, rng) == "full"
    assert mx.sample_overlap_type("mid", 1, rng) == "full"
    for _ in range(20):
        t = mx.sample_overlap_type("fhms", 2, rng)
        assert t in ("full", "headtail", "mid", "start", "end")


def test_overlap_lengths_with_target(rng):
    ratio, lens, mf = mx.sample_overlap_ratio_and_lengths(
        "full", (0.1, 1.0), 4000, [5000, 3000], rng)
    assert mf == 4000 and lens == [4000, 4000] and ratio == 1.0

    ratio, lens, mf = mx.sample_overlap_ratio_and_lengths(
        "headtail", (0.2, 0.6), 4000, [5000, 3000], rng)
    assert mf == 4000 and lens[0] == lens[1] == int(4000 * (0.5 + ratio / 2))
    # heads+tails span the mixture with ratio*mix overlap (up to int rounding)
    assert abs(lens[0] + lens[1] - (4000 + ratio * 4000)) <= 4

    ratio, lens, mf = mx.sample_overlap_ratio_and_lengths(
        "mid", (0.1, 0.9), 4000, [5000, 3000], rng)
    assert mf == 4000 and max(lens) == 4000 and min(lens) == int(4000 * ratio)


def test_overlap_lengths_without_target(rng):
    ratio, lens, mf = mx.sample_overlap_ratio_and_lengths(
        "mid", (0.1, 1.0), None, [5000, 3000], rng)
    assert mf == 5000 and ratio == 3000 / 5000 and lens == [5000, 3000]


def test_repeat_crop(rng):
    wavs = [np.arange(5, dtype=np.float32), np.arange(10, dtype=np.float32)]
    out = mx.repeat_crop(wavs, [12, 4], rng)
    assert out[0].shape == (12,) and out[1].shape == (4,)
    np.testing.assert_array_equal(out[0][:5], out[0][5:10])


def test_spatialize_align(rng):
    wav = rng.standard_normal(1000).astype(np.float32)
    rir = np.zeros((2, 100), np.float32)
    rir[:, 30] = 1.0  # pure delay of 30
    rvbt, target = mx.spatialize(wav, rir, rir, ref_channel=0, align=True)
    assert rvbt.shape == (2, 1000)
    np.testing.assert_allclose(rvbt[0], wav, atol=1e-5)  # delay removed


def test_place_overlap_2spk_headtail(rng):
    a = np.ones((2, 60), np.float32)
    b = np.ones((2, 60), np.float32)
    rv, tg = mx.place_overlap_2spk([a, b], [a, b], "headtail", 100, rng)
    assert rv.shape == (2, 2, 100)
    assert rv[0, 0, 0] == 1 and rv[0, 0, 60:].sum() == 0
    assert rv[1, 0, -1] == 1 and rv[1, 0, :40].sum() == 0


def test_energy_ratio_coeff(rng):
    w1 = rng.standard_normal((2, 1000)).astype(np.float32)
    w2 = rng.standard_normal((2, 1000)).astype(np.float32)
    c = mx.energy_ratio_coeff(w1, w2, 6.0)
    got = 10 * np.log10(np.mean(w1**2) / np.mean((c * w2) ** 2))
    np.testing.assert_allclose(got, 6.0, atol=1e-5)
    assert mx.energy_ratio_coeff(np.zeros(10), w2, 0.0) is None


def test_diffuse_noise_coherence(rng):
    """Generated noise must approach the theoretical sinc coherence
    (reference validates this by plotting, diffuse_noise.py:96-132)."""
    from scipy.signal import stft

    fs, nfft = 8000, 256
    pos = np.array([[0, 0, 1.5], [0, 0.1, 1.5], [0, 0.25, 1.5]])
    DSC, Cs = spatial_coherence_mixing_matrices(pos, fs, "spherical", nfft=nfft)
    L = fs * 16
    noise = rng.standard_normal(3 * L + 100)
    x = gen_diffuse_noise(noise, L, Cs, nfft=nfft, rng=rng)
    assert x.shape == (3, L)
    _, _, X = stft(x, window="hann", nperseg=nfft, noverlap=3 * nfft // 4, nfft=nfft)
    num = np.mean(X[0] * np.conj(X[1]), axis=-1)
    den = np.sqrt(np.mean(np.abs(X[0]) ** 2, -1) * np.mean(np.abs(X[1]) ** 2, -1))
    coh = np.real(num / den)
    theory = DSC[0, 1, :, 0] if DSC.ndim == 4 else DSC[0, 1]
    # skip DC and the highest bins; statistical estimate
    err = np.abs(coh[2:-2] - theory[2:-2])
    assert np.median(err) < 0.1, np.median(err)


def test_rts_window(rng):
    rir = rng.standard_normal((2, 3, 4000)).astype(np.float32) * 0.01
    rir[..., 500] = 1.0
    win = rts_window(rir, original_T60=0.8, target_T60=0.2, sr=8000)
    assert win.shape == rir.shape
    assert (win[..., :500] == 1).all()
    assert win[0, 0, 3999] < 1e-3
    # no shortening needed
    assert (rts_window(rir, 0.1, 0.2, 8000) == 1).all()


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
def test_rts_window_matches_reference(rng):
    sys.path.insert(0, "/root/reference")
    from data_loaders.utils.window import reverberation_time_shortening_window
    sys.path.pop(0)
    rir = rng.standard_normal((2, 3, 2000)).astype(np.float32)
    rir[..., 300] = 5.0
    expect = reverberation_time_shortening_window(rir, 0.6, 0.15, sr=8000)
    got = rts_window(rir, 0.6, 0.15, sr=8000)
    np.testing.assert_allclose(got, expect, rtol=1e-6)


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
def test_overlap_algebra_matches_reference():
    sys.path.insert(0, "/root/reference")
    from data_loaders.utils import mix as ref_mix
    sys.path.pop(0)
    for seed in range(10):
        r1, r2 = np.random.default_rng(seed), np.random.default_rng(seed)
        t1 = ref_mix.sample_an_overlap(rng=r1, ovlp_type="fhms", num_spk=2)
        t2 = mx.sample_overlap_type("fhms", 2, r2)
        assert t1 == t2
        o1 = ref_mix.sample_ovlp_ratio_and_cal_length(
            rng=r1, ovlp_type=t1, ratio_range=(0.1, 1.0), target_len=32000,
            lens=[40000, 20000])
        o2 = mx.sample_overlap_ratio_and_lengths(t2, (0.1, 1.0), 32000,
                                                 [40000, 20000], r2)
        assert o1[0] == o2[0] and list(o1[1]) == list(o2[1]) and o1[2] == o2[2]


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
def test_trajectory_windowed_matches_reference(rng):
    sys.path.insert(0, "/root/reference")
    from data_loaders.utils.mix import convolve_traj_with_win
    sys.path.pop(0)
    wav = rng.standard_normal(2000).astype(np.float32)
    rirs = rng.standard_normal((11, 2, 64)).astype(np.float32)
    ref = convolve_traj_with_win(wav, rirs, samples_per_rir=200, wintype="trapezium20")
    got = mx.convolve_trajectory_windowed(wav, rirs, 200, "trapezium20")
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_geometries():
    c = geometry.circular_array(0.05, 8)
    assert c.shape == (8, 3)
    np.testing.assert_allclose(np.linalg.norm(c, axis=1), 0.05, rtol=1e-6)
    l = geometry.linear_array(0.04, 4)
    np.testing.assert_allclose(l[:, 0], [-0.06, -0.02, 0.02, 0.06])
    ch = geometry.chime3_array()
    np.testing.assert_allclose(np.linalg.norm(ch[0] - ch[1]), 0.1)
    lib = geometry.libricss_array()
    assert lib.shape == (7, 3) and (lib[0] == 0).all()
