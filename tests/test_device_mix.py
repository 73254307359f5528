"""Tests for the on-device mixture synthesis pipeline (data/device_mix.py).

Covers: determinism keyed by (index, seed), SNR/SIR correctness by
construction, overlap mask semantics, speech synthesis sanity, spatial
coherence of the diffuse noise, and the DataModule/loader integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nbss_tpu.data.device_mix import (
    DeviceSyntheticDataModule, fft_convolve, mix_batch, synth_speech,
    _sample_overlap, _diffuse_noise)
from nbss_tpu.io.stft import STFT


def test_fft_convolve_matches_numpy(rng):
    x = rng.standard_normal((3, 100)).astype(np.float32)
    h = rng.standard_normal((3, 17)).astype(np.float32)
    out = np.asarray(fft_convolve(jnp.asarray(x), jnp.asarray(h), nfft=128))
    for i in range(3):
        ref = np.convolve(x[i], h[i])
        np.testing.assert_allclose(out[i, :116], ref, atol=1e-3)


def test_synth_speech_properties():
    y = np.asarray(synth_speech(jax.random.PRNGKey(0), 16000, 8000))
    assert y.shape == (16000,)
    assert np.abs(y).max() > 0  # never fully silent
    y2 = np.asarray(synth_speech(jax.random.PRNGKey(0), 16000, 8000))
    np.testing.assert_array_equal(y, y2)  # deterministic per key
    y3 = np.asarray(synth_speech(jax.random.PRNGKey(1), 16000, 8000))
    assert np.abs(y - y3).max() > 0


def test_sample_overlap_bounds():
    T = 32000
    for t in ("mid", "full", "headtail", "hms", "fhms"):
        from nbss_tpu.data.device_mix import OVLP_SET

        for i in range(5):
            lens, shifts = jax.jit(
                lambda k: _sample_overlap(k, OVLP_SET[t], (0.1, 1.0), T)
            )(jax.random.PRNGKey(i))
            lens, shifts = np.asarray(lens), np.asarray(shifts)
            assert (lens >= 1).all() and (lens <= T).all(), (t, lens)
            assert (shifts >= 0).all(), (t, shifts)
            assert (shifts + lens <= T).all(), (t, lens, shifts)


def test_diffuse_noise_spatial_coherence(rng):
    """Generated noise must exhibit the sinc spatial coherence (the check the
    reference does by plotting, diffuse_noise.py:96-132)."""
    from nbss_tpu.data.diffuse import spatial_coherence_mixing_matrices

    pos = np.stack([np.zeros(4), np.arange(4) * 0.05, np.zeros(4)], axis=-1)
    DSC, Cs = spatial_coherence_mixing_matrices(pos, fs=8000, nfft=256)
    st = STFT(n_fft=256, n_hop=64)
    n = _diffuse_noise(jax.random.PRNGKey(3), 4, 8000 * 30,
                       jnp.asarray(Cs.real, jnp.float32),
                       jnp.asarray(Cs.imag, jnp.float32), st)
    n = np.asarray(n)
    # measure coherence between mics 0,1 at a mid frequency band
    from scipy.signal import csd

    f, P01 = csd(n[0], n[1], fs=8000, nperseg=256)
    _, P00 = csd(n[0], n[0], fs=8000, nperseg=256)
    _, P11 = csd(n[1], n[1], fs=8000, nperseg=256)
    coh = np.real(P01 / np.sqrt(P00 * P11))
    d = 0.05
    expect = np.sinc(2 * f * d / 343.0)
    band = (f > 300) & (f < 3000)
    err = np.abs(coh[band] - expect[band]).mean()
    assert err < 0.25, err


def _toy_rirs(B, S, C, Lr, Ld, rng):
    rir = np.zeros((B, S, C, Lr), np.float32)
    dp = np.zeros((B, S, C, Ld), np.float32)
    for b in range(B):
        for s in range(S):
            d0 = rng.integers(10, 40)
            for c in range(C):
                rir[b, s, c, d0 + c] = 1.0
                rir[b, s, c, d0 + c + 50:Lr:97] = 0.2  # sparse tail
                dp[b, s, c, d0 + c] = 1.0
    return rir, dp


def test_mix_batch_shapes_and_determinism(rng):
    B, S, C, T = 2, 2, 4, 8000
    rir, dp = _toy_rirs(B, S, C, 512, 128, rng)
    from nbss_tpu.data.diffuse import spatial_coherence_mixing_matrices

    pos = np.stack([np.zeros(C), np.arange(C) * 0.04, np.zeros(C)], -1)
    _, Cs = spatial_coherence_mixing_matrices(pos, fs=8000, nfft=256)
    kw = dict(T=T, fs=8000, rir_len=512, dp_len=128, ovlp="mid",
              ratio_range=(0.1, 1.0), sir_range=(-5.0, 5.0),
              snr_range=(5.0, 20.0), noise_types=("white",))
    key = jax.random.PRNGKey(0)
    seeds = jnp.asarray([11, 22], jnp.int32)
    cs_re = jnp.asarray(Cs.real, jnp.float32)
    cs_im = jnp.asarray(Cs.imag, jnp.float32)
    x, ys = mix_batch(key, seeds, jnp.asarray(rir), jnp.asarray(dp),
                      cs_re, cs_im, **kw)
    assert x.shape == (B, C, T) and ys.shape == (B, S, C, T)
    x2, ys2 = mix_batch(key, seeds, jnp.asarray(rir), jnp.asarray(dp),
                        cs_re, cs_im, **kw)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))
    # same seed in different batch slots -> same item
    seeds3 = jnp.asarray([22, 11], jnp.int32)
    x3, _ = mix_batch(key, seeds3, jnp.asarray(rir[::-1]), jnp.asarray(dp[::-1]),
                      cs_re, cs_im, **kw)
    np.testing.assert_allclose(np.asarray(x3[1]), np.asarray(x[0]), atol=1e-6)
    # peak normalization to 0.9
    peak = max(np.abs(np.asarray(x)).max(), np.abs(np.asarray(ys)).max())
    np.testing.assert_allclose(peak, 0.9, atol=1e-3)


def test_mix_batch_full_overlap_snr(rng):
    """With ovlp=full and identity direct-path rirs, the mixture equals
    sum(targets) + noise at the sampled SNR."""
    B, S, C, T = 1, 2, 4, 8000
    rir = np.zeros((B, S, C, 256), np.float32)
    rir[..., 0] = 1.0  # identity
    dp = rir[..., :128].copy()
    from nbss_tpu.data.diffuse import spatial_coherence_mixing_matrices

    pos = np.stack([np.zeros(C), np.arange(C) * 0.04, np.zeros(C)], -1)
    _, Cs = spatial_coherence_mixing_matrices(pos, fs=8000, nfft=256)
    x, ys = mix_batch(
        jax.random.PRNGKey(1), jnp.asarray([7], jnp.int32),
        jnp.asarray(rir), jnp.asarray(dp),
        jnp.asarray(Cs.real, jnp.float32), jnp.asarray(Cs.imag, jnp.float32),
        T=T, fs=8000, rir_len=256, dp_len=128, ovlp="full",
        ratio_range=(1.0, 1.0), sir_range=(-2.0, 2.0),
        snr_range=(10.0, 10.0), noise_types=("white",))
    x, ys = np.asarray(x), np.asarray(ys)
    noise = x[0] - ys[0].sum(axis=0)
    snr = 10 * np.log10((ys[0].sum(0) ** 2).mean() / (noise ** 2).mean())
    assert abs(snr - 10.0) < 0.5, snr


def _make_tiny_corpus(tmp_path, n_train=2, n_val=1, n_test=1):
    from nbss_tpu.sim.config import RirConfigSampler
    from nbss_tpu.sim.generate import generate_rir_files

    sampler = RirConfigSampler(spk_num=2, noise_num=0, arr_geometry="circular",
                               mic_num=4, fs=8000, RT60_lim=(0.1, 0.2), seed=1)
    generate_rir_files(sampler, str(tmp_path), (n_train, n_val, n_test),
                       length_round=2048)


def test_device_synthetic_datamodule(tmp_path):
    _make_tiny_corpus(tmp_path)
    dm = DeviceSyntheticDataModule(
        rir_dir=str(tmp_path), num_spk=2, sample_rate=8000,
        audio_time_len=(1.0, 1.0, 1.0, 1.0), num_items=(4, 2, 2, 2),
        rir_len=2048, dp_len=1024, batch_size=(2, 1), noise_type=("white",))
    it = iter(dm.train_dataloader(epoch=0))
    x, ys, paras = next(it)
    assert x.shape == (2, 4, 8000) and ys.shape == (2, 2, 4, 8000)
    assert paras[0]["sample_rate"] == 8000 and "seed" in paras[0]
    # val loader is seed-fixed -> identical across constructions
    v1 = next(iter(dm.val_dataloader()))
    v2 = next(iter(dm.val_dataloader()))
    np.testing.assert_array_equal(np.asarray(v1[0]), np.asarray(v2[0]))
    # test loader yields numpy
    t1 = next(iter(dm.test_dataloader()))
    assert isinstance(t1[0], np.ndarray)


def test_mix_batch_babble_and_full(rng):
    """babble (speech-tilted diffuse) noise branch + ovlp=full lengths."""
    B, S, C, T = 1, 2, 4, 4000
    rir, dp = _toy_rirs(B, S, C, 256, 128, rng)
    from nbss_tpu.data.diffuse import spatial_coherence_mixing_matrices

    pos = np.stack([np.zeros(C), np.arange(C) * 0.04, np.zeros(C)], -1)
    _, Cs = spatial_coherence_mixing_matrices(pos, fs=8000, nfft=256)
    x, ys = mix_batch(
        jax.random.PRNGKey(2), jnp.asarray([5], jnp.int32),
        jnp.asarray(rir), jnp.asarray(dp),
        jnp.asarray(Cs.real, jnp.float32), jnp.asarray(Cs.imag, jnp.float32),
        T=T, fs=8000, rir_len=256, dp_len=128, ovlp="full",
        ratio_range=(0.1, 1.0), sir_range=None,
        snr_range=(0.0, 20.0), noise_types=("babble", "white"))
    assert np.isfinite(np.asarray(x)).all() and np.isfinite(np.asarray(ys)).all()
    # full overlap: both target streams active over (almost) the whole clip
    act = (np.abs(np.asarray(ys)[0, :, 0]) > 0).mean(axis=-1)
    assert (act > 0.3).all(), act


# ---------------------------------------------------------------------------
# Moving sources (trajectory RIR stacks)
# ---------------------------------------------------------------------------

def test_trajectory_windows_sum_to_one():
    from nbss_tpu.data.device_mix import trajectory_windows

    for T, P in [(4000, 5), (32000, 8), (1999, 3)]:
        W = trajectory_windows(T, P)
        assert W.shape == (P, T)
        np.testing.assert_allclose(W.sum(0), np.ones(T), atol=1e-6)


def test_trajectory_convolve_matches_host(rng):
    """Device trajectory spatialization == the host crossfaded trajectory
    convolution (mixing.convolve_trajectory_windowed) when P windows tile T
    exactly (T=4000, P=5 -> hop=1000; host window count == P)."""
    from nbss_tpu.data.device_mix import trajectory_convolve, trajectory_windows
    from nbss_tpu.data.mixing import convolve_trajectory_windowed

    T, P, C, L, S = 4000, 5, 2, 64, 2
    hop = -(-T // (P - 1))
    assert len(range(0, T + hop - 1, hop)) == P
    dry = rng.standard_normal((S, T)).astype(np.float32)
    rirs = rng.standard_normal((S, P, C, L)).astype(np.float32) * 0.3
    W = trajectory_windows(T, P)
    nfft = 1 << (T + L - 1).bit_length()
    dev = np.asarray(trajectory_convolve(
        jnp.asarray(dry), jnp.asarray(rirs), jnp.asarray(W), nfft))
    for s in range(S):
        host = convolve_trajectory_windowed(dry[s], rirs[s], hop)
        np.testing.assert_allclose(dev[s, :, :T + L - 1], host, atol=2e-3)


def test_mix_batch_trajectory_path(rng):
    """mix_batch with traj_win: deterministic in (key, seed), correct shapes,
    and the moving wet signal differs from any single static-RIR render."""
    from nbss_tpu.data.device_mix import trajectory_windows

    B, S, P, C, T, L, dpL = 2, 2, 4, 3, 4000, 256, 128
    fs = 8000
    rir = jnp.asarray(rng.standard_normal((B, S, P, C, L)), jnp.float32) * 0.2
    rir = rir.at[..., 0].set(1.0)  # strong direct peak at lag 0
    dp = jnp.asarray(np.zeros((B, S, P, C, dpL)), jnp.float32).at[..., 0].set(1.0)
    W = jnp.asarray(trajectory_windows(T, P))
    seeds = jnp.asarray([3, 7], jnp.int32)
    kw = dict(T=T, fs=fs, rir_len=L, dp_len=dpL, ovlp="full",
              snr_range=(30.0, 30.0), noise_types=("white",))
    key = jax.random.PRNGKey(0)
    x1, ys1 = mix_batch(key, seeds, rir, dp, *_cs_small(C), traj_win=W, **kw)
    x2, ys2 = mix_batch(key, seeds, rir, dp, *_cs_small(C), traj_win=W, **kw)
    assert x1.shape == (B, C, T) and ys1.shape == (B, S, C, T)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    assert np.all(np.isfinite(np.asarray(x1)))
    # static render with only point 0 should differ from the moving render
    x3, _ = mix_batch(key, seeds, rir[:, :, 0], dp[:, :, 0], *_cs_small(C), **kw)
    assert np.abs(np.asarray(x1) - np.asarray(x3)).max() > 1e-4


def _cs_small(C, F=129):
    eye = np.broadcast_to(np.eye(C, dtype=np.float32), (F, C, C))
    return jnp.asarray(eye), jnp.asarray(np.zeros((F, C, C), np.float32))


def test_trajectory_datamodule_end_to_end(tmp_path):
    """Render 2 tiny trajectory rooms with the ISM and run them through
    DeviceSyntheticDataModule(trajectory_points=3): shapes, finiteness,
    determinism across loader epochs."""
    from nbss_tpu.sim.config import RirConfigSampler
    from nbss_tpu.sim.generate import render_room

    fs = 8000
    s = RirConfigSampler(spk_num=2, noise_num=0, RT60_lim=(0.13, 0.16),
                         trajectory=("4points+sin", 0.5), fs=fs, seed=11)
    for idx, sub in [(0, "train"), (1, "validation")]:
        render_room(s.sample(idx), fs, str(tmp_path), sub, split_trajectory=8)

    dm = DeviceSyntheticDataModule(
        rir_dir=str(tmp_path), num_spk=2, sample_rate=fs,
        audio_time_len=(1.0, 1.0, 1.0, 1.0), num_items=(2, 2, 2, 2),
        rir_len=2048, dp_len=512, trajectory_points=3,
        batch_size=(2, 2), num_workers=0,
        seeds=(5, 2, 3, 3))  # pin the train seed (default None = fresh/call)
    batches = list(dm.train_dataloader())
    assert len(batches) == 1
    x, ys, paras = batches[0]
    assert x.shape == (2, 6, fs) and ys.shape == (2, 2, 6, fs)
    assert np.all(np.isfinite(np.asarray(x)))
    x2, ys2, _ = next(iter(dm.train_dataloader()))
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))


def test_preload_gather_matches_per_item_io(tmp_path):
    """Device-resident preloaded stacks + index gather produce BIT-IDENTICAL
    batches to the per-item file-IO path (same host RNG draws, same fp32
    cast point) — the preload exists so the training hot loop uploads only
    int32 indices (the per-step ~20 MB RIR uploads OOM-killed a 2 h fit on
    the tunneled backend, which pins every host->device staging copy)."""
    _make_tiny_corpus(tmp_path)
    kw = dict(rir_dir=str(tmp_path), num_spk=2, sample_rate=8000,
              audio_time_len=(1.0, 1.0, 1.0, 1.0), num_items=(4, 2, 2, 2),
              rir_len=2048, dp_len=1024, batch_size=(2, 2),
              noise_type=("white",), num_workers=0, seeds=(5, 2, 3, 3))
    dm_io = DeviceSyntheticDataModule(preload_rir=False, **kw)
    dm_pre = DeviceSyntheticDataModule(preload_rir=True, **kw)
    for mk in ("train_dataloader", "val_dataloader"):
        (x0, y0, p0), = list(getattr(dm_io, mk)())[:1]
        (x1, y1, p1), = list(getattr(dm_pre, mk)())[:1]
        np.testing.assert_array_equal(np.asarray(x0), np.asarray(x1))
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
        assert [p["seed"] for p in p0] == [p["seed"] for p in p1]
        assert [p["rir_file"] for p in p0] == [p["rir_file"] for p in p1]
        assert [p["RT60"] for p in p0] == pytest.approx(
            [p["RT60"] for p in p1])


def test_preload_gather_matches_trajectory(tmp_path):
    """Same bit-parity for moving sources (per-source fp16 trajectory
    stacks, P-point subsample baked in at preload time)."""
    from nbss_tpu.sim.config import RirConfigSampler
    from nbss_tpu.sim.generate import render_room

    fs = 8000
    s = RirConfigSampler(spk_num=2, noise_num=0, RT60_lim=(0.13, 0.16),
                         trajectory=("4points+sin", 0.5), fs=fs, seed=11)
    for idx, sub in [(0, "train"), (1, "validation")]:
        render_room(s.sample(idx), fs, str(tmp_path), sub, split_trajectory=8)
    kw = dict(rir_dir=str(tmp_path), num_spk=2, sample_rate=fs,
              audio_time_len=(1.0, 1.0, 1.0, 1.0), num_items=(2, 2, 2, 2),
              rir_len=2048, dp_len=512, trajectory_points=3,
              batch_size=(2, 2), num_workers=0, seeds=(5, 2, 3, 3))
    x0, y0, _ = next(iter(DeviceSyntheticDataModule(
        preload_rir=False, **kw).train_dataloader()))
    x1, y1, _ = next(iter(DeviceSyntheticDataModule(
        preload_rir=True, **kw).train_dataloader()))
    np.testing.assert_array_equal(np.asarray(x0), np.asarray(x1))
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


def test_preload_budget_fallback(tmp_path, monkeypatch):
    """A corpus above NBSS_RIR_PRELOAD_MB falls back to per-item IO
    (preload() returns None) and the loader still yields batches."""
    _make_tiny_corpus(tmp_path)
    monkeypatch.setenv("NBSS_RIR_PRELOAD_MB", "0")
    dm = DeviceSyntheticDataModule(
        rir_dir=str(tmp_path), num_spk=2, sample_rate=8000,
        audio_time_len=(1.0, 1.0, 1.0, 1.0), num_items=(2, 2, 2, 2),
        rir_len=2048, dp_len=1024, batch_size=(2, 2),
        noise_type=("white",), num_workers=0, seeds=(5, 2, 3, 3))
    x, ys, _ = next(iter(dm.train_dataloader()))
    assert dm._preload_cache.get("train") is None
    assert x.shape == (2, 4, 8000) and ys.shape == (2, 2, 4, 8000)
