"""STFT/iSTFT: round-trip and bit-parity against the torch oracle."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch

from nbss_tpu.io.stft import STFT, PARAS_8K, PARAS_16K


@pytest.mark.parametrize("paras", [PARAS_8K, PARAS_16K])
def test_roundtrip(rng, paras):
    stft = STFT(**paras)
    x = rng.standard_normal((2, 3, 8000 * 4)).astype(np.float32)
    X, olen = stft.stft(jnp.asarray(x))
    y = stft.istft(X, olen)
    assert X.shape[:-2] == (2, 3)
    assert X.shape[-2] == paras["n_fft"] // 2 + 1
    assert y.shape == x.shape
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("win", ["hann_window", "sqrt_hann_window"])
@pytest.mark.parametrize("paras", [PARAS_8K, PARAS_16K])
def test_stft_matches_torch(rng, paras, win):
    stft = STFT(win=win, **paras)
    x = rng.standard_normal((3, 8000 * 2 + 77)).astype(np.float32)

    X, olen = stft.stft(jnp.asarray(x))

    window = torch.hann_window(paras["n_fft"])
    if win == "sqrt_hann_window":
        window = torch.sqrt(window)
    Xt = torch.stft(
        torch.from_numpy(x),
        n_fft=paras["n_fft"],
        hop_length=paras["n_hop"],
        win_length=paras["win_len"],
        window=window,
        return_complex=True,
    )
    assert X.shape == tuple(Xt.shape)
    np.testing.assert_allclose(np.asarray(X), Xt.numpy(), atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("paras", [PARAS_8K])
def test_istft_matches_torch(rng, paras):
    stft = STFT(**paras)
    x = rng.standard_normal((2, 8000)).astype(np.float32)
    X, olen = stft.stft(jnp.asarray(x))
    y = stft.istft(X, olen)

    window = torch.hann_window(paras["n_fft"])
    yt = torch.istft(
        torch.from_numpy(np.asarray(X)),
        n_fft=paras["n_fft"],
        hop_length=paras["n_hop"],
        win_length=paras["win_len"],
        window=window,
        length=olen,
    )
    np.testing.assert_allclose(np.asarray(y), yt.numpy(), atol=1e-4, rtol=1e-4)


def test_frame_fallback_path(rng):
    # hop that does not divide n_fft exercises the gather fallback
    stft = STFT(n_fft=256, n_hop=100)
    x = rng.standard_normal((1, 4000)).astype(np.float32)
    X, olen = stft.stft(jnp.asarray(x))
    Xt = torch.stft(
        torch.from_numpy(x), n_fft=256, hop_length=100,
        window=torch.hann_window(256), return_complex=True,
    )
    np.testing.assert_allclose(np.asarray(X), Xt.numpy(), atol=2e-4, rtol=1e-4)
    y = stft.istft(X, olen)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-3)
