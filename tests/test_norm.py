"""Norm modes vs a direct numpy re-derivation of the reference semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

from nbss_tpu.io.norm import Norm, forgetting_normalization


def _complex(rng, shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)


@pytest.mark.parametrize(
    "mode,online",
    [("utterance", False), ("utterance", True), ("frequency", False),
     ("frequency", True), ("forgetting", True), ("none", True)],
)
def test_norm_inorm_roundtrip(rng, mode, online):
    X = _complex(rng, (2, 4, 9, 17))
    norm = Norm(mode=mode, online=online)
    Xn, paras = norm.norm(jnp.asarray(X), ref_channel=1)
    Xback = norm.inorm(Xn, paras)
    np.testing.assert_allclose(np.asarray(Xback), X, atol=1e-5)
    # Xr is the unnormalized ref channel
    np.testing.assert_allclose(np.asarray(paras[0]), X[:, 1:2], atol=0)


def test_utterance_offline_values(rng):
    X = _complex(rng, (2, 3, 5, 7))
    norm = Norm(mode="utterance", online=False)
    Xn, (Xr, XrMM) = norm.norm(jnp.asarray(X), ref_channel=0)
    expect = np.abs(X[:, :1]).mean(axis=(2, 3), keepdims=True) + 1e-6
    np.testing.assert_allclose(np.asarray(XrMM), expect, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(Xn), X / expect, rtol=1e-5)


def test_frequency_online_values(rng):
    X = _complex(rng, (1, 2, 5, 7))
    norm = Norm(mode="frequency", online=True)
    Xn, (Xr, XrMM) = norm.norm(jnp.asarray(X), ref_channel=1)
    expect = np.abs(X[:, 1:2]) + 1e-6
    np.testing.assert_allclose(np.asarray(XrMM), expect, rtol=1e-6)


def test_forgetting_matches_loop(rng):
    """lax.scan EMA == the reference's python frame loop (norm.py:8-24)."""
    mag = np.abs(_complex(rng, (2, 1, 9, 300))).astype(np.float32)
    win = 192
    out = np.asarray(forgetting_normalization(jnp.asarray(mag), win))

    alpha = (win - 1) / (win + 1)
    mean_f = mag.mean(axis=2, keepdims=True)  # [B,1,1,T]
    mu = np.zeros_like(mean_f[..., 0])
    mus = []
    for t in range(mean_f.shape[-1]):
        a = min((t - 1) / (t + 1), alpha)
        mu = a * mu + (1 - a) * mean_f[..., t]
        mus.append(mu)
    expect = np.stack(mus, axis=-1)
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)


def test_norm_paras_reuse(rng):
    X = _complex(rng, (1, 2, 5, 7))
    Y = _complex(rng, (1, 2, 5, 7))
    norm = Norm(mode="utterance", online=False)
    _, paras = norm.norm(jnp.asarray(X), ref_channel=0)
    Yn, paras2 = norm.norm(jnp.asarray(Y), ref_channel=0, norm_paras=paras)
    np.testing.assert_allclose(np.asarray(Yn), Y / np.asarray(paras[1]), rtol=1e-5)
