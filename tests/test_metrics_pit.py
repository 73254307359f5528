"""SI-SDR / SNR / SA-SDR / SDR / uPIT correctness tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from nbss_tpu.ops import metrics as M
from nbss_tpu.ops.pit import permutate, pit
from nbss_tpu.io.loss import Loss, neg_si_sdr


def test_si_sdr_perfect(rng):
    x = rng.standard_normal((2, 3, 4000)).astype(np.float32)
    v = np.asarray(M.si_sdr(jnp.asarray(3.0 * x), jnp.asarray(x)))
    assert (v > 60).all()  # scale invariant: scaled copy is near-perfect


def test_si_sdr_numpy_formula(rng):
    preds = rng.standard_normal((4, 4000)).astype(np.float32)
    target = rng.standard_normal((4, 4000)).astype(np.float32)
    eps = np.finfo(np.float32).eps
    alpha = ((preds * target).sum(-1, keepdims=True) + eps) / ((target**2).sum(-1, keepdims=True) + eps)
    ts = alpha * target
    expect = 10 * np.log10(((ts**2).sum(-1) + eps) / (((ts - preds) ** 2).sum(-1) + eps))
    got = np.asarray(M.si_sdr(jnp.asarray(preds), jnp.asarray(target)))
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_snr_known_value():
    t = np.ones((1, 1000), np.float32)
    p = t + 0.1
    got = np.asarray(M.snr(jnp.asarray(p), jnp.asarray(t)))[0]
    np.testing.assert_allclose(got, 10 * np.log10(1.0 / 0.01), rtol=1e-4)


def test_sa_sdr_aggregates_sources(rng):
    t = rng.standard_normal((2, 2, 1000)).astype(np.float32)
    p = t + 0.1 * rng.standard_normal((2, 2, 1000)).astype(np.float32)
    got = np.asarray(M.sa_sdr(jnp.asarray(p), jnp.asarray(t)))
    eps = np.finfo(np.float32).eps
    expect = 10 * np.log10(((t**2).sum((-2, -1)) + eps) / (((t - p) ** 2).sum((-2, -1)) + eps))
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_sdr_identity_high(rng):
    x = rng.standard_normal((2, 8000)).astype(np.float32)
    v = np.asarray(M.sdr(jnp.asarray(x), jnp.asarray(x)))
    assert (v > 40).all()


def test_sdr_filtered_target_recovered(rng):
    """SDR is invariant to a short FIR distortion of the target."""
    from scipy.signal import lfilter

    x = rng.standard_normal((8000,)).astype(np.float32)
    h = np.array([0.8, 0.0, -0.3, 0.1], np.float32)
    y = lfilter(h, [1.0], x).astype(np.float32)
    v = float(np.asarray(M.sdr(jnp.asarray(y)[None], jnp.asarray(x)[None]))[0])
    assert v > 35, v
    # while plain SNR is terrible
    s = float(np.asarray(M.snr(jnp.asarray(y)[None], jnp.asarray(x)[None]))[0])
    assert s < 10


def test_pit_finds_swapped_permutation(rng):
    t = rng.standard_normal((3, 2, 2000)).astype(np.float32)
    p = t[:, ::-1].copy()  # swapped speakers
    val, perm = pit(jnp.asarray(p), jnp.asarray(t), metric_func=neg_si_sdr, eval_func="min")
    assert (np.asarray(perm) == np.array([1, 0])).all()
    fixed = permutate(jnp.asarray(p), perm)
    np.testing.assert_allclose(np.asarray(fixed), t, atol=1e-6)
    assert (np.asarray(val) < -60).all()


def test_pit_3spk(rng):
    t = rng.standard_normal((2, 3, 500)).astype(np.float32)
    order = [2, 0, 1]
    p = t[:, order]
    _, perm = pit(jnp.asarray(p), jnp.asarray(t), metric_func=neg_si_sdr, eval_func="min")
    fixed = np.asarray(permutate(jnp.asarray(p), perm))
    np.testing.assert_allclose(fixed, t, atol=1e-6)


def test_loss_wrapper_reorder(rng):
    t = rng.standard_normal((2, 2, 1000)).astype(np.float32)
    p = t[:, ::-1] + 0.01 * rng.standard_normal((2, 2, 1000)).astype(np.float32)
    loss = Loss(name="neg_si_sdr", pit=True)
    val, perms, yr_hat = loss(jnp.asarray(p), jnp.asarray(t), reorder=True)
    assert float(val) < -20
    corr = (np.asarray(yr_hat) * t).sum() / np.sqrt((np.asarray(yr_hat) ** 2).sum() * (t**2).sum())
    assert corr > 0.99


def test_loss_scale_invariance_flags():
    assert Loss(name="neg_si_sdr").is_scale_invariant_loss
    assert not Loss(name="neg_snr").is_scale_invariant_loss
    assert Loss(name="neg_sa_sdr", loss_func_kwargs=(("scale_invariant", True),)).is_scale_invariant_loss
    assert not Loss(name="neg_sa_sdr").is_scale_invariant_loss
    assert Loss(name="cirm_mse").mask == "cirm"
    assert Loss(name="models.io.loss.neg_si_sdr").name == "neg_si_sdr"
