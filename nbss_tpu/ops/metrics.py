"""Pure-JAX audio metrics: SI-SDR, SNR, SA-SDR, BSS-eval SDR.

These replace the torchmetrics.functional.audio kernels the reference relies
on (/root/reference/models/io/loss.py:5-8, SharedTrainer.py:13-17), with the
same eps conventions so values match within float tolerance:

- ``si_sdr``: scale-invariant SDR (Le Roux et al. 2019), eps = float32 eps.
- ``snr``: plain signal-to-noise ratio.
- ``sa_sdr``: source-aggregated SDR (energy summed over sources and time
  before the ratio), optional per-source optimal scaling.
- ``sdr``: BSS-eval SDR via a length-512 distortion filter — the Toeplitz
  system is solved as a batched dense ``jnp.linalg.solve`` (TPU-friendly; no
  iterative CG needed at L=512).

All metrics reduce over the last axis (time) and return one value per leading
batch/source element, matching torchmetrics broadcasting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_EPS = float(np.finfo(np.float32).eps)


def si_sdr(preds: jnp.ndarray, target: jnp.ndarray, zero_mean: bool = False) -> jnp.ndarray:
    """Scale-invariant signal-to-distortion ratio, in dB. [..., time] -> [...]."""
    preds = preds.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if zero_mean:
        preds = preds - jnp.mean(preds, axis=-1, keepdims=True)
        target = target - jnp.mean(target, axis=-1, keepdims=True)
    alpha = (jnp.sum(preds * target, axis=-1, keepdims=True) + _EPS) / (
        jnp.sum(target * target, axis=-1, keepdims=True) + _EPS
    )
    target_scaled = alpha * target
    noise = target_scaled - preds
    val = (jnp.sum(target_scaled**2, axis=-1) + _EPS) / (jnp.sum(noise**2, axis=-1) + _EPS)
    return 10.0 * jnp.log10(val)


def snr(preds: jnp.ndarray, target: jnp.ndarray, zero_mean: bool = False) -> jnp.ndarray:
    """Signal-to-noise ratio in dB. [..., time] -> [...]."""
    preds = preds.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if zero_mean:
        preds = preds - jnp.mean(preds, axis=-1, keepdims=True)
        target = target - jnp.mean(target, axis=-1, keepdims=True)
    noise = target - preds
    val = (jnp.sum(target**2, axis=-1) + _EPS) / (jnp.sum(noise**2, axis=-1) + _EPS)
    return 10.0 * jnp.log10(val)


def sa_sdr(
    preds: jnp.ndarray,
    target: jnp.ndarray,
    scale_invariant: bool = False,
    zero_mean: bool = False,
) -> jnp.ndarray:
    """Source-aggregated SDR in dB. [..., spk, time] -> [...]."""
    preds = preds.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if zero_mean:
        preds = preds - jnp.mean(preds, axis=-1, keepdims=True)
        target = target - jnp.mean(target, axis=-1, keepdims=True)
    if scale_invariant:
        alpha = (jnp.sum(preds * target, axis=-1, keepdims=True) + _EPS) / (
            jnp.sum(target * target, axis=-1, keepdims=True) + _EPS
        )
        target = alpha * target
    distortion = target - preds
    val = (jnp.sum(target**2, axis=(-2, -1)) + _EPS) / (
        jnp.sum(distortion**2, axis=(-2, -1)) + _EPS
    )
    return 10.0 * jnp.log10(val)


def _symmetric_toeplitz(r: jnp.ndarray) -> jnp.ndarray:
    """Build symmetric Toeplitz matrices from first rows r: [..., L] -> [..., L, L]."""
    L = r.shape[-1]
    i = jnp.arange(L)
    idx = jnp.abs(i[:, None] - i[None, :])  # [L, L]
    return r[..., idx]


def sdr(
    preds: jnp.ndarray,
    target: jnp.ndarray,
    filter_length: int = 512,
    zero_mean: bool = False,
    load_diag: float | None = None,
) -> jnp.ndarray:
    """BSS-eval SDR in dB with a ``filter_length``-tap distortion filter.

    The optimal FIR filter h mapping target -> preds is found by solving the
    Toeplitz normal equations R h = b (R = target autocorrelation, b =
    target/preds cross-correlation); SDR = 10 log10(coh / (1 - coh)) with
    coh = <b, h> / ||preds||^2. Same construction torchmetrics uses for the
    reference's val/sdr and SDR test metric.

    [..., time] -> [...].
    """
    preds = preds.astype(jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32)
    target = target.astype(preds.dtype)
    if zero_mean:
        preds = preds - jnp.mean(preds, axis=-1, keepdims=True)
        target = target - jnp.mean(target, axis=-1, keepdims=True)

    # normalize for numerical stability (scale-invariant construction)
    den = jnp.mean(target**2, axis=-1, keepdims=True) + jnp.mean(preds**2, axis=-1, keepdims=True)
    scale = jnp.sqrt(den / 2.0 + _EPS)
    preds = preds / scale
    target = target / scale

    L = filter_length
    T = target.shape[-1]
    n_fft = int(2 ** np.ceil(np.log2(T + L - 1)))

    tf = jnp.fft.rfft(target, n=n_fft, axis=-1)
    pf = jnp.fft.rfft(preds, n=n_fft, axis=-1)

    # autocorrelation of target, lags 0..L-1
    r = jnp.fft.irfft(tf * jnp.conj(tf), n=n_fft, axis=-1)[..., :L]
    # cross-correlation sum_t target[t] * preds[t + lag], lags 0..L-1
    b = jnp.fft.irfft(jnp.conj(tf) * pf, n=n_fft, axis=-1)[..., :L]

    # diagonal loading: explicit value plus a relative floor so silent /
    # degenerate targets yield a finite (very low) SDR instead of NaN
    reg = jnp.maximum(load_diag or 0.0, 1e-8 * r[..., 0] + _EPS)
    r = r.at[..., 0].add(reg)

    R = _symmetric_toeplitz(r)
    h = jnp.linalg.solve(R, b[..., None])[..., 0]

    coh = jnp.sum(b * h, axis=-1) / (jnp.sum(preds**2, axis=-1) + _EPS)
    coh = jnp.clip(coh, 0.0, 1.0 - 1e-8)
    ratio = coh / jnp.maximum(1.0 - coh, _EPS)
    return (10.0 * jnp.log10(jnp.maximum(ratio, _EPS))).astype(jnp.float32)
