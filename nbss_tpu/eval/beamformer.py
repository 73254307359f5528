"""Oracle MVDR beamformer baseline, fully batched in JAX.

Counterpart of /root/reference/models/oracle_beamformer.py:50-182 (itself
derived from the public `beamformers` package): frequency-domain MVDR with
the steering vector taken as the leading eigenvector of the per-frequency
target covariance (or mixture-minus-noise covariance), covariance
conditioning per fgnt/nn-gev, and distortionless weights
w = R^-1 h / (h^H R^-1 h).

Unlike the reference's per-frequency Python loops, the eigendecomposition
(via jnp.linalg.eigh on the Hermitian covariances) and the solves are
batched over all frequencies in one jit — the whole beamformer is a single
XLA program.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from nbss_tpu.io.stft import STFT


def condition_covariance(x: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """(x + gamma * tr(x)/C * I) / (1 + gamma), batched on [..., C, C]."""
    C = x.shape[-1]
    scale = gamma * jnp.trace(x, axis1=-2, axis2=-1)[..., None, None] / C
    eye = jnp.eye(C, dtype=x.dtype)
    return (x + scale * eye) / (1 + gamma)


def estimate_steering_vector(
    target_stft: Optional[jnp.ndarray] = None,
    mixture_stft: Optional[jnp.ndarray] = None,
    noise_stft: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Leading eigenvector per frequency, normalized to channel 0.

    inputs: [C, F, T] complex. Returns [F, C].
    """
    if target_stft is not None:
        R = jnp.einsum("cft,dft->fcd", target_stft, jnp.conj(target_stft))
    else:
        assert mixture_stft is not None and noise_stft is not None
        R = jnp.einsum("cft,dft->fcd", mixture_stft, jnp.conj(mixture_stft)) \
            - jnp.einsum("cft,dft->fcd", noise_stft, jnp.conj(noise_stft))
    # covariances are Hermitian -> batched eigh; leading = last eigenvector
    _, vecs = jnp.linalg.eigh(R)
    h = vecs[..., -1]  # [F, C]
    denom = h[..., :1]
    safe = jnp.abs(denom) > 1e-12
    h = jnp.where(safe, h / jnp.where(safe, denom, 1.0), jnp.ones_like(h))
    return h


def mvdr_weights(mixture_stft: jnp.ndarray, h: jnp.ndarray,
                 gamma: float = 1e-6) -> jnp.ndarray:
    """mixture_stft [C, F, T], h [F, C] -> weights [F, C]."""
    T = mixture_stft.shape[-1]
    R = jnp.einsum("cft,dft->fcd", mixture_stft, jnp.conj(mixture_stft)) / T
    R = condition_covariance(R, gamma)
    R = R / (jnp.trace(R, axis1=-2, axis2=-1)[..., None, None] + 1e-15)
    part = jnp.linalg.solve(R, h[..., None])[..., 0]  # [F, C]
    denom = jnp.sum(jnp.conj(h) * part, axis=-1, keepdims=True)
    return part / jnp.where(jnp.abs(denom) > 1e-15, denom, 1.0)


def mvdr(
    mixture: jnp.ndarray,
    noise: Optional[jnp.ndarray] = None,
    target: Optional[jnp.ndarray] = None,
    stft: Optional[STFT] = None,
) -> jnp.ndarray:
    """Oracle MVDR: [C, T] mixture (+ oracle noise or target) -> [T]."""
    stft = stft or STFT(n_fft=2048, n_hop=512)
    X, olen = stft.stft(mixture)  # [C, F, T]
    if target is not None:
        Tf, _ = stft.stft(target)
        h = estimate_steering_vector(target_stft=Tf)
    else:
        assert noise is not None, "provide oracle noise or target"
        Nf, _ = stft.stft(noise)
        h = estimate_steering_vector(mixture_stft=X, noise_stft=Nf)
    w = mvdr_weights(X, h)
    Y = jnp.einsum("fc,cft->ft", jnp.conj(w), X)
    return stft.istft(Y, olen)
