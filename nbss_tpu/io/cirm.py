"""Complex ideal ratio mask (cIRM) build / compress / decompress.

JAX counterpart of /root/reference/models/io/cirm.py:7-64 (K=10, C=0.1
tanh-style compression, +-9.9 clamp on decompression). Complex numbers are
represented natively as complex64 arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

EPSILON = float(np.finfo(np.float32).eps)


def compress_cirm(mask: jnp.ndarray, K: float = 10.0, C: float = 0.1) -> jnp.ndarray:
    """Compress real-valued mask components from (-inf, inf) to (-K, K)."""
    mask = jnp.where(mask <= -100.0, -100.0, mask)
    return K * (1.0 - jnp.exp(-C * mask)) / (1.0 + jnp.exp(-C * mask))


def build_complex_ideal_ratio_mask(noisy: jnp.ndarray, clean: jnp.ndarray) -> jnp.ndarray:
    """Build the compressed cIRM from noisy/clean complex STFTs.

    Args:
        noisy, clean: [..., F, T] complex.
    Returns:
        [..., F, T] complex compressed mask.
    """
    nr, ni = noisy.real, noisy.imag
    cr, ci = clean.real, clean.imag
    denom = nr * nr + ni * ni + EPSILON
    mask_r = (nr * cr + ni * ci) / denom
    mask_i = (nr * ci - ni * cr) / denom
    return jax.lax.complex(compress_cirm(mask_r), compress_cirm(mask_i))


def decompress_cirm(mask: jnp.ndarray, K: float = 10.0, limit: float = 9.9) -> jnp.ndarray:
    """Decompress complex cIRM from (-K, K) back to (-inf, inf)."""

    def _dec(m):
        m = jnp.clip(m, -limit, limit)
        return -K * jnp.log((K - m) / (K + m))

    return jax.lax.complex(_dec(mask.real), _dec(mask.imag))
