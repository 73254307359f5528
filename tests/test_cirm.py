"""cIRM compress/decompress/build tests."""

import numpy as np

import jax.numpy as jnp

from nbss_tpu.io.cirm import (
    EPSILON,
    build_complex_ideal_ratio_mask,
    compress_cirm,
    decompress_cirm,
)


def _complex(rng, shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)


def test_compress_decompress_roundtrip(rng):
    m = (5 * rng.standard_normal((4, 9, 17))).astype(np.float32)
    c = compress_cirm(jnp.asarray(m))
    assert float(jnp.max(jnp.abs(c))) < 10.0
    cm = jax_complex(c, jnp.zeros_like(c))
    back = decompress_cirm(cm).real
    np.testing.assert_allclose(np.asarray(back), m, rtol=1e-3, atol=1e-3)


def jax_complex(r, i):
    import jax

    return jax.lax.complex(r, i)


def test_build_mask_reconstructs_clean(rng):
    noisy = _complex(rng, (2, 9, 17))
    clean = _complex(rng, (2, 9, 17))
    mask = build_complex_ideal_ratio_mask(jnp.asarray(noisy), jnp.asarray(clean))
    recon = np.asarray(decompress_cirm(mask)) * noisy
    # limited by the +-9.9 clamp; most bins reconstruct well
    err = np.abs(recon - clean) / (np.abs(clean) + EPSILON)
    assert np.median(err) < 1e-2
