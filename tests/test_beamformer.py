"""Oracle MVDR: must improve SI-SDR on a synthetic spatial mixture."""

import numpy as np

import jax.numpy as jnp

from nbss_tpu.eval.beamformer import mvdr
from nbss_tpu.io.stft import STFT
from nbss_tpu.ops.metrics import si_sdr


def test_mvdr_improves_sisdr(rng):
    fs, T, C = 8000, 8000 * 2, 4
    from scipy.signal import lfilter

    src = lfilter([0.2], [1, -0.8], rng.standard_normal(T)).astype(np.float32)
    # target: distinct small delays per channel (plane wave)
    target = np.zeros((C, T), np.float32)
    for c in range(C):
        d = 3 * c
        target[c, d:] = src[: T - d]
    # directional-ish noise + diffuse noise
    nsrc = lfilter([0.3], [1, -0.5], rng.standard_normal(T)).astype(np.float32)
    noise = np.zeros((C, T), np.float32)
    for c in range(C):
        d = 11 - 2 * c
        noise[c, d:] = nsrc[: T - d]
    noise += 0.2 * rng.standard_normal((C, T)).astype(np.float32)
    noise *= 0.6 * np.std(target) / np.std(noise)
    mixture = target + noise

    stft = STFT(n_fft=512, n_hop=128)
    out = np.asarray(mvdr(jnp.asarray(mixture), noise=jnp.asarray(noise), stft=stft))
    assert out.shape == (T,)

    before = float(si_sdr(jnp.asarray(mixture[0])[None], jnp.asarray(target[0])[None])[0])
    after = float(si_sdr(jnp.asarray(out)[None], jnp.asarray(target[0])[None])[0])
    assert after > before + 3, (before, after)

    # with oracle target it should be at least as strong
    out_t = np.asarray(mvdr(jnp.asarray(mixture), target=jnp.asarray(target), stft=stft))
    after_t = float(si_sdr(jnp.asarray(out_t)[None], jnp.asarray(target[0])[None])[0])
    assert after_t > before + 3, (before, after_t)
