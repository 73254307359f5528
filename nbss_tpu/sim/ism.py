"""Image-source room impulse response simulation, TPU-native.

Replaces the reference's external gpuRIR / rir_generator dependencies
(/root/reference/generate_rirs.py:78-190). Instead of time-domain
scatter-adds of windowed sincs (a GPU-friendly pattern), the RIR is
assembled in the FREQUENCY domain:

    H[m, f] = sum_k amp[m, k] * exp(-2j*pi*f*delay[m, k])

which is a dense batched complex reduction over image sources — pure
VPU/MXU work with no scatters, ideal bandlimited fractional delays for
free, and one irfft at the end. Phase is computed exactly by splitting the
delay into integer + fractional samples (integer part via int32 modular
twiddle indices), so fp32 suffices even for long RIRs.

Reflection amplitudes follow Allen & Berkley's formulation with per-wall
reflection coefficients beta[6] = [x0, x1, y0, y1, z0, z1]; the direct-path
RIR is the T60=0 special case (single image), the trick the reference uses
(generate_rirs.py:167-171).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def sabine_t60(room_sz, beta) -> float:
    """Sabine T60 implied by room + reflection coefficients."""
    alpha = 1.0 - np.asarray(beta, np.float64) ** 2
    sx, sy, sz = room_sz
    Sa = (alpha[0] + alpha[1]) * sy * sz + (alpha[2] + alpha[3]) * sx * sz \
        + (alpha[4] + alpha[5]) * sx * sy
    V = sx * sy * sz
    return 0.161 * V / max(Sa, 1e-9)


def beta_from_t60(room_sz, T60: float, abs_weights=None) -> Tuple[np.ndarray, float]:
    """Reflection coefficients for a desired T60 via Sabine's formula
    (closed form — the reference runs scipy.minimize for the same scalar
    problem, generate_rirs.py:43-75). Returns (beta [6], |T60 error|)."""
    w = np.ones(6) if abs_weights is None else np.asarray(abs_weights, np.float64)
    w = w / w.max()
    sx, sy, sz = room_sz
    areas = np.array([sy * sz, sy * sz, sx * sz, sx * sz, sx * sy, sx * sy])
    Saw = float((w * areas).sum())
    V = sx * sy * sz
    if T60 <= 0:
        return np.zeros(6, np.float32), 0.0
    x = 0.161 * V / (T60 * Saw)  # absorption scale achieving T60 exactly
    x = min(x, 1.0)
    err = abs(T60 - 0.161 * V / (x * Saw))
    beta = np.sqrt(np.clip(1.0 - x * w, 0.0, 1.0))
    return beta.astype(np.float32), float(err)


def _image_grid(room_sz, T60: float, c: float) -> np.ndarray:
    """All image indices [(n, p) combos, 6] = (nx, ny, nz, px, py, pz)."""
    if T60 <= 0:
        return np.zeros((1, 6), np.int32)  # direct path only
    max_dist = c * (T60 + 0.1)
    ns = [int(math.ceil(max_dist / (2.0 * L))) for L in room_sz]
    grids = np.meshgrid(
        *[np.arange(-n, n + 1) for n in ns], [0, 1], [0, 1], [0, 1],
        indexing="ij")
    idx = np.stack([g.reshape(-1) for g in grids], axis=-1)  # [K, 6]
    # order columns as nx, ny, nz, px, py, pz
    return idx.astype(np.int32)


@partial(jax.jit, static_argnames=("L", "fs", "c"))
def _accumulate_spectrum(img_idx, room_sz, pos_src, pos_rcv, beta, L: int,
                         fs: int, c: float):
    """H [M, L//2+1] complex64 for one source; img_idx [K, 6] int32."""
    M = pos_rcv.shape[0]
    F = L // 2 + 1
    n = img_idx[:, :3].astype(jnp.float32)  # [K, 3]
    p = img_idx[:, 3:].astype(jnp.float32)

    # image positions: (1 - 2p) * s + 2 n room
    img_pos = (1.0 - 2.0 * p) * pos_src[None, :] + 2.0 * n * room_sz[None, :]
    # reflection amplitude: beta1^|n| * beta0^|n - p| per axis
    n_abs = jnp.abs(img_idx[:, :3]).astype(jnp.float32)
    np_abs = jnp.abs(img_idx[:, :3] - img_idx[:, 3:]).astype(jnp.float32)
    b0 = beta[jnp.asarray([0, 2, 4])][None, :]  # walls at 0
    b1 = beta[jnp.asarray([1, 3, 5])][None, :]  # walls at L
    refl = jnp.prod(b1 ** n_abs * b0 ** np_abs, axis=-1)  # [K]

    d = jnp.linalg.norm(img_pos[:, None, :] - pos_rcv[None, :, :], axis=-1)  # [K, M]
    amp = refl[:, None] / (4.0 * jnp.pi * jnp.maximum(d, 1e-2))  # [K, M]
    delay = d * (fs / c)  # samples, [K, M]
    # drop images beyond the RIR length (their energy is truncated anyway);
    # clamp afterwards so the int32 twiddle index can't overflow on the
    # masked (possibly sentinel) entries
    amp = jnp.where(delay < L - 1, amp, 0.0)
    delay = jnp.minimum(delay, jnp.float32(L - 1))

    d_int = jnp.floor(delay).astype(jnp.int32)
    d_frac = delay - d_int.astype(jnp.float32)

    k = jnp.arange(F, dtype=jnp.int32)  # [F]
    # integer part: exact modular twiddle exp(-2i pi k d_int / L)
    m_int = (k[None, None, :] * (d_int[..., None] % L)) % L  # [K, M, F] int32
    ang_int = (-2.0 * jnp.pi / L) * m_int.astype(jnp.float32)
    # fractional part: small angles, fp32-accurate
    ang_frac = (-2.0 * jnp.pi / L) * (k[None, None, :].astype(jnp.float32)
                                      * d_frac[..., None])
    ang = ang_int + ang_frac
    H = jnp.sum(amp[..., None] * jax.lax.complex(jnp.cos(ang), jnp.sin(ang)), axis=0)
    return H  # [M, F]


def simulate_rir(
    room_sz,
    pos_src,
    pos_rcv,
    T60: float,
    fs: int,
    beta: Optional[np.ndarray] = None,
    c: float = 343.0,
    image_chunk: int = 2048,
) -> np.ndarray:
    """Simulate RIRs. Returns [n_src, n_mic, L] float32 with
    L = int((T60 + 0.1) * fs).

    ``T60 == 0`` gives the direct-path-only RIR. Images are processed in
    chunks of ``image_chunk`` to bound the [K, M, F] intermediate.
    """
    room_sz = np.asarray(room_sz, np.float32)
    pos_src = np.atleast_2d(np.asarray(pos_src, np.float32))
    pos_rcv = np.atleast_2d(np.asarray(pos_rcv, np.float32))
    if pos_src.size == 0:
        return None
    assert (pos_src >= 0).all() and (pos_src <= room_sz + 1e-3).all(), "src outside room"
    if beta is None:
        beta, _ = beta_from_t60(room_sz, T60)
    beta = np.asarray(beta, np.float32)

    L = int((T60 + 0.1) * fs)
    F = L // 2 + 1
    idx = _image_grid(room_sz, T60, c)
    S, M = pos_src.shape[0], pos_rcv.shape[0]

    # pad the image list to a chunk multiple with far-away sentinel images
    # (masked out by the delay >= L cut) so every chunk compiles once
    if idx.shape[0] % image_chunk:
        pad = image_chunk - idx.shape[0] % image_chunk
        sentinel = np.full((pad, 6), 10000, np.int32)
        idx = np.concatenate([idx, sentinel], axis=0)

    out = np.empty((S, M, L), np.float32)
    room_j = jnp.asarray(room_sz)
    rcv_j = jnp.asarray(pos_rcv)
    beta_j = jnp.asarray(beta)
    for s in range(S):
        H = jnp.zeros((M, F), jnp.complex64)
        for k0 in range(0, idx.shape[0], image_chunk):
            chunk = jnp.asarray(idx[k0:k0 + image_chunk])
            H = H + _accumulate_spectrum(chunk, room_j, jnp.asarray(pos_src[s]),
                                         rcv_j, beta_j, L, fs, c)
        out[s] = np.asarray(jnp.fft.irfft(H, n=L, axis=-1), np.float32)
    return out


def simulate_direct_path(room_sz, pos_src, pos_rcv, fs: int, c: float = 343.0):
    """Direct-path RIR (T60=0 trick, generate_rirs.py:167-171)."""
    return simulate_rir(room_sz, pos_src, pos_rcv, 0.0, fs, c=c)
