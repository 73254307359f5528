"""STFT / iSTFT for TPU: framed rfft + vectorized overlap-add.

Matches the semantics of the reference STFT wrapper
(/root/reference/models/io/stft.py:49-97, which delegates to torch.stft/istft):

- ``center=True``: the signal is padded by ``n_fft // 2`` on both sides with
  reflect padding before framing.
- hann (periodic) or sqrt-hann window of length ``win_len`` (zero-padded and
  centered inside ``n_fft`` when shorter).
- one-sided rfft -> ``F = n_fft // 2 + 1`` bins.
- iSTFT: per-frame irfft, synthesis-windowed overlap-add, normalized by the
  window-square envelope, then the center padding is removed and the output is
  trimmed/padded to ``original_len``.

TPU-first design notes
----------------------
- Framing avoids gathers when ``hop`` divides ``n_fft`` (the shipped presets
  use 50% overlap): the padded signal is reshaped into hop-blocks and frames
  are built from ``k = n_fft // hop`` shifted static slices — pure reshapes
  and concats that XLA fuses into the rfft.
- Overlap-add is the transpose of that: each frame is split into ``k`` hop
  chunks and the k diagonally-shifted chunk tensors are summed. No
  scatter-add, no Python loop over frames.
- Everything is computed in float32 (fp32 island) regardless of the caller's
  compute dtype, mirroring the reference's forced-fp32 autocast
  (stft.py:60,80).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Presets mirroring /root/reference/models/io/stft.py:8-18
PARAS_16K = dict(n_fft=512, n_hop=256, win_len=512)
PARAS_8K = dict(n_fft=256, n_hop=128, win_len=256)


def periodic_hann(n: int, dtype=np.float32) -> np.ndarray:
    """torch.hann_window(n, periodic=True) == 0.5 * (1 - cos(2*pi*k/n)).

    Built with numpy (not jnp) on purpose: the window is a host-side
    constant, and ``STFT._window`` is a cached_property — computing it
    with jnp under an active jit trace would cache a leaked tracer
    (observed via scripts/eval_streaming_ckpt.py, round 5)."""
    k = np.arange(n, dtype=dtype)
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * k / n))


def make_window(n_fft: int, win_len: int, win: str = "hann_window") -> np.ndarray:
    assert win in ("hann_window", "sqrt_hann_window"), win
    w = periodic_hann(win_len)
    if win == "sqrt_hann_window":
        w = np.sqrt(w)
    if win_len < n_fft:  # center-pad window to n_fft like torch.stft
        left = (n_fft - win_len) // 2
        w = np.pad(w, (left, n_fft - win_len - left))
    return w


def _frame(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Frame the last axis: [..., L] -> [..., T, n_fft] with stride ``hop``.

    Fast path (hop | n_fft): reshape into hop blocks + k shifted slices.
    Fallback: one gather with a static [T, n_fft] index matrix.
    """
    L = x.shape[-1]
    num_frames = 1 + (L - n_fft) // hop
    if n_fft % hop == 0:
        k = n_fft // hop
        usable = (num_frames - 1) * hop + n_fft  # multiple of hop by construction
        xb = x[..., :usable]
        nb = usable // hop
        blocks = xb.reshape(*x.shape[:-1], nb, hop)
        # frame t = concat(blocks[t], ..., blocks[t+k-1])
        parts = [blocks[..., j : nb - (k - 1) + j, :] for j in range(k)]
        return jnp.concatenate(parts, axis=-1)
    idx = jnp.arange(num_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return x[..., idx]


def _overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Inverse of `_frame`: [..., T, n_fft] -> [..., (T-1)*hop + n_fft]."""
    *lead, T, n_fft = frames.shape
    out_len = (T - 1) * hop + n_fft
    if n_fft % hop == 0:
        k = n_fft // hop
        chunks = frames.reshape(*lead, T, k, hop)
        nb_out = out_len // hop
        acc = jnp.zeros((*lead, nb_out, hop), frames.dtype)
        for j in range(k):
            # chunk j of frame t lands on output block t + j
            pad = [(0, 0)] * len(lead) + [(j, k - 1 - j), (0, 0)]
            acc = acc + jnp.pad(chunks[..., j, :], pad)
        return acc.reshape(*lead, out_len)
    out = jnp.zeros((*lead, out_len), frames.dtype)
    idx = jnp.arange(T)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return out.at[..., idx].add(frames)


@dataclass(frozen=True)
class STFT:
    """Functional STFT/iSTFT pair (hashable -> safe as a jit static arg)."""

    n_fft: int = 256
    n_hop: int = 128
    win_len: Optional[int] = None
    win: str = "hann_window"

    @property
    def window_len(self) -> int:
        return self.win_len if self.win_len is not None else self.n_fft

    @property
    def num_freqs(self) -> int:
        return self.n_fft // 2 + 1

    @functools.cached_property
    def _window(self) -> np.ndarray:
        # host numpy constant (trace-safe to cache); becomes an XLA constant
        return make_window(self.n_fft, self.window_len, self.win)

    def stft(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
        """[..., time] -> (complex64 [..., F, T], original_len)."""
        original_len = x.shape[-1]
        x = x.astype(jnp.float32)  # fp32 island
        pad = self.n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
        frames = _frame(x, self.n_fft, self.n_hop)  # [..., T, n_fft]
        frames = frames * jnp.asarray(self._window, frames.dtype)
        X = jnp.fft.rfft(frames, n=self.n_fft, axis=-1)  # [..., T, F]
        X = jnp.swapaxes(X, -1, -2)  # [..., F, T]
        return X.astype(jnp.complex64), original_len

    def istft(self, X: jnp.ndarray, original_len: int) -> jnp.ndarray:
        """complex [..., F, T] + length -> real float32 [..., original_len]."""
        X = X.astype(jnp.complex64)
        Xt = jnp.swapaxes(X, -1, -2)  # [..., T, F]
        frames = jnp.fft.irfft(Xt, n=self.n_fft, axis=-1)  # [..., T, n_fft]
        w = jnp.asarray(self._window, frames.dtype)
        y = _overlap_add(frames * w, self.n_hop)
        # window-square envelope (data independent, constant-folded by XLA)
        T = frames.shape[-2]
        wsq = jnp.broadcast_to(w * w, (T, self.n_fft))
        env = _overlap_add(wsq, self.n_hop)
        eps = jnp.asarray(1e-11, y.dtype)
        y = y / jnp.where(env > eps, env, jnp.ones_like(env))
        pad = self.n_fft // 2
        y = y[..., pad:]
        if y.shape[-1] >= original_len:
            y = y[..., :original_len]
        else:
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, original_len - y.shape[-1])])
        return y
