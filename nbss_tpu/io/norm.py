"""Input normalization by reference-channel magnitude.

Functional JAX counterpart of the reference Norm module
(/root/reference/models/io/norm.py:47-108), covering modes
``utterance`` / ``frequency`` / ``forgetting`` / ``none``, each with an
online (causal) variant where applicable.

Differences from the reference (intentional, TPU-first):

- No in-place mutation: the reference divides ``X`` in place after cloning the
  ref channel (norm.py:77,94); here ``norm`` purely returns the normalized X
  plus ``(Xr, XrMM)`` where ``Xr`` is the *unnormalized* reference channel —
  the same dataflow the reference relies on for mask losses.
- ``forgetting_normalization`` (norm.py:8-24) is a Python frame loop on CPU in
  the reference; here it is a single ``lax.scan`` over T, fully on device and
  jit-compatible.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp


def forgetting_normalization(xr_mag: jnp.ndarray, sliding_window_len: int = 192) -> jnp.ndarray:
    """Exponential moving average over frames of the F-mean magnitude.

    Args:
        xr_mag: [B, 1, F, T] magnitudes of the reference channel.
    Returns:
        [B, 1, 1, T] smoothed magnitude mean.

    Matches the reference warm-up rule alpha_t = min((t-1)/(t+1), alpha)
    (norm.py:17-20) — including the t=0 quirk alpha_0 = -1 which doubles the
    first frame's contribution.
    """
    alpha = (sliding_window_len - 1) / (sliding_window_len + 1)
    mean_f = jnp.mean(xr_mag, axis=2, keepdims=True)  # [B,1,1,T]
    T = mean_f.shape[-1]
    t = jnp.arange(T, dtype=mean_f.dtype)
    alpha_t = jnp.minimum((t - 1.0) / (t + 1.0), alpha)  # [T]

    x_t = jnp.moveaxis(mean_f, -1, 0)  # [T, B, 1, 1]

    def step(mu, inp):
        a, x = inp
        mu = a * mu + (1.0 - a) * x
        return mu, mu

    _, mus = jax.lax.scan(step, jnp.zeros_like(x_t[0]), (alpha_t, x_t))
    return jnp.moveaxis(mus, 0, -1)  # [B,1,1,T]


@dataclass(frozen=True)
class Norm:
    """Normalization policy (hashable -> safe as a jit static arg).

    mode: 'utterance' | 'frequency' | 'forgetting' | 'none' | None
    online: causal variant (reference norm.py:49-53; 'forgetting' implies it).
    """

    mode: Optional[str] = "utterance"
    online: bool = True

    def __post_init__(self):
        assert self.mode in (None, "none", "utterance", "frequency", "forgetting"), self.mode
        assert self.mode != "forgetting" or self.online, "forgetting is an online normalization"

    def norm(
        self,
        X: jnp.ndarray,
        ref_channel: int,
        norm_paras: Any = None,
        eps: float = 1e-6,
    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, Optional[jnp.ndarray]]]:
        """Normalize complex STFT coefficients.

        Args:
            X: [B, C, F, T] complex.
            ref_channel: index of the reference channel inside X's C axis.
            norm_paras: reuse scaling from a previous call (reference
                norm.py:92-93) — pass the returned ``(Xr, XrMM)``.

        Returns:
            (X_normalized, (Xr, XrMM)) where Xr is the *unnormalized*
            reference channel [B,1,F,T] and XrMM broadcasts against X.
        """
        if self.mode in (None, "none"):
            Xr = X[:, ref_channel : ref_channel + 1]
            return X, (Xr, None)

        if norm_paras is None:
            Xr = X[:, ref_channel : ref_channel + 1]  # [B,1,F,T]
            mag = jnp.abs(Xr)
            if self.mode == "frequency":
                if self.online:
                    XrMM = mag + eps  # [B,1,F,T]
                else:
                    XrMM = jnp.mean(mag, axis=3, keepdims=True) + eps  # [B,1,F,1]
            elif self.mode == "forgetting":
                XrMM = forgetting_normalization(mag) + eps  # [B,1,1,T]
            else:  # utterance
                if self.online:
                    XrMM = jnp.mean(mag, axis=2, keepdims=True) + eps  # [B,1,1,T]
                else:
                    XrMM = jnp.mean(mag, axis=(2, 3), keepdims=True) + eps  # [B,1,1,1]
        else:
            Xr, XrMM = norm_paras
        return X / XrMM, (Xr, XrMM)

    def inorm(self, X: jnp.ndarray, norm_paras: Tuple[jnp.ndarray, Optional[jnp.ndarray]]) -> jnp.ndarray:
        """Inverse normalization (reference norm.py:97-108)."""
        _, XrMM = norm_paras
        if XrMM is None:
            return X
        return X * XrMM
