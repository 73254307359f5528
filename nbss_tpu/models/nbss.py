"""NBSS: self-contained time-domain module (papers 1-3 wrapper).

TPU-native counterpart of /root/reference/models/arch/NBSS.py:20-99: its own
STFT (n_fft=512, hop=256 defaults), per-frequency mean-magnitude input
normalization (eps=1e-8), a narrow-band arch (NB_BLSTM / NBC / NBC2), inverse
normalization, and iSTFT back to waveforms. Use TrainModule for the full
training stack; this module mirrors the reference's standalone API
(waveform in -> separated waveforms out).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from nbss_tpu.io.stft import STFT
from nbss_tpu.models.nb_blstm import BLSTM2_FC1
from nbss_tpu.models.nbc import NBC
from nbss_tpu.models.nbc2 import NBC2

Dtype = Any


class NBSS(nn.Module):
    n_channel: int = 8
    n_speaker: int = 2
    n_fft: int = 512
    n_overlap: int = 256
    ref_channel: int = 0
    arch: str = "NB_BLSTM"  # NB_BLSTM | NBC | NBC2
    arch_kwargs: Optional[Dict[str, Any]] = None
    dtype: Optional[Dtype] = None

    def setup(self):
        kwargs = dict(self.arch_kwargs or {})
        kwargs.setdefault("dtype", self.dtype)
        dim_in, dim_out = self.n_channel * 2, self.n_speaker * 2
        if self.arch == "NB_BLSTM":
            self.net = BLSTM2_FC1(dim_input=dim_in, dim_output=dim_out, **kwargs)
        elif self.arch == "NBC":
            self.net = NBC(dim_input=dim_in, dim_output=dim_out, **kwargs)
        elif self.arch == "NBC2":
            self.net = NBC2(dim_input=dim_in, dim_output=dim_out, **kwargs)
        else:
            raise KeyError(self.arch)
        self._stft = STFT(n_fft=self.n_fft, n_hop=self.n_overlap)

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """x: [B, C, T] waveforms -> [B, Spk, T] separated waveforms."""
        B, C, T = x.shape
        X, olen = self._stft.stft(x)  # [B, C, F, TF] complex
        X = jnp.transpose(X, (0, 2, 3, 1))  # [B, F, TF, C]
        _, F, TF, _ = X.shape

        # per-frequency mean-magnitude normalization (NBSS.py:73-77)
        Xr = X[..., self.ref_channel]  # [B, F, TF]
        XrMM = jnp.mean(jnp.abs(Xr), axis=2)  # [B, F]
        X = X / (XrMM[:, :, None, None] + 1e-8)

        Xin = jnp.stack([X.real, X.imag], axis=-1).reshape(B, F, TF, C * 2)
        out = self.net(Xin, deterministic=deterministic)  # [B, F, TF, 2*Spk]
        out = out.astype(jnp.float32).reshape(B, F, TF, self.n_speaker, 2)
        Ys = jax.lax.complex(out[..., 0], out[..., 1])  # [B, F, TF, Spk]

        # inverse normalization + iSTFT with frequency binding (NBSS.py:90-98)
        Ys = Ys * XrMM[:, :, None, None]
        Ys = jnp.transpose(Ys, (0, 3, 1, 2))  # [B, Spk, F, TF]
        return self._stft.istft(Ys, olen)  # [B, Spk, T]
