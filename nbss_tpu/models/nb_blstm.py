"""NB-BLSTM: the original narrow-band BLSTM separator (ICASSP 2022).

TPU-native counterpart of /root/reference/models/arch/blstm2_fc1.py:6-69:
two bidirectional LSTM layers (hidden 256 then 128) over each narrow-band
[B*F, T] sequence, then a per-frame linear decoder. LSTMs run as
``lax.scan`` state machines (flax nn.RNN over OptimizedLSTMCell) — the
cuDNN-fused-kernel role is played by XLA's scan + MXU gate matmuls, batched
over B*F sequences.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class BiLSTM(nn.Module):
    hidden_size: int
    num_layers: int = 1
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for l in range(self.num_layers):
            fwd = nn.RNN(
                nn.OptimizedLSTMCell(self.hidden_size, dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name=f"fwd_{l}"),
            )
            bwd = nn.RNN(
                nn.OptimizedLSTMCell(self.hidden_size, dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name=f"bwd_{l}"),
                reverse=True, keep_order=True,
            )
            x = jnp.concatenate([fwd(x), bwd(x)], axis=-1)
        return x


class BLSTM2_FC1(nn.Module):
    """[B, F, T, dim_input] -> [B, F, T, dim_output]."""

    dim_input: int
    dim_output: int
    hidden_size: Tuple[int, int] = (256, 128)
    n_repeat_last_lstm: int = 1
    dropout: Optional[float] = None
    activation: Optional[str] = ""
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, att_mask=None):
        B, F, T, H0 = x.shape
        dt = self.dtype or x.dtype
        x = x.astype(dt).reshape(B * F, T, H0)
        x = BiLSTM(self.hidden_size[0], dtype=dt, param_dtype=self.param_dtype,
                   name="blstm1")(x)
        if self.dropout:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = BiLSTM(self.hidden_size[1], num_layers=self.n_repeat_last_lstm,
                   dtype=dt, param_dtype=self.param_dtype, name="blstm2")(x)
        if self.dropout:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        y = nn.Dense(self.dim_output, dtype=dt, param_dtype=self.param_dtype,
                     name="linear")(x)
        if self.activation:
            y = getattr(nn, self.activation.lower())(y)
        return y.reshape(B, F, T, -1).astype(jnp.float32)
