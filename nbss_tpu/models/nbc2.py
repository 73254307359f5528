"""NBC2: revised narrow-band conformer (arXiv 2212.02076).

TPU-native counterpart of /root/reference/models/arch/NBC2.py:152-289. Each
frequency is an independent sequence over time ([B,F] are leading batch dims
throughout — no reshaping to torch's [B*F, H, T]). Pre-norm blocks:

    norm1 -> MHSA over T -> +residual
    norm2 -> Linear up -> (SiLU -> gconv) x2 -> GBN -> SiLU -> gconv -> SiLU
          -> Linear down -> +residual

The signature GroupBatchNorm computes statistics across the F sequences that
share an utterance (group_size = num_freqs) — from the input data in both
train and eval modes (NBC2.py:57-62).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from nbss_tpu.models.base import (
    Conv1d,
    GroupBatchNorm,
    GroupNorm,
    LayerNorm,
    MultiheadAttention,
    torch_bias_init,
)

Dtype = Any

xavier_uniform = nn.initializers.xavier_uniform()


class _XavierDense(nn.Module):
    features: int
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.features, dtype=self.dtype, param_dtype=self.param_dtype,
                        kernel_init=xavier_uniform, bias_init=nn.initializers.zeros)(x)


class _NBC2Norm(nn.Module):
    """LN / GBN / GBNShare / GN / BN-free factory used by NBC2 blocks; GBN
    needs the runtime group size (= num freqs)."""

    kind: str
    num_groups: int = 8
    share: bool = False
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, group_size: int):
        if self.kind == "LN":
            return LayerNorm(param_dtype=self.param_dtype)(x)
        if self.kind == "GBN":
            return GroupBatchNorm(share_along_sequence_dim=self.share,
                                  param_dtype=self.param_dtype)(x, group_size)
        if self.kind == "GBNShare":
            return GroupBatchNorm(share_along_sequence_dim=True,
                                  param_dtype=self.param_dtype)(x, group_size)
        if self.kind == "GN":
            return GroupNorm(num_groups=self.num_groups, param_dtype=self.param_dtype)(x)
        raise KeyError(self.kind)


class NBC2Block(nn.Module):
    dim_hidden: int
    dim_ffn: int
    n_heads: int = 2
    dropout: float = 0.0
    conv_kernel_size: int = 3
    n_conv_groups: int = 8
    norms: Tuple[str, str, str] = ("LN", "GBN", "GBN")
    share_along_sequence_dim: bool = False
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    fused_block: Optional[bool] = None  # None = NBSS_FUSED_BLOCK env

    def setup(self):
        mk = lambda kind: _NBC2Norm(kind, self.n_conv_groups,
                                    self.share_along_sequence_dim,
                                    self.param_dtype)
        self.norm1 = mk(self.norms[0])
        self.self_attn = MultiheadAttention(self.n_heads, dtype=self.dtype,
                                            param_dtype=self.param_dtype)
        self.norm2 = mk(self.norms[1])
        self.linear1 = _XavierDense(self.dim_ffn, dtype=self.dtype,
                                    param_dtype=self.param_dtype)
        self.conv1 = Conv1d(self.dim_ffn, self.conv_kernel_size,
                            groups=self.n_conv_groups, dtype=self.dtype,
                            param_dtype=self.param_dtype)
        self.conv2 = Conv1d(self.dim_ffn, self.conv_kernel_size,
                            groups=self.n_conv_groups, dtype=self.dtype,
                            param_dtype=self.param_dtype)
        self.conv_norm = mk(self.norms[2])
        self.conv3 = Conv1d(self.dim_ffn, self.conv_kernel_size,
                            groups=self.n_conv_groups, dtype=self.dtype,
                            param_dtype=self.param_dtype)
        self.linear2 = _XavierDense(self.dim_hidden, dtype=self.dtype,
                                    param_dtype=self.param_dtype)
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x, group_size: int, deterministic: bool = True,
                 att_mask: Optional[jnp.ndarray] = None):
        """x: [BF, T, H] (each row one narrow-band sequence)."""
        # self-attention block (NBC2.py:208-220)
        if self._use_fused_block(att_mask, deterministic):
            x = self._fused_attn_block(x)
        else:
            y = self.norm1(x, group_size)
            y = self.self_attn(y, att_mask)
            x = x + self.drop(y, deterministic=deterministic)

        # conv feed-forward block (NBC2.py:175-189, 223-225)
        y = self.norm2(x, group_size)
        y = nn.silu(self.linear1(y))
        y = nn.silu(self.conv1(y))
        y = self.conv2(y)
        y = nn.silu(self.conv_norm(y, group_size))
        y = nn.silu(self.conv3(y))
        y = self.drop(y, deterministic=deterministic)
        y = self.linear2(y)
        return x + self.drop(y, deterministic=deterministic)

    def _use_fused_block(self, att_mask, deterministic) -> bool:
        """Route the attention sub-block through the Pallas megakernel
        (ops.attention_block: LN + folded qkv/out projections + attention +
        residual in one kernel). NBC2's pre-norm unmasked MHSA is the
        kernel's exact supported case (reference NBC2.py:171); same
        preconditions and default as SpatialNet's `_use_fused_block`:
        LN pre-norm, no mask, inactive dropout, ON whenever a real
        accelerator backend is active (won every same-session A/B,
        BENCH_NOTES rounds 2-5)."""
        fused = self.fused_block
        if fused is None:
            env = os.environ.get("NBSS_FUSED_BLOCK", "")
            fused = (env == "1" if env
                     else jax.default_backend() != "cpu")
        return (fused and not self.is_initializing()
                and att_mask is None and self.norms[0].upper() == "LN"
                and (deterministic or self.dropout == 0))

    def _fused_attn_block(self, x):
        from nbss_tpu.ops.attention_block import attention_block, fold_weights

        v = lambda m: m.variables["params"]
        ln, A, Wvo, c, eps = fold_weights(
            v(self.norm1)["LayerNorm_0"]["scale"],
            v(self.norm1)["LayerNorm_0"]["bias"],
            v(self.self_attn)["in_proj"]["Dense_0"]["kernel"],
            v(self.self_attn)["in_proj"]["Dense_0"]["bias"],
            v(self.self_attn)["out_proj"]["Dense_0"]["kernel"],
            v(self.self_attn)["out_proj"]["Dense_0"]["bias"], self.n_heads)
        return attention_block(x, ln, A, Wvo, c, eps, self.n_heads)


class NBC2(nn.Module):
    """[B, F, T, dim_input] -> [B, F, T, dim_output]."""

    dim_input: int
    dim_output: int
    n_layers: int
    encoder_kernel_size: int = 5
    dim_hidden: int = 192
    dim_ffn: int = 384
    num_freqs: int = 257
    n_heads: int = 2
    dropout: float = 0.0
    conv_kernel_size: int = 3
    n_conv_groups: int = 8
    norms: Tuple[str, str, str] = ("LN", "GBN", "GBN")
    share_along_sequence_dim: bool = False
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    fused_block: Optional[bool] = None  # None = NBSS_FUSED_BLOCK env

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 att_mask: Optional[jnp.ndarray] = None):
        B, F, T, H0 = x.shape
        dt = self.dtype or x.dtype
        x = x.astype(dt).reshape(B * F, T, H0)
        x = Conv1d(self.dim_hidden, self.encoder_kernel_size, dtype=dt,
                   param_dtype=self.param_dtype, name="encoder")(x)
        for l in range(self.n_layers):
            x = NBC2Block(
                dim_hidden=self.dim_hidden, dim_ffn=self.dim_ffn,
                n_heads=self.n_heads, dropout=self.dropout,
                conv_kernel_size=self.conv_kernel_size,
                n_conv_groups=self.n_conv_groups, norms=self.norms,
                share_along_sequence_dim=self.share_along_sequence_dim,
                dtype=dt, param_dtype=self.param_dtype,
                fused_block=self.fused_block, name=f"block_{l}",
            )(x, F, deterministic, att_mask)
        y = nn.Dense(  # torch-default init (reference decoder is nn.Linear)
            self.dim_output, dtype=dt, param_dtype=self.param_dtype,
            kernel_init=jax.nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            bias_init=torch_bias_init(self.dim_hidden), name="decoder")(x)
        return y.reshape(B, F, T, -1).astype(jnp.float32)
