"""SpatialNet (offline): joint separation + denoising + dereverberation.

TPU-native re-design of the reference architecture
(/root/reference/models/arch/SpatialNet.py:12-220). Each layer is

    cross-band block:  fconv1 -> full-band linear -> fconv2
    narrow-band block: MHSA over T (each frequency = one batch item)
                       -> temporal conv-FFN

Design differences from the torch implementation (behavior-equivalent):

- Canonical channel-last layout [B, F, T, H]; frequency-axis ops transpose to
  [B, T, F, H] instead of reshaping to torch's NCW. All pointwise convs are
  Dense matmuls on the MXU; grouped convs run in XLA NWC layout.
- The optionally layer-shared full-band LinearGroup (SpatialNet.py:178-196,
  ``full_share``) is owned by the top-level module and passed into layers, so
  flax parameter sharing is explicit.
- Attention batches [B, F] as leading dims directly (no reshape), fp32
  softmax inside a bf16 network.
- ``remat`` wraps each layer in jax.checkpoint for long-utterance training.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from nbss_tpu.models.base import (
    Conv1d,
    Dense,
    LinearGroup,
    MultiheadAttention,
    PReLU,
    new_norm,
)

Dtype = Any


class SpatialNetLayer(nn.Module):
    dim_hidden: int
    dim_ffn: int
    dim_squeeze: int
    num_freqs: int
    num_heads: int
    dropout: Tuple[float, float, float] = (0, 0, 0)
    kernel_size: Tuple[int, int] = (5, 3)
    conv_groups: Tuple[int, int] = (8, 8)
    norms: Sequence[str] = ("LN", "LN", "GN", "LN", "LN", "LN")
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    fused_ffn: Optional[bool] = None  # None = auto (TPU backend only)
    fused_block: Optional[bool] = None  # None = NBSS_FUSED_BLOCK env

    def setup(self):
        H, FF = self.dim_hidden, self.dim_ffn
        f_groups, t_groups = self.conv_groups
        f_k, t_k = self.kernel_size
        # cross-band: two frequency-conv modules around the full-band module
        self.fconv1_norm = new_norm(self.norms[3], num_groups=f_groups)
        self.fconv1_conv = Conv1d(H, f_k, groups=f_groups, dtype=self.dtype,
                                  param_dtype=self.param_dtype)
        self.fconv1_act = PReLU(H, param_dtype=self.param_dtype)
        self.norm_full = new_norm(self.norms[5], num_groups=f_groups)
        self.squeeze = Dense(self.dim_squeeze, dtype=self.dtype, param_dtype=self.param_dtype)
        self.unsqueeze = Dense(H, dtype=self.dtype, param_dtype=self.param_dtype)
        self.fconv2_norm = new_norm(self.norms[4], num_groups=f_groups)
        self.fconv2_conv = Conv1d(H, f_k, groups=f_groups, dtype=self.dtype,
                                  param_dtype=self.param_dtype)
        self.fconv2_act = PReLU(H, param_dtype=self.param_dtype)
        # narrow-band: MHSA over T + temporal conv-FFN
        self.norm_mhsa = new_norm(self.norms[0], num_groups=t_groups)
        self.mhsa = MultiheadAttention(self.num_heads, dtype=self.dtype,
                                       param_dtype=self.param_dtype)
        self.dropout_mhsa = nn.Dropout(self.dropout[0])
        self.tconvffn_norm = new_norm(self.norms[1], num_groups=t_groups)
        self.tconvffn_up = Dense(FF, dtype=self.dtype, param_dtype=self.param_dtype)
        self.tconvffn_conv1 = Conv1d(FF, t_k, groups=t_groups, dtype=self.dtype,
                                     param_dtype=self.param_dtype)
        self.tconvffn_conv2 = Conv1d(FF, t_k, groups=t_groups, dtype=self.dtype,
                                     param_dtype=self.param_dtype)
        self.tconvffn_midnorm = new_norm(self.norms[2], num_groups=t_groups)
        self.tconvffn_conv3 = Conv1d(FF, t_k, groups=t_groups, dtype=self.dtype,
                                     param_dtype=self.param_dtype)
        self.tconvffn_down = Dense(H, dtype=self.dtype, param_dtype=self.param_dtype)
        self.dropout_tconvffn = nn.Dropout(self.dropout[1])
        self.dropout_full = nn.Dropout(self.dropout[2])

    def __call__(self, x, full: nn.Module, deterministic: bool = True,
                 att_mask: Optional[jnp.ndarray] = None):
        """x: [B, F, T, H] -> [B, F, T, H].

        The whole cross-band block runs in [B, T, F, H] layout with a single
        transpose in/out (all three sub-blocks operate along F), instead of
        transposing around each sub-block."""
        xt = jnp.swapaxes(x, 1, 2)  # [B, T, F, H]
        xt = xt + self._fconv(self.fconv1_norm, self.fconv1_conv, self.fconv1_act, xt)
        xt = xt + self._full(xt, full, deterministic)
        xt = xt + self._fconv(self.fconv2_norm, self.fconv2_conv, self.fconv2_act, xt)
        x = jnp.swapaxes(xt, 1, 2)  # [B, F, T, H]
        if self._use_fused_block(att_mask, deterministic):
            x = self._fused_tsa_block(x)
        else:
            x = x + self.dropout_mhsa(self._tsa(x, att_mask), deterministic=deterministic)
        x = x + self.dropout_tconvffn(self._tconvffn(x), deterministic=deterministic)
        return x

    def _use_fused_block(self, att_mask, deterministic) -> bool:
        """Whether to run the narrow-band block through the Pallas megakernel
        (ops.attention_block): LN + folded qkv/out projections + attention +
        residual in one kernel (hand-written Pallas fwd AND bwd). Requires
        the default LN pre-norm, no mask and inactive attention dropout.

        Default (fused_block=None, no NBSS_FUSED_BLOCK env): ON whenever a
        real accelerator backend is active — the megakernel won every
        same-session A/B vs the XLA and pallas-attention paths (+16.6%,
        BENCH_NOTES rounds 2-4). On the CPU backend kernels only run
        interpreted (slow), so the default there stays off."""
        fused = self.fused_block
        if fused is None:
            env = os.environ.get("NBSS_FUSED_BLOCK", "")
            fused = (env == "1" if env
                     else jax.default_backend() != "cpu")
        return (fused and not self.is_initializing()
                and att_mask is None and self.norms[0].upper() == "LN"
                and (deterministic or self.dropout[0] == 0))

    def _fused_tsa_block(self, x):
        from nbss_tpu.ops.attention_block import attention_block, fold_weights

        B, F, T, H = x.shape
        v = lambda m: m.variables["params"]
        ln, A, Wvo, c, eps = fold_weights(
            v(self.norm_mhsa)["scale"], v(self.norm_mhsa)["bias"],
            v(self.mhsa)["in_proj"]["Dense_0"]["kernel"],
            v(self.mhsa)["in_proj"]["Dense_0"]["bias"],
            v(self.mhsa)["out_proj"]["Dense_0"]["kernel"],
            v(self.mhsa)["out_proj"]["Dense_0"]["bias"], self.num_heads)
        y = attention_block(x.reshape(B * F, T, H), ln, A, Wvo, c, eps,
                            self.num_heads)
        return y.reshape(B, F, T, H)

    def _fconv(self, norm, conv, act, xt):
        """Frequency-convolutional module (SpatialNet.py:116-127): LN over H,
        grouped conv along F at each frame, PReLU. xt: [B, T, F, H]."""
        return act(conv(norm(xt)))

    def _full(self, xt, full, deterministic):
        """Full-band linear module (SpatialNet.py:129-146): squeeze H->S,
        per-squeezed-channel F->F dense map, unsqueeze S->H. xt: [B,T,F,H]."""
        y = self.norm_full(xt)
        y = nn.silu(self.squeeze(y))  # [B, T, F, S]
        if self.dropout[2] > 0:
            # drop entire frequencies of an utterance (Dropout2d on [B,F,...])
            B, T, F, S = y.shape
            keep = self.dropout_full(jnp.ones((B, 1, F, 1), y.dtype), deterministic=deterministic)
            y = y * keep
        y = jnp.swapaxes(y, -1, -2)  # [B, T, S, F]
        y = full(y)  # LinearGroup over F per squeezed channel
        y = jnp.swapaxes(y, -1, -2)  # [B, T, F, S]
        return nn.silu(self.unsqueeze(y))  # [B, T, F, H]

    def _tsa(self, x, att_mask):
        """Narrow-band MHSA over T, each (batch, frequency) an independent
        sequence (SpatialNet.py:93-100)."""
        y = self.norm_mhsa(x)
        return self.mhsa(y, attn_mask=att_mask)

    def _tconvffn(self, x):
        """Temporal conv-FFN (SpatialNet.py:61-73,102-114): 1x1 up, three
        grouped temporal convs with a mid GroupNorm, 1x1 down. On TPU the
        whole chain runs as one fused Pallas kernel (ops.tconvffn) when the
        default norms (LN, mid GN) are in use."""
        # NOTE: measured on v5e, XLA's fusion of the unfused chain beats the
        # pallas kernel inside the full model (the kernel only ties the
        # isolated chain), so the kernel is opt-in rather than auto
        fused = bool(self.fused_ffn)
        fused = (fused and not self.is_initializing()
                 and self.norms[1].upper() == "LN" and self.norms[2].upper() == "GN"
                 and self.kernel_size[1] == 3)
        if fused:
            from nbss_tpu.ops.tconvffn import expand_grouped_kernel, fused_tconvffn

            B, F, T, H = x.shape
            v = lambda m: m.variables["params"]
            groups = self.conv_groups[1]
            p = {
                "ln_scale": v(self.tconvffn_norm)["scale"],
                "ln_bias": v(self.tconvffn_norm)["bias"],
                "w_up": v(self.tconvffn_up)["Dense_0"]["kernel"],
                "b_up": v(self.tconvffn_up)["Dense_0"]["bias"],
                "w_c1": expand_grouped_kernel(v(self.tconvffn_conv1)["Conv_0"]["kernel"], groups),
                "b_c1": v(self.tconvffn_conv1)["Conv_0"]["bias"],
                "w_c2": expand_grouped_kernel(v(self.tconvffn_conv2)["Conv_0"]["kernel"], groups),
                "b_c2": v(self.tconvffn_conv2)["Conv_0"]["bias"],
                "gn_scale": v(self.tconvffn_midnorm)["scale"],
                "gn_bias": v(self.tconvffn_midnorm)["bias"],
                "w_c3": expand_grouped_kernel(v(self.tconvffn_conv3)["Conv_0"]["kernel"], groups),
                "b_c3": v(self.tconvffn_conv3)["Conv_0"]["bias"],
                "w_down": v(self.tconvffn_down)["Dense_0"]["kernel"],
                "b_down": v(self.tconvffn_down)["Dense_0"]["bias"],
            }
            y = fused_tconvffn(x.reshape(B * F, T, H), p, groups)
            return y.reshape(B, F, T, H)
        y = self.tconvffn_norm(x)
        y = nn.silu(self.tconvffn_up(y))
        y = nn.silu(self.tconvffn_conv1(y))
        y = self.tconvffn_conv2(y)
        y = nn.silu(self.tconvffn_midnorm(y))
        y = nn.silu(self.tconvffn_conv3(y))
        return self.tconvffn_down(y)


class SpatialNet(nn.Module):
    """See module docstring. Input [B, F, T, dim_input] -> [B, F, T, dim_output]."""

    dim_input: int
    dim_output: int
    dim_squeeze: int
    num_layers: int
    num_freqs: int
    encoder_kernel_size: int = 5
    dim_hidden: int = 192
    dim_ffn: int = 384
    num_heads: int = 2
    dropout: Tuple[float, float, float] = (0, 0, 0)
    kernel_size: Tuple[int, int] = (5, 3)
    conv_groups: Tuple[int, int] = (8, 8)
    norms: Sequence[str] = ("LN", "LN", "GN", "LN", "LN", "LN")
    full_share: int = 0  # layers > full_share reuse layer full_share's LinearGroup
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    remat: bool = False
    fused_ffn: Optional[bool] = None  # None = auto (TPU backend only)
    fused_block: Optional[bool] = None  # None = NBSS_FUSED_BLOCK env

    def setup(self):
        self.encoder = Conv1d(self.dim_hidden, self.encoder_kernel_size,
                              dtype=self.dtype, param_dtype=self.param_dtype)
        layer_cls = nn.remat(SpatialNetLayer, static_argnums=(3,)) if self.remat else SpatialNetLayer
        self.layers = [
            layer_cls(
                dim_hidden=self.dim_hidden,
                dim_ffn=self.dim_ffn,
                dim_squeeze=self.dim_squeeze,
                num_freqs=self.num_freqs,
                num_heads=self.num_heads,
                dropout=self.dropout,
                kernel_size=self.kernel_size,
                conv_groups=self.conv_groups,
                norms=self.norms,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                fused_ffn=self.fused_ffn,
                fused_block=self.fused_block,
                name=f"layer_{l}",
            )
            for l in range(self.num_layers)
        ]
        # full-band modules: one per layer up to full_share, then shared
        self.fulls = [
            LinearGroup(self.num_freqs, self.num_freqs, num_groups=self.dim_squeeze,
                        dtype=self.dtype, param_dtype=self.param_dtype, name=f"full_{l}")
            for l in range(min(self.full_share, self.num_layers - 1) + 1)
        ]
        self.decoder = Dense(self.dim_output, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, x, deterministic: bool = True,
                 att_mask: Optional[jnp.ndarray] = None):
        dt = self.dtype or x.dtype
        x = x.astype(dt)
        x = self.encoder(x)  # conv over T per (B, F)
        for l, layer in enumerate(self.layers):
            full = self.fulls[min(l, len(self.fulls) - 1)]
            x = layer(x, full, deterministic, att_mask)
        return self.decoder(x).astype(jnp.float32)
