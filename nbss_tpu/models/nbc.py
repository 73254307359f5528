"""NBC: narrow-band conformer v1 (Interspeech 2022).

TPU-native counterpart of /root/reference/models/arch/NBC.py:25-293.
Each frequency is one sequence over time; blocks are Transformer-XL style:
relative-positional MHSA (with u/v content/position biases) + a conv
feed-forward stack. Encoder is a VALID k=4 temporal conv (shrinks T by k-1);
the ConvTranspose decoder restores the original length.

The relative-position score never materializes a [T, 2T-1] (or [T, T, H])
tensor (reference gathers the embedding table into a [1,T,T,nh,dh] tensor,
NBC.py:123-130). Because the position table is sinusoidal, the angle-sum
identity factorizes it exactly:

    pos_score[i, j] = g_i . PE(i - j) = A_i . cos_j + B_i . sin_j

with g = (q + v_bias) W_pos^T, A = gs*sin_i + gc*cos_i, B = gc*sin_i -
gs*cos_i — plain rank-d_model matmuls. On TPU the whole attention then runs
through the fused narrow-band Pallas kernel (ops/attention.py, forward and
backward) by augmenting each head's features: score = [qu, A, B] .
[k, cos_j, sin_j]^T, so the [.., T, T] scores live only in VMEM.

Reference NBC.py:133-134 adds ``attn_mask`` to an undefined variable (dead
code since masks are never used); here the mask is correctly added to the
scores before softmax.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from nbss_tpu.models.base import Conv1d, ConvTranspose1d, GroupNorm

Dtype = Any
xavier_uniform = nn.initializers.xavier_uniform()


def sinusoidal_relpos_table(T: int, d: int) -> np.ndarray:
    """PE for relative positions [-(T-1) .. T-1] -> [2T-1, d]
    (reference RelativePositionalEncoding, NBC.py:25-70)."""
    positions = np.arange(-(T - 1), T, dtype=np.float64)[:, None]
    denom = np.exp(np.arange(0, d, 2, dtype=np.float64) * -(math.log(10000.0) / d))
    pe = np.zeros((2 * T - 1, d), np.float64)
    pe[:, 0::2] = np.sin(positions * denom)
    pe[:, 1::2] = np.cos(positions * denom)
    return pe.astype(np.float32)


def sincos_position_tables(T: int, d: int):
    """sin/cos of the absolute positions 0..T-1 at the d/2 PE frequencies:
    [T, d//2] each. PE(i-j)[2m] = sin_i cos_j - cos_i sin_j and
    PE(i-j)[2m+1] = cos_i cos_j + sin_i sin_j, which turns the relative
    table lookup into two rank-d/2 matmuls."""
    positions = np.arange(T, dtype=np.float64)[:, None]
    denom = np.exp(np.arange(0, d, 2, dtype=np.float64) * -(math.log(10000.0) / d))
    return (np.sin(positions * denom).astype(np.float32),
            np.cos(positions * denom).astype(np.float32))


class _XavierDense(nn.Module):
    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype,
                        param_dtype=self.param_dtype, kernel_init=xavier_uniform,
                        bias_init=nn.initializers.zeros)(x)


class RelPosMultiHeadAttention(nn.Module):
    """Transformer-XL attention: score = ((q+u)k^T + (q+v)pos^T) / sqrt(d_model)
    (note: reference scales by sqrt(d_model), not sqrt(d_head); NBC.py:90,131)."""

    d_model: int
    num_heads: int
    dropout: float = 0.0
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    force_xla: bool = False  # testing: skip the fused kernel path

    @nn.compact
    def __call__(self, x, att_mask=None, deterministic: bool = True):
        *lead, T, H = x.shape
        nh, dh = self.num_heads, self.d_model // self.num_heads
        dt = self.dtype or x.dtype

        q = _XavierDense(H, dtype=dt, param_dtype=self.param_dtype, name="query_proj")(x)
        k = _XavierDense(H, dtype=dt, param_dtype=self.param_dtype, name="key_proj")(x)
        v = _XavierDense(H, dtype=dt, param_dtype=self.param_dtype, name="value_proj")(x)
        q = q.reshape(*lead, T, nh, dh)
        k = k.reshape(*lead, T, nh, dh)
        v = v.reshape(*lead, T, nh, dh)

        u_bias = self.param("u_bias", xavier_uniform, (nh, dh), self.param_dtype).astype(dt)
        v_bias = self.param("v_bias", xavier_uniform, (nh, dh), self.param_dtype).astype(dt)

        # pos_proj kernel [d_model, H]: applying the Dense to the identity
        # recovers the kernel while keeping the exact reference param tree
        # (pos_proj/Dense_0/kernel) for checkpoints and weight transplants
        Wpos = _XavierDense(H, use_bias=False, dtype=dt, param_dtype=self.param_dtype,
                            name="pos_proj")(jnp.eye(self.d_model, dtype=dt))
        Wpos = Wpos.reshape(self.d_model, nh, dh)
        Wsin, Wcos = Wpos[0::2], Wpos[1::2]  # [d/2, nh, dh] each
        sin_np, cos_np = sincos_position_tables(T, self.d_model)
        sin_t = jnp.asarray(sin_np, dt)  # [T, d/2]
        cos_t = jnp.asarray(cos_np, dt)

        # trig factorization of the relative-position score (module docstring)
        qv = q + v_bias
        gs = jnp.einsum("...qhd,mhd->...qhm", qv, Wsin)  # [.., T, nh, d/2]
        gc = jnp.einsum("...qhd,mhd->...qhm", qv, Wcos)
        A = gs * sin_t[:, None, :] + gc * cos_t[:, None, :]
        Bq = gc * sin_t[:, None, :] - gs * cos_t[:, None, :]

        use_fused = (
            (deterministic or self.dropout == 0.0)
            and len(lead) >= 1 and T > 1 and not self.force_xla
        )
        if use_fused:
            from nbss_tpu.ops.attention import narrowband_attention

            # augment each head: score = [qu, A, B] . [k, cos_j, sin_j]^T.
            # The kernel scales by 1/sqrt(dh') — pre-scale q' to recover the
            # reference's 1/sqrt(d_model) (NBC.py:90,131).
            dhp = dh + self.d_model
            M = int(np.prod(lead))
            fix = math.sqrt(dhp) / math.sqrt(self.d_model)
            qa = jnp.concatenate([(q + u_bias), A, Bq], axis=-1) * jnp.asarray(fix, dt)
            cs = jnp.broadcast_to(
                jnp.concatenate([cos_t, sin_t], axis=-1)[None, :, None, :],
                (M, T, nh, self.d_model)).astype(dt)
            ka = jnp.concatenate([k.reshape(M, T, nh, dh), cs], axis=-1)
            out = narrowband_attention(
                qa.reshape(M, T, nh * dhp), ka.reshape(M, T, nh * dhp),
                v.reshape(M, T, H),
                None if att_mask is None else att_mask, nh, 8)
            out = out.reshape(*lead, T, H)
        else:
            content = jnp.einsum("...qhd,...khd->...hqk", q + u_bias, k,
                                 preferred_element_type=jnp.float32)
            pos_score = (
                jnp.einsum("...qhm,km->...hqk", A, cos_t,
                           preferred_element_type=jnp.float32)
                + jnp.einsum("...qhm,km->...hqk", Bq, sin_t,
                             preferred_element_type=jnp.float32))
            score = (content + pos_score) / math.sqrt(self.d_model)
            if att_mask is not None:
                score = score + att_mask.astype(score.dtype)
            attn = jax.nn.softmax(score.astype(jnp.float32), axis=-1).astype(dt)
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
            out = jnp.einsum("...hqk,...khd->...qhd", attn, v,
                             preferred_element_type=jnp.float32).astype(dt)
            out = out.reshape(*lead, T, H)
        return _XavierDense(H, dtype=dt, param_dtype=self.param_dtype, name="out_proj")(out)

    @staticmethod
    def _rel_shift(x, T):
        return _nbc_rel_shift(x, T)


def _nbc_rel_shift(x, T):
    """x [..., T, 2T-1] with x[.., i, r] = f(i, rel = T-1-r)
    -> out[.., i, j] = f(i, i - j): pad one column left, fold, slice."""
    *lead, Tq, R = x.shape
    x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, 0), (1, 0)])  # [.., T, 2T]
    x = x.reshape(*lead, 2 * T, Tq)
    x = x[..., 1:, :].reshape(*lead, Tq, R)
    return x[..., :T]


class NBCBlock(nn.Module):
    dim_model: int = 192
    num_head: int = 8
    dim_ffn: int = 384
    dropout: float = 0.1
    norm_first: bool = True
    n_conv_groups: int = 8
    conv_kernel_size: int = 3
    conv_bias: bool = True
    n_conv_layers: int = 3
    conv_mid_norm: Optional[str] = "GN"
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    fused_block: Optional[bool] = None  # None = NBSS_FUSED_BLOCK env

    def _use_fused_block(self, att_mask, deterministic) -> bool:
        """Whether to run x + self_attn(norm1(x)) through the rel-pos Pallas
        megakernel (ops.attention_block.attention_block_relpos): pre-LN +
        folded q/k/v/out projections + trig-factorized Transformer-XL
        position scores + residual in one kernel pass. Requires norm_first,
        no mask, inactive dropout.

        Default (fused_block=None, no NBSS_FUSED_BLOCK env): ON whenever a
        real accelerator backend is active (see SpatialNet._use_fused_block);
        off on the interpret-only CPU backend."""
        import os

        import jax

        fused = self.fused_block
        if fused is None:
            env = os.environ.get("NBSS_FUSED_BLOCK", "")
            fused = (env == "1" if env
                     else jax.default_backend() != "cpu")
        return (fused and not self.is_initializing() and self.norm_first
                and att_mask is None and (deterministic or self.dropout == 0))

    def _fused_sa_block(self, x):
        from nbss_tpu.ops.attention_block import (attention_block_relpos,
                                                  fold_weights_nbc)

        M, T, H = x.shape
        p = self.variables["params"]
        sa = p["self_attn"]
        d = lambda m: (sa[m]["Dense_0"]["kernel"], sa[m]["Dense_0"]["bias"])
        (wq, bq), (wk, bk), (wv, bv), (wo, bo) = (
            d("query_proj"), d("key_proj"), d("value_proj"), d("out_proj"))
        ln, A, Gs, Gc, Wvo, c, eps = fold_weights_nbc(
            p["norm1"]["scale"], p["norm1"]["bias"], wq, bq, wk, bk, wv, bv,
            wo, bo, sa["pos_proj"]["Dense_0"]["kernel"], sa["u_bias"],
            sa["v_bias"], self.num_head)
        sin_np, cos_np = sincos_position_tables(T, self.dim_model)
        return attention_block_relpos(
            x, ln, A, Gs, Gc, Wvo, c, jnp.asarray(sin_np), jnp.asarray(cos_np),
            eps, self.num_head)

    @nn.compact
    def __call__(self, x, deterministic: bool = True, att_mask=None):
        from nbss_tpu.models.base import LayerNorm

        norm1 = LayerNorm(param_dtype=self.param_dtype, name="norm1")
        norm2 = LayerNorm(param_dtype=self.param_dtype, name="norm2")

        def sa(z):
            z = RelPosMultiHeadAttention(
                self.dim_model, self.num_head, self.dropout, dtype=self.dtype,
                param_dtype=self.param_dtype, name="self_attn",
            )(z, att_mask, deterministic)
            return nn.Dropout(self.dropout)(z, deterministic=deterministic)

        def ff(z):
            z = _XavierDense(self.dim_ffn, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="linear1")(z)
            z = nn.silu(z)
            for l in range(self.n_conv_layers):
                z = Conv1d(self.dim_ffn, self.conv_kernel_size,
                           groups=self.n_conv_groups, use_bias=self.conv_bias,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name=f"conv_{l}")(z)
                if self.conv_mid_norm == "GN":
                    z = GroupNorm(num_groups=8, param_dtype=self.param_dtype,
                                  name=f"conv_norm_{l}")(z)
                elif self.conv_mid_norm is not None:
                    raise KeyError(self.conv_mid_norm)
                z = nn.silu(z)
            z = nn.Dropout(self.dropout)(z, deterministic=deterministic)
            z = _XavierDense(self.dim_model, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="linear2")(z)
            return nn.Dropout(self.dropout)(z, deterministic=deterministic)

        if self.norm_first:
            if self._use_fused_block(att_mask, deterministic):
                x = self._fused_sa_block(x)
            else:
                x = x + sa(norm1(x))
            x = x + ff(norm2(x))
        else:
            x = norm1(x + sa(x))
            x = norm2(x + ff(x))
        return x


class NBC(nn.Module):
    """[B, F, T, dim_input] -> [B, F, T, dim_output]."""

    dim_input: int = 16
    dim_output: int = 4
    n_layers: int = 4
    encoder_kernel_size: int = 4
    n_heads: int = 8
    hidden_size: int = 192
    norm_first: bool = True
    ffn_size: int = 384
    inner_conv_kernel_size: int = 3
    inner_conv_groups: int = 8
    inner_conv_bias: bool = True
    inner_conv_layers: int = 3
    inner_conv_mid_norm: Optional[str] = "GN"
    dropout: float = 0.1
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    fused_block: Optional[bool] = None  # None = NBSS_FUSED_BLOCK env

    @nn.compact
    def __call__(self, x, deterministic: bool = True, att_mask=None):
        B, F, T, H0 = x.shape
        dt = self.dtype or x.dtype
        x = x.astype(dt).reshape(B * F, T, H0)
        # VALID conv: T -> T - k + 1 (reference NBC.py:261)
        x = Conv1d(self.hidden_size, self.encoder_kernel_size, padding="valid",
                   dtype=dt, param_dtype=self.param_dtype, name="encoder")(x)
        for l in range(self.n_layers):
            x = NBCBlock(
                dim_model=self.hidden_size, num_head=self.n_heads,
                dim_ffn=self.ffn_size, dropout=self.dropout,
                norm_first=self.norm_first, n_conv_groups=self.inner_conv_groups,
                conv_kernel_size=self.inner_conv_kernel_size,
                conv_bias=self.inner_conv_bias, n_conv_layers=self.inner_conv_layers,
                conv_mid_norm=self.inner_conv_mid_norm, dtype=dt,
                param_dtype=self.param_dtype, fused_block=self.fused_block,
                name=f"block_{l}",
            )(x, deterministic, att_mask)
        # transposed conv restores T (reference NBC.py:280)
        y = ConvTranspose1d(self.dim_output, self.encoder_kernel_size, dtype=dt,
                            param_dtype=self.param_dtype, name="decoder")(x)
        return y.reshape(B, F, T, -1).astype(jnp.float32)
