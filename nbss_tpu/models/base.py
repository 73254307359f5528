"""Shared building blocks for the narrow-band architectures.

Channel-LAST by design: every primitive operates on ``[..., seq, H]`` tensors
(hidden dim in the lane dimension), so convs use XLA's NWC layout and all
pointwise projections are plain MXU matmuls — no torch-style NCW transposes.

Functional counterparts of /root/reference/models/arch/base/{norm.py,
linear_group.py,non_linear.py}: LayerNorm/GroupNorm/GroupBatchNorm/gLN
(norm.py:11-247), LinearGroup (linear_group.py:7-37), PReLU
(non_linear.py:5-33). Weight initializers follow torch's Linear/Conv defaults
(kaiming-uniform a=sqrt(5) + fan-in uniform bias) so training dynamics match
the reference.
"""

from __future__ import annotations

import math
import os
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

# torch nn.Linear / nn.Conv default weight init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
torch_kernel_init = jax.nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Dense(nn.Module):
    """nn.Dense with torch-default initialization."""

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
        )(x)


class _ConvCore(nn.Module):
    """nn.Conv-compatible core ('kernel'/'bias' param names and shapes) whose
    apply keeps one extra leading dim as a kernel-size-1 spatial dim.

    Rationale: flax nn.Conv merges all leading dims into the conv batch dim;
    when two DIFFERENTLY-SHARDED dims (e.g. batch on 'data', frequency on
    'freq') are merged, XLA's SPMD partitioner mis-scales grouped-conv
    (feature_group_count > 1) kernel gradients by the second mesh-axis size
    (observed exactly 2x on a (data, freq) mesh; regression test
    tests/test_train.py::test_mesh_1d_vs_2d_equivalence). Treating the extra
    dim as an NHWC spatial dim with kernel 1 keeps the gradient partitioning
    exact and is the same conv for XLA otherwise."""

    features: int
    kernel_size: int
    groups: int
    stride: int
    use_bias: bool
    dtype: Optional[Dtype]
    param_dtype: Dtype

    @nn.compact
    def __call__(self, x, pad):
        k = self.kernel_size
        in_g = x.shape[-1] // self.groups
        fan_in = in_g * k
        w = self.param("kernel", torch_kernel_init, (k, in_g, self.features),
                       self.param_dtype)
        dt = self.dtype or x.dtype
        x, w = x.astype(dt), w.astype(dt)
        if x.ndim == 4:
            y = jax.lax.conv_general_dilated(
                x, w[None], (1, self.stride), [(0, 0), pad],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups)
        else:
            y = jax.lax.conv_general_dilated(
                x, w, (self.stride,), [pad],
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=self.groups)
        if self.use_bias:
            b = self.param("bias", torch_bias_init(fan_in), (self.features,),
                           self.param_dtype)
            y = y + b.astype(dt)
        return y


class Conv1d(nn.Module):
    """1-D conv on [..., W, C] (NWC). groups = feature_group_count.

    padding: 'same' | 'valid' | explicit (lo, hi) — 'causal' pads left only.
    """

    features: int
    kernel_size: int
    groups: int = 1
    stride: int = 1
    padding: Any = "same"
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        if self.padding == "causal":
            pad = (k - 1, 0)
        elif isinstance(self.padding, tuple):
            pad = self.padding
        elif self.padding.lower() == "valid":
            pad = (0, 0)
        else:  # 'same' (stride-1 semantics, matches XLA SAME / torch 'same')
            assert self.padding.lower() == "same" and self.stride == 1, self.padding
            pad = ((k - 1) // 2, k - 1 - (k - 1) // 2)
        lead = x.shape[:-2]
        # keep at most one extra leading dim as a spatial dim (see _ConvCore);
        # collapse anything beyond to 4-D
        if x.ndim > 4:
            x = x.reshape((-1,) + x.shape[-3:])
        core = _ConvCore(self.features, k, self.groups, self.stride,
                         self.use_bias, self.dtype, self.param_dtype,
                         name="Conv_0")
        y = core(x, pad)
        return y.reshape(lead + y.shape[-2:])


class ConvTranspose1d(nn.Module):
    """Transposed 1-D conv on [..., W, C] (torch ConvTranspose1d semantics:
    out_len = (W - 1) * stride + kernel_size with padding=0)."""

    features: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1] * self.kernel_size  # torch convT fan_in uses in_channels*k
        lead = x.shape[:-2]
        x = x.reshape((-1,) + x.shape[-2:])
        y = nn.ConvTranspose(
            self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding="VALID",
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
        )(x)
        return y.reshape(lead + y.shape[-2:])


class PReLU(nn.Module):
    """Per-channel PReLU on the last axis (torch init 0.25)."""

    num_parameters: int = 1
    init: float = 0.25
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = self.param(
            "alpha",
            lambda key, shape, dtype: jnp.full(shape, self.init, dtype),
            (self.num_parameters,),
            self.param_dtype,
        ).astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


def new_non_linear(name: str, dim_hidden: int) -> Callable:
    """Activation factory (reference non_linear.py:19-33); channel-last only."""
    name = name.lower()
    if name == "prelu":
        return PReLU(num_parameters=dim_hidden)
    fns = {
        "silu": nn.silu,
        "sigmoid": nn.sigmoid,
        "relu": nn.relu,
        "leakyrelu": lambda x: nn.leaky_relu(x, 0.01),
        "elu": nn.elu,
    }
    if name not in fns:
        raise KeyError(name)
    return fns[name]


def _norm_stats(x: jnp.ndarray, axes: Sequence[int], eps: float) -> jnp.ndarray:
    """(x - mean) * rsqrt(var + eps) with fp32 statistics."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=tuple(axes), keepdims=True)
    var = jnp.mean(jnp.square(x32), axis=tuple(axes), keepdims=True) - jnp.square(mean)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class LayerNorm(nn.Module):
    """LN over the last (hidden) axis, torch eps=1e-5, fp32 statistics."""

    eps: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        H = x.shape[-1]
        y = _norm_stats(x, [-1], self.eps)
        w = self.param("scale", nn.initializers.ones, (H,), self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (H,), self.param_dtype)
        return y * w.astype(x.dtype) + b.astype(x.dtype)


class GroupNorm(nn.Module):
    """torch nn.GroupNorm semantics on channel-last input [..., seq, H]:
    per leading sample, per channel-group, stats over (seq, H/G)."""

    num_groups: int
    eps: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        *lead, S, H = x.shape
        G = self.num_groups
        assert H % G == 0, (H, G)
        xg = x.reshape(*lead, S, G, H // G)
        y = _norm_stats(xg, [-3, -1], self.eps).reshape(x.shape)
        w = self.param("scale", nn.initializers.ones, (H,), self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (H,), self.param_dtype)
        return y * w.astype(x.dtype) + b.astype(x.dtype)


class GlobalLayerNorm(nn.Module):
    """gLN: stats over (seq, hidden) per sample (reference norm.py:30-60)."""

    eps: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        H = x.shape[-1]
        y = _norm_stats(x, [-2, -1], self.eps)
        w = self.param("scale", nn.initializers.ones, (H,), self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (H,), self.param_dtype)
        return y * w.astype(x.dtype) + b.astype(x.dtype)


class GroupBatchNorm(nn.Module):
    """Group batch norm over the sequences that share an utterance.

    Reference semantics (norm.py:94-225 / NBC2.py:57-149): the input batch is
    ``num_utterances * group_size`` narrow-band sequences; statistics are
    computed per utterance across (group member, hidden) — and additionally
    the sequence dim when ``share_along_sequence_dim`` — then an affine
    transform over hidden is applied. Statistics come from the *input data*
    in both training and eval modes (no running stats).

    Input here: [B * group_size, seq, H] (channel-last), plus the runtime
    ``group_size``.
    """

    share_along_sequence_dim: bool = False
    eps: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, group_size: int):
        BG, S, H = x.shape
        assert BG % group_size == 0, (BG, group_size)
        xg = x.reshape(BG // group_size, group_size, S, H)
        axes = (1, 2, 3) if self.share_along_sequence_dim else (1, 3)
        y = _norm_stats(xg, axes, self.eps).reshape(x.shape)
        w = self.param("scale", nn.initializers.ones, (H,), self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (H,), self.param_dtype)
        return y * w.astype(x.dtype) + b.astype(x.dtype)


def new_norm(norm_type: str, *, num_groups: Optional[int] = None) -> nn.Module:
    """Norm factory over channel-last tensors (reference norm.py:232-247)."""
    t = norm_type.upper()
    if t == "LN":
        return LayerNorm()
    if t == "GN":
        return GroupNorm(num_groups=num_groups)
    if t == "GLN":
        return GlobalLayerNorm()
    if t == "GBN":
        return GroupBatchNorm(share_along_sequence_dim=False)
    if norm_type == "GBNShare":
        return GroupBatchNorm(share_along_sequence_dim=True)
    raise KeyError(norm_type)


class LinearGroup(nn.Module):
    """Per-group dense map: x [..., G, F_in] -> [..., G, F_out] with weight
    [G, F_out, F_in] (reference linear_group.py:29-34). This is SpatialNet's
    full-band F->F mixing with G = dim_squeeze."""

    in_features: int
    out_features: int
    num_groups: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            torch_kernel_init,
            (self.num_groups, self.out_features, self.in_features),
            self.param_dtype,
        )
        dt = self.dtype or x.dtype
        y = jnp.einsum(
            "...gh,gkh->...gk", x.astype(dt), w.astype(dt),
            preferred_element_type=jnp.float32,
        ).astype(dt)
        if self.use_bias:
            b = self.param(
                "bias", torch_bias_init(self.in_features),
                (self.num_groups, self.out_features), self.param_dtype,
            )
            y = y + b.astype(dt)
        return y


class MultiheadAttention(nn.Module):
    """Self-attention over the sequence axis of [..., T, H].

    Packed qkv projection + output projection, matching torch
    nn.MultiheadAttention's parameterization (for checkpoint transplant) with
    scale 1/sqrt(head_dim) and fp32 softmax. ``attn_mask`` is additive
    ([T, T] or [nh, T, T] float, -inf for masked) or boolean (True = masked).

    ``fused``: use the Pallas narrow-band attention kernel
    (nbss_tpu.ops.attention) that keeps each sequence's score matrix in VMEM
    — ~10x less HBM traffic for the B*F-batched short sequences here. None
    (default) enables it on TPU backends only.
    """

    num_heads: int
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    fused: Optional[bool] = None

    @nn.compact
    def __call__(self, x, attn_mask=None):
        *lead, T, H = x.shape
        nh = self.num_heads
        dh = H // nh
        assert nh * dh == H, (H, nh)
        dt = self.dtype or x.dtype

        qkv = Dense(3 * H, dtype=dt, param_dtype=self.param_dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        fused = self.fused
        if fused is None:
            # NBSS_ATTN=xla|pallas overrides the backend auto-pick (read at
            # trace time). bench.py uses it to stage a fast-compiling XLA
            # fallback before attempting the Mosaic kernel compile.
            env = os.environ.get("NBSS_ATTN", "").lower()
            if env in ("xla", "0"):
                fused = False
            elif env in ("pallas", "1"):
                fused = True
            else:
                fused = jax.default_backend() == "tpu"
        if attn_mask is not None and attn_mask.ndim > 3:
            fused = False  # per-item masks not supported by the kernel

        if fused:
            from nbss_tpu.ops.attention import narrowband_attention

            mask = attn_mask
            if mask is not None:
                if mask.dtype == jnp.bool_:
                    mask = jnp.where(mask, jnp.float32(-1e30), jnp.float32(0.0))
                mask = jnp.maximum(mask.astype(jnp.float32), -1e30)
            M = int(np.prod(lead)) if lead else 1
            out = narrowband_attention(q.reshape(M, T, H), k.reshape(M, T, H),
                                       v.reshape(M, T, H), mask, nh)
            out = out.reshape(*lead, T, H)
        else:
            def heads(t):
                return t.reshape(*lead, T, nh, dh)

            q, k, v = heads(q), heads(k), heads(v)
            logits = jnp.einsum("...qhd,...khd->...hqk", q, k,
                                preferred_element_type=jnp.float32)
            logits = logits.astype(jnp.float32) / math.sqrt(dh)
            if attn_mask is not None:
                if attn_mask.dtype == jnp.bool_:
                    m = attn_mask[..., None, :, :] if attn_mask.ndim == len(lead) + 2 else attn_mask
                    logits = jnp.where(m, jnp.float32(-1e30), logits)
                else:
                    m = attn_mask[..., None, :, :] if attn_mask.ndim == len(lead) + 2 else attn_mask
                    logits = logits + m.astype(jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1).astype(dt)
            out = jnp.einsum("...hqk,...khd->...qhd", probs, v,
                             preferred_element_type=jnp.float32)
            out = out.astype(dt).reshape(*lead, T, H)
        return Dense(H, dtype=dt, param_dtype=self.param_dtype, name="out_proj")(out)
