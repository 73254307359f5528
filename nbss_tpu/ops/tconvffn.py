"""Fused T-ConvFFN (Pallas TPU kernel) for the offline SpatialNet layer.

The temporal conv-FFN (SpatialNet.py:61-73: LN -> 1x1 up -> SiLU ->
gconv -> SiLU -> gconv -> GroupNorm -> SiLU -> gconv -> SiLU -> 1x1 down)
is a chain of bandwidth-bound ops on a [B*F, T, ffn] activation; XLA runs
each grouped conv as its own HBM round trip. This kernel streams each
[mb, T, H] block through the whole chain in VMEM:

- grouped k=3 temporal convs become three shifted [mb*T, ffn] x [ffn, ffn]
  MXU matmuls against block-diagonal-expanded weights (8x padded FLOPs but
  ~full MXU utilization, >> faster than 24-channel grouped convs);
- the mid GroupNorm (stats over channels-in-group x valid T per sequence)
  is computed in fp32 with explicit T-padding masks;
- LN/SiLU/bias adds ride along in VMEM.

Backward = custom_vjp recomputing with the XLA reference implementation
(identical math), same strategy as ops.attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def expand_grouped_kernel(w: jnp.ndarray, groups: int) -> jnp.ndarray:
    """flax grouped conv kernel [k, C/g, C] -> dense [k, C, C] with zeros
    off the block diagonal."""
    k, cpg, C = w.shape
    assert C % groups == 0 and cpg == C // groups, (w.shape, groups)
    out_group = jnp.arange(C) // cpg  # group of each output channel
    in_channel = out_group[None, :] * cpg + jnp.arange(cpg)[:, None]  # [cpg, C]
    dense = jnp.zeros((k, C, C), w.dtype)
    return dense.at[:, in_channel, jnp.arange(C)[None, :]].set(w)


def _ref_tconvffn(x, p, groups: int, eps: float = 1e-5):
    """XLA reference of the fused chain; p is the parameter dict."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.mean(jnp.square(x32), -1, keepdims=True) - jnp.square(mu)
    y = ((x32 - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    y = y * p["ln_scale"].astype(x.dtype) + p["ln_bias"].astype(x.dtype)
    y = jax.nn.silu(y @ p["w_up"].astype(x.dtype) + p["b_up"].astype(x.dtype))

    def conv(y, w3, b):
        prev = jnp.pad(y, ((0, 0), (1, 0), (0, 0)))[:, :-1]
        nxt = jnp.pad(y, ((0, 0), (0, 1), (0, 0)))[:, 1:]
        w3 = w3.astype(y.dtype)
        return (prev @ w3[0] + y @ w3[1] + nxt @ w3[2]) + b.astype(y.dtype)

    y = jax.nn.silu(conv(y, p["w_c1"], p["b_c1"]))
    y = conv(y, p["w_c2"], p["b_c2"])
    # GroupNorm over (channels-in-group, T) per sequence
    M, T, FF = y.shape
    cpg = FF // groups
    yg = y.reshape(M, T, groups, cpg).astype(jnp.float32)
    mu = jnp.mean(yg, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(yg), axis=(1, 3), keepdims=True) - jnp.square(mu)
    yg = (yg - mu) * jax.lax.rsqrt(var + eps)
    y = yg.reshape(M, T, FF).astype(y.dtype)
    y = y * p["gn_scale"].astype(y.dtype) + p["gn_bias"].astype(y.dtype)
    y = jax.nn.silu(y)
    y = jax.nn.silu(conv(y, p["w_c3"], p["b_c3"]))
    return y @ p["w_down"].astype(y.dtype) + p["b_down"].astype(y.dtype)


def _silu(a):
    # manual fp32 silu: Mosaic's bf16 logistic lowering broadcasts an f32
    # constant into a bf16 vector and fails verification
    a32 = a.astype(jnp.float32)
    return (a32 / (1.0 + jnp.exp(-a32))).astype(a.dtype)


def _kernel(x_ref, ln_s, ln_b, w_up, b_up, w_c1, b_c1, w_c2, b_c2,
            gn_s, gn_b, w_c3, b_c3, w_down, b_down, o_ref,
            *, groups, t_valid, eps=1e-5):
    # all weight/bias refs are pre-cast to x.dtype by the caller (in-kernel
    # dtype casts of broadcasts trip a Mosaic verifier bug)
    x = x_ref[...]  # [mb, Tp, H]
    mb, Tp, H = x.shape
    FF = w_up.shape[-1]
    dt = x.dtype

    row = jax.lax.broadcasted_iota(jnp.int32, (1, Tp, 1), 1)
    valid32 = (row < t_valid).astype(jnp.float32)  # [1, Tp, 1]
    valid = valid32.astype(dt)

    # LayerNorm over H (fp32 stats)
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.mean(x32 * x32, -1, keepdims=True) - mu * mu
    y = ((x32 - mu) * jax.lax.rsqrt(var + eps)).astype(dt)
    y = y * ln_s[...] + ln_b[...]

    def mm(a, w):  # [mb, Tp, Ci] @ [Ci, Co]
        return jax.lax.dot_general(
            a, w[...], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)

    def conv(a, w3, b):
        zero = jnp.zeros_like(a[:, :1])
        prev = jnp.concatenate([zero, a[:, :-1]], axis=1)
        nxt = jnp.concatenate([a[:, 1:], zero], axis=1)
        return mm(prev, w3[0]) + mm(a, w3[1]) + mm(nxt, w3[2]) + b[...]

    y = _silu(mm(y, w_up) + b_up[...])
    y = y * valid  # zero padded frames so convs/GN stay exact
    y = _silu(conv(y, w_c1, b_c1))
    y = y * valid
    y = conv(y, w_c2, b_c2)

    # GroupNorm: per (m, group) stats over (valid T, channels-in-group).
    # Group reductions/broadcasts via one-hot matmuls — Mosaic cannot split
    # the lane dim with a [.., FF] -> [.., G, FF/G] reshape.
    cpg = FF // groups
    ch_group = jax.lax.broadcasted_iota(jnp.int32, (FF, groups), 0) // cpg
    grp_ids = jax.lax.broadcasted_iota(jnp.int32, (FF, groups), 1)
    onehot = (ch_group == grp_ids).astype(jnp.float32)  # [FF, G]
    y32 = y.astype(jnp.float32) * valid32
    denom = float(t_valid * cpg)

    def gsum(a):  # [mb, Tp, FF] -> [mb, 1, G]
        s = jax.lax.dot_general(a, onehot, dimension_numbers=(((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jnp.sum(s, axis=1, keepdims=True)

    def gbcast(a):  # [mb, 1, G] -> [mb, 1, FF]
        return jax.lax.dot_general(a, onehot.T, dimension_numbers=(((2,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    mu_g = gsum(y32) / denom
    var_g = gsum(y32 * y32) / denom - mu_g * mu_g
    mu_c = gbcast(mu_g)
    rstd_c = gbcast(jax.lax.rsqrt(var_g + eps))
    y = ((y32 - mu_c) * rstd_c).astype(dt)
    y = y * gn_s[...] + gn_b[...]
    y = _silu(y)
    y = y * valid
    y = _silu(conv(y, w_c3, b_c3))
    o_ref[...] = mm(y, w_down) + b_down[...]


def _fused_forward(x, p, groups, block_m):
    M, T, H = x.shape
    FF = p["w_up"].shape[-1]
    Tp = -(-T // 8) * 8
    mb = block_m
    Mp = -(-M // mb) * mb
    xp = jnp.pad(x, ((0, Mp - M), (0, Tp - T), (0, 0)))
    p = {k: v.astype(x.dtype) for k, v in p.items()}  # pre-cast for the kernel

    def vec_spec(n):
        return pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)

    def mat_spec(*shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, nd=nd: (0,) * nd, memory_space=pltpu.VMEM)

    params = [
        (p["ln_scale"].reshape(1, H), vec_spec(H)),
        (p["ln_bias"].reshape(1, H), vec_spec(H)),
        (p["w_up"], mat_spec(H, FF)),
        (p["b_up"].reshape(1, FF), vec_spec(FF)),
        (p["w_c1"], mat_spec(3, FF, FF)),
        (p["b_c1"].reshape(1, FF), vec_spec(FF)),
        (p["w_c2"], mat_spec(3, FF, FF)),
        (p["b_c2"].reshape(1, FF), vec_spec(FF)),
        (p["gn_scale"].reshape(1, FF), vec_spec(FF)),
        (p["gn_bias"].reshape(1, FF), vec_spec(FF)),
        (p["w_c3"], mat_spec(3, FF, FF)),
        (p["b_c3"].reshape(1, FF), vec_spec(FF)),
        (p["w_down"], mat_spec(FF, H)),
        (p["b_down"].reshape(1, H), vec_spec(H)),
    ]
    x_spec = pl.BlockSpec((mb, Tp, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, groups=groups, t_valid=T),
        grid=(Mp // mb,),
        in_specs=[x_spec] + [s for _, s in params],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, Tp, H), x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(xp, *[v for v, _ in params])
    return out[:M, :T]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_tconvffn(x, params, groups: int = 8, block_m: int = 8):
    """x [M, T, H]; params dict with ln/up/conv1-3 (dense-expanded [3,FF,FF])
    /gn/down weights. Returns the FFN output (caller adds the residual)."""
    return _fused_forward(x, params, groups, block_m)


def _fwd(x, params, groups, block_m):
    return _fused_forward(x, params, groups, block_m), (x, params)


def _bwd(groups, block_m, res, g):
    x, params = res
    _, vjp = jax.vjp(lambda x, p: _ref_tconvffn(x, p, groups), x, params)
    return vjp(g)


fused_tconvffn.defvjp(_fwd, _bwd)
