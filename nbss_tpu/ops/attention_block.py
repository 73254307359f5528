"""Fused narrow-band attention BLOCK (Pallas TPU megakernel).

Computes, in one kernel pass over [M, T, H] narrow-band sequences,

    y = x + out_proj( MHSA( LayerNorm(x) ) )

i.e. SpatialNet's whole ``x + dropout(mhsa(norm(x)))`` narrow-band
sub-block (reference SpatialNet.py:86-100) with dropout 0. Compared to the
plain fused attention kernel (ops/attention.py) this removes, per layer,
the separate HBM passes of the LayerNorm, the qkv projection, the output
projection and the residual add (~600 MB of HBM traffic at the bench
config), and raises MXU contraction utilization from dh=24 to H=96 by
*folding* the projections into the score/value matmuls:

    scores_h = q_h k_h^T * scale
             = xln (Wq_h Wk_h^T * scale) xln^T  (+ bias terms)
    out      = sum_h P_h v_h Wo_h + c
             = sum_h P_h (xln Wv_h Wo_h) + c

with A_h = Wq_h Wk_h^T * scale and Wvo_h = Wv_h Wo_h precomputed [H, H]
matrices (tiny: nh x 97 x 97). Per-head weights are indexed on the leading
ref dim (free in Mosaic), so the kernel body contains no lane slicing at
all — the v1 kernel spent ~20% of its time on cross-lane rotations
extracting 24-lane head slices.

Bias algebra (softmax rows are invariant to per-row constants and sum to
one): with q_i = xln_i Wq + bq, k_j = xln_j Wk + bk,

    s_ij  = xln_i A xln_j^T + (Wk bq)·xln_j  [+ per-row consts, dropped]
    P (x Wv + bv) Wo = P x Wvo + bv Wo       [P rows sum to 1]

so the column bias term rides an augmented ones lane of xln (A_aug row H =
scale * Wk_h bq_h) and all remaining bias terms collapse into the constant
c = sum_h bv_h Wo_h + b_out. The ones lane of the augmented Wvo column
also makes the PV contraction produce the softmax row sums for free.

Backward: custom_vjp that recomputes through an XLA reference composition
of the same folded math (correct gradients; the training path defaults to
the unfused module composition whose attention core has a hand-written
Pallas backward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def fold_weights(ln_scale, ln_bias, w_in, b_in, w_out, b_out, nh, eps=1e-5):
    """Fold flax-convention params (Dense kernel [in, out]) into the kernel's
    operands. Returns (ln [2, H], A_aug [nh, H+1, H+1], Wvo_aug [nh, H+1, H+1],
    c [1, H]); all fp32."""
    H = w_in.shape[0]
    dh = H // nh
    scale = 1.0 / np.sqrt(dh)
    f32 = jnp.float32
    w_in, b_in = w_in.astype(f32), b_in.astype(f32)
    w_out, b_out = w_out.astype(f32), b_out.astype(f32)

    A = jnp.zeros((nh, H + 1, H + 1), f32)
    Wvo = jnp.zeros((nh, H + 1, H + 1), f32)
    c = b_out
    for h in range(nh):
        sl = slice(h * dh, (h + 1) * dh)
        Wq, bq = w_in[:, sl], b_in[sl]
        Wk = w_in[:, H + h * dh:H + (h + 1) * dh]
        Wv, bv = w_in[:, 2 * H + h * dh:2 * H + (h + 1) * dh], \
            b_in[2 * H + h * dh:2 * H + (h + 1) * dh]
        Wo = w_out[sl, :]  # rows of the out projection for head h
        A = A.at[h, :H, :H].set((Wq @ Wk.T) * scale)
        A = A.at[h, H, :H].set((Wk @ bq) * scale)
        Wvo = Wvo.at[h, :H, :H].set(Wv @ Wo)
        Wvo = Wvo.at[h, H, H].set(1.0)  # ones lane -> PV dot row-sums e
        c = c + bv @ Wo
    ln = jnp.stack([ln_scale.astype(f32), ln_bias.astype(f32)])
    return ln, A, Wvo, c[None], eps


def _reference(x, ln, A, Wvo, c, eps, nh):
    """XLA composition of the same folded math (backward / ground truth)."""
    f32 = jnp.float32
    xf = x.astype(f32)
    mu = jnp.mean(xf, -1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, -1, keepdims=True)
    xln = xc * jax.lax.rsqrt(var + eps) * ln[0] + ln[1]
    xa = jnp.concatenate([xln, jnp.ones_like(xln[..., :1])], -1).astype(x.dtype)
    t = jnp.einsum("mqh,nhk->nmqk", xa, A.astype(x.dtype),
                   preferred_element_type=f32).astype(x.dtype)
    s = jnp.einsum("nmqk,mjk->nmqj", t, xa, preferred_element_type=f32)
    p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    vo = jnp.einsum("mjh,nhk->nmjk", xa, Wvo.astype(x.dtype),
                    preferred_element_type=f32).astype(x.dtype)
    o = jnp.einsum("nmqj,nmjk->mqk", p, vo, preferred_element_type=f32)
    # lane H of vo is 1, so o[..., H] = nh * rowsum(p) = nh; lanes :H carry
    # the summed head outputs
    H = x.shape[-1]
    return (o[..., :H] + c[0] + xf).astype(x.dtype)


def _kernel(x_ref, ln_ref, a_ref, wvo_ref, c_ref, o_ref, *, nh, eps, t_valid):
    mb, Tp, H = x_ref.shape
    f32 = jnp.float32
    xv = x_ref[...]
    dt = xv.dtype
    xf = xv.astype(f32)
    mu = jnp.mean(xf, -1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, -1, keepdims=True)
    xln = xc * jax.lax.rsqrt(var + eps) * ln_ref[0] + ln_ref[1]
    xa = jnp.concatenate([xln, jnp.ones((mb, Tp, 1), f32)], axis=2).astype(dt)
    Ha = H + 1
    xa2 = xa.reshape(mb * Tp, Ha)  # sublane-dim merge only: free in Mosaic
    col = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
    pad_mask = jnp.where(col < t_valid, 0.0, NEG_INF).astype(f32)
    acc = None
    for h in range(nh):
        a_h = a_ref[h].astype(dt)      # [H+1, H+1], leading-dim index: free
        t = jax.lax.dot_general(
            xa2, a_h, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(dt).reshape(mb, Tp, Ha)
        s = jax.lax.dot_general(
            t, xa, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32)  # [mb, Tp, Tp]
        s = s + pad_mask
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m).astype(dt)
        vo = jax.lax.dot_general(
            xa2, wvo_ref[h].astype(dt), dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(dt).reshape(mb, Tp, Ha)
        pv = jax.lax.dot_general(
            e, vo, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)  # [mb, Tp, H+1]; lane H = rowsum(e)
        o_h = pv[:, :, :H] / pv[:, :, H:H + 1]
        acc = o_h if acc is None else acc + o_h
    o_ref[...] = (acc + c_ref[0] + xf).astype(o_ref.dtype)


def _fused_block(x, ln, A, Wvo, c, eps, nh, block_m):
    M, T, H = x.shape
    Tp = -(-T // 128) * 128
    mb = block_m
    Mp = -(-M // mb) * mb
    xp = jnp.pad(x, ((0, Mp - M), (0, Tp - T), (0, 0)))

    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((mb, Tp, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, nh=nh, eps=eps, t_valid=T),
        grid=(Mp // mb,),
        in_specs=[xspec, full(ln), full(A), full(Wvo), full(c)],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((Mp, Tp, H), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(xp, ln, A, Wvo, c)
    return out[:M, :T]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def attention_block(x, ln, A, Wvo, c, eps: float, nh: int, block_m: int = 8):
    """y = x + out_proj(MHSA(LN(x))) on [M, T, H], folded-weight form.

    Use :func:`fold_weights` to build (ln, A, Wvo, c) from module params.
    """
    return _fused_block(x, ln, A, Wvo, c, eps, nh, block_m)


def _fwd(x, ln, A, Wvo, c, eps, nh, block_m):
    return _fused_block(x, ln, A, Wvo, c, eps, nh, block_m), (x, ln, A, Wvo, c)


def _bwd(eps, nh, block_m, res, g):
    x, ln, A, Wvo, c = res
    _, vjp = jax.vjp(lambda *a: _reference(*a, eps, nh), x, ln, A, Wvo, c)
    return vjp(g)


attention_block.defvjp(_fwd, _bwd)
