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

with A_h = Wq_h Wk_h^T * scale and Wvo_h = Wv_h Wo_h precomputed matrices
(tiny: nh x (H+2) x (H+2)). Per-head weights are indexed on the leading
ref dim (free in Mosaic), so the kernel body contains no lane slicing at
all — the v1 kernel spent ~20% of its time on cross-lane rotations
extracting 24-lane head slices.

xln is augmented with TWO lanes before the score/value dots:

    lane H   = 1                     (the "ones" lane)
    lane H+1 = [t >= t_valid]        (the "pad" lane)

Bias algebra (softmax rows are invariant to per-row constants and sum to
one): with q_i = xln_i Wq + bq, k_j = xln_j Wk + bk,

    s_ij  = xln_i A xln_j^T + (Wk bq)·xln_j  [+ per-row consts, dropped]
    P (x Wv + bv) Wo = P x Wvo + bv Wo       [P rows sum to 1]

so the column bias term rides the ones lane (A_aug[H, :H] = scale*Wk_h bq_h)
and all remaining bias terms collapse into the constant c = sum_h bv_h Wo_h
+ b_out. The T-padding mask ALSO rides the score dot: A_aug[H, H+1] =
-1e30 makes every padded column's score -1e30 through the ones x pad lane
product — materializing a [Tp, Tp] additive mask inside this kernel
crashes Mosaic's ApplyVectorLayoutPass (vector_extract_slice limits 32 vs
1; bisected with scripts/debug_block_kernel.py k7), and the MXU-side mask
is free anyway. The ones column of Wvo_aug ([H, H] = 1) likewise makes the
PV contraction produce the softmax row sums in lane H for free.

Backward: custom_vjp with a hand-written Pallas backward kernel
(``_fused_block_bwd``) that recomputes the forward intermediates in VMEM
and accumulates dx/dln/dA/dWvo/dc in one pass over the M grid — the
default training path on TPU runs fully fused fwd+bwd.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def fold_weights(ln_scale, ln_bias, w_in, b_in, w_out, b_out, nh, eps=1e-5):
    """Fold flax-convention params (Dense kernel [in, out]) into the kernel's
    operands. Returns (ln [2, H], A_aug [nh, H+2, H+2], Wvo_aug
    [nh, H+2, H+2], c [1, H]); all fp32."""
    H = w_in.shape[0]
    dh = H // nh
    scale = 1.0 / np.sqrt(dh)
    f32 = jnp.float32
    w_in, b_in = w_in.astype(f32), b_in.astype(f32)
    w_out, b_out = w_out.astype(f32), b_out.astype(f32)

    A = jnp.zeros((nh, H + 2, H + 2), f32)
    Wvo = jnp.zeros((nh, H + 2, H + 2), f32)
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
        A = A.at[h, H, H + 1].set(NEG_INF)  # ones x pad lane -> column mask
        Wvo = Wvo.at[h, :H, :H].set(Wv @ Wo)
        Wvo = Wvo.at[h, H, H].set(1.0)  # ones lane -> PV dot row-sums e
        c = c + bv @ Wo
    ln = jnp.stack([ln_scale.astype(f32), ln_bias.astype(f32)])
    return ln, A, Wvo, c[None], eps


def _reference(x, ln, A, Wvo, c, eps, nh):
    """XLA composition of the same folded math (backward / ground truth).
    Operates on unpadded [M, T, H]: the pad lane is all-zero here."""
    f32 = jnp.float32
    xf = x.astype(f32)
    mu = jnp.mean(xf, -1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, -1, keepdims=True)
    xln = xc * jax.lax.rsqrt(var + eps) * ln[0] + ln[1]
    ones = jnp.ones_like(xln[..., :1])
    xa = jnp.concatenate([xln, ones, 0 * ones], -1).astype(x.dtype)
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


def _kernel(x_ref, ln_ref, a_ref, wvo_ref, c_ref, o_ref, *, nh, eps, t_valid,
            pipeline=False):
    mb, Tp, H = x_ref.shape
    f32 = jnp.float32
    xv = x_ref[...]
    dt = xv.dtype
    xf = xv.astype(f32)
    mu = jnp.mean(xf, -1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, -1, keepdims=True)
    xln = xc * jax.lax.rsqrt(var + eps) * ln_ref[0] + ln_ref[1]
    # augmented lanes: [ones, pad-indicator] (see module docstring)
    lane = jax.lax.broadcasted_iota(jnp.int32, (mb, Tp, 2), 2)
    row = jax.lax.broadcasted_iota(jnp.int32, (mb, Tp, 2), 1)
    tail = jnp.where(lane == 0, 1.0, jnp.where(row >= t_valid, 1.0, 0.0))
    xa = jnp.concatenate([xln, tail.astype(f32)], axis=2).astype(dt)
    Ha = H + 2
    xa2 = xa.reshape(mb * Tp, Ha)  # sublane-dim merge only: free in Mosaic

    def score(h):
        a_h = a_ref[h].astype(dt)      # [Ha, Ha], leading-dim index: free
        t = jax.lax.dot_general(
            xa2, a_h, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(dt).reshape(mb, Tp, Ha)
        return jax.lax.dot_general(
            t, xa, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32)  # [mb, Tp, Tp]; pad cols ~ -1e30

    def value(h, e):
        vo = jax.lax.dot_general(
            xa2, wvo_ref[h].astype(dt), dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(dt).reshape(mb, Tp, Ha)
        return jax.lax.dot_general(
            e, vo, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)  # [mb, Tp, Ha]; lane H = rowsum(e)

    acc = None
    if pipeline:
        # software-pipelined emission order: head h's VPU softmax is emitted
        # between head h+1's MXU score dot and head h's PV dot, giving the
        # Mosaic scheduler independent MXU work to overlap with the exp.
        s = score(0)
        for h in range(nh):
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m).astype(dt)
            if h + 1 < nh:
                s = score(h + 1)
            pv = value(h, e)
            o_h = pv[:, :, :H] / pv[:, :, H:H + 1]
            acc = o_h if acc is None else acc + o_h
    else:
        for h in range(nh):
            s = score(h)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m).astype(dt)
            pv = value(h, e)
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
    # read at TRACE time: a jitted caller bakes the choice into its
    # executable, so A/B the two orders in separate processes (or clear the
    # jit cache) — flipping the env after first compile has no effect
    pipe = os.environ.get("NBSS_BLOCK_PIPE", "1") != "0"
    out = pl.pallas_call(
        functools.partial(_kernel, nh=nh, eps=eps, t_valid=T, pipeline=pipe),
        grid=(Mp // mb,),
        in_specs=[xspec, full(ln), full(A), full(Wvo), full(c)],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((Mp, Tp, H), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(xp, ln, A, Wvo, c)
    return out[:M, :T]


def _bwd_kernel(x_ref, ln_ref, a_ref, wvo_ref, g_ref,
                dx_ref, dln_ref, da_ref, dwvo_ref, dc_ref,
                *, nh, eps, t_valid):
    """Adjoint of the fused block, recomputing the forward in VMEM.

    Weight cotangents (dln/dA/dWvo/dc) are accumulated across the M-tile
    grid into revisited outputs (their index maps ignore the grid index).
    Entries of A/Wvo that fold_weights sets to constants (the pad-mask and
    ones-lane slots) receive garbage-free but unused cotangents — the
    ``.at[].set`` vjp in fold_weights discards them.
    """
    mb, Tp, H = x_ref.shape
    f32 = jnp.float32
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dln_ref[...] = jnp.zeros_like(dln_ref)
        da_ref[...] = jnp.zeros_like(da_ref)
        dwvo_ref[...] = jnp.zeros_like(dwvo_ref)
        dc_ref[...] = jnp.zeros_like(dc_ref)

    xv = x_ref[...]
    dt = xv.dtype
    xf = xv.astype(f32)
    mu = jnp.mean(xf, -1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, -1, keepdims=True)
    rsig = jax.lax.rsqrt(var + eps)
    xhat = xc * rsig
    xln = xhat * ln_ref[0] + ln_ref[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (mb, Tp, 2), 2)
    row = jax.lax.broadcasted_iota(jnp.int32, (mb, Tp, 2), 1)
    tail = jnp.where(lane == 0, 1.0, jnp.where(row >= t_valid, 1.0, 0.0))
    xa = jnp.concatenate([xln, tail.astype(f32)], axis=2).astype(dt)
    Ha = H + 2
    N = mb * Tp
    xa2 = xa.reshape(N, Ha)
    g = g_ref[...]
    gf = g.astype(f32)
    zeros2 = jnp.zeros((mb, Tp, 2), dt)
    dxa = None
    for h in range(nh):
        a_h = a_ref[h].astype(dt)
        w_h = wvo_ref[h].astype(dt)
        t = jax.lax.dot_general(
            xa2, a_h, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(dt).reshape(mb, Tp, Ha)
        s = jax.lax.dot_general(
            t, xa, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)  # fp32; P = e * rinv
        rinv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        vo = jax.lax.dot_general(
            xa2, w_h, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(dt).reshape(mb, Tp, Ha)
        # softmax-attention adjoint with 1/rowsum folded into g (see
        # ops/attention.py _bwd_kernel): g' = g*rinv
        gp = (gf * rinv).astype(dt)  # [mb, Tp, H]
        eb = e.astype(dt)
        # dvo (lanes :H) = E^T g' ; tail lanes carry zero cotangent
        dvo = jax.lax.dot_general(
            eb, gp, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32).astype(dt)  # [mb, Tk, H]
        dvo_full = jnp.concatenate([dvo, zeros2], axis=2)  # [mb, Tp, Ha]
        # dP' = g' vo[:, :H]^T  (vo lanes H.. belong to the rowsum trick)
        dp = jax.lax.dot_general(
            gp, vo[:, :, :H], dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32)  # [mb, Tq, Tk]
        delta = jnp.sum(dp * e, axis=-1, keepdims=True) * rinv
        ds = (e * (dp - delta)).astype(dt)  # [mb, Tq, Tk]
        # dt_q = dS xa ;  dxa_k += dS^T t ;  dxa += dt A^T + dvo Wvo^T
        dth = jax.lax.dot_general(
            ds, xa, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32).astype(dt)  # [mb, Tq, Ha]
        dxa_h = jax.lax.dot_general(
            ds, t, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)  # [mb, Tk, Ha]
        dth2 = dth.reshape(N, Ha)
        dvo2 = dvo_full.reshape(N, Ha)
        dxa_h = dxa_h + jax.lax.dot_general(
            dth2, a_h, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32).reshape(mb, Tp, Ha)
        dxa_h = dxa_h + jax.lax.dot_general(
            dvo2, w_h, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32).reshape(mb, Tp, Ha)
        dxa = dxa_h if dxa is None else dxa + dxa_h
        # weight cotangents, accumulated across tiles in fp32
        da_ref[h] += jax.lax.dot_general(
            xa2, dth2, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32).astype(da_ref.dtype)
        dwvo_ref[h] += jax.lax.dot_general(
            xa2, dvo2, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32).astype(dwvo_ref.dtype)
    # back through the augmentation (tail lanes are constants) and the LN
    dxln = dxa[:, :, :H]  # fp32
    dln_ref[0:1, :] += jnp.sum(dxln * xhat, axis=(0, 1))[None].astype(dln_ref.dtype)
    dln_ref[1:2, :] += jnp.sum(dxln, axis=(0, 1))[None].astype(dln_ref.dtype)
    dc_ref[0:1, :] += jnp.sum(gf, axis=(0, 1))[None].astype(dc_ref.dtype)
    dxhat = dxln * ln_ref[0]
    dx_ln = rsig * (dxhat - jnp.mean(dxhat, -1, keepdims=True)
                    - xhat * jnp.mean(dxhat * xhat, -1, keepdims=True))
    dx_ref[...] = (gf + dx_ln).astype(dx_ref.dtype)


def _fused_block_bwd(x, ln, A, Wvo, g, eps, nh, block_m):
    M, T, H = x.shape
    Tp = -(-T // 128) * 128
    mb = block_m
    Mp = -(-M // mb) * mb
    pad = lambda v: jnp.pad(v, ((0, Mp - M), (0, Tp - T), (0, 0)))
    xp, gp = pad(x), pad(g)

    xspec = pl.BlockSpec((mb, Tp, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    Ha = H + 2
    dx, dln, dA, dWvo, dc = pl.pallas_call(
        functools.partial(_bwd_kernel, nh=nh, eps=eps, t_valid=T),
        grid=(Mp // mb,),
        in_specs=[xspec, full(ln), full(A), full(Wvo), xspec],
        out_specs=(xspec, full(ln), full(A), full(Wvo),
                   pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((Mp, Tp, H), x.dtype),
                   jax.ShapeDtypeStruct(ln.shape, jnp.float32),
                   jax.ShapeDtypeStruct((nh, Ha, Ha), jnp.float32),
                   jax.ShapeDtypeStruct((nh, Ha, Ha), jnp.float32),
                   jax.ShapeDtypeStruct((1, H), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(xp, ln, A, Wvo, gp)
    return dx[:M, :T], dln, dA, dWvo, dc


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
    dx, dln, dA, dWvo, dc = _fused_block_bwd(x, ln, A, Wvo, g, eps, nh, block_m)
    return (dx, dln.astype(ln.dtype), dA.astype(A.dtype),
            dWvo.astype(Wvo.dtype), dc.astype(c.dtype))


attention_block.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------
# NBC variant: + Transformer-XL relative position, trig-factorized
# --------------------------------------------------------------------------

def fold_weights_nbc(ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo,
                     wpos, u_bias, v_bias, nh, eps=1e-5):
    """Fold NBC's RelPosMultiHeadAttention params (models/nbc.py:78-162;
    reference NBC.py:73-158) into megakernel operands.

    score = ((q+u) k^T + (q+v_bias) pos^T) / sqrt(d_model) with sinusoidal
    relative positions. The content part folds like fold_weights; the
    position part folds into per-head maps Gs/Gc [H+2, d/2] such that

        gs = xa Gs_h ; gc = xa Gc_h
        pos_score[i, j] = (gs_i sin_i + gc_i cos_i) . cos_j
                        + (gc_i sin_i - gs_i cos_i) . sin_j

    (angle-sum identity; sin/cos are the [T, d/2] absolute-position tables).
    Returns (ln [2,H], A [nh,H+2,H+2], Gs, Gc [nh,H+2,d//2],
    Wvo [nh,H+2,H+2], c [1,H], eps)."""
    H = wq.shape[0]
    dh = H // nh
    d2 = H // 2
    scale = 1.0 / np.sqrt(H)  # reference scales by sqrt(d_model) (NBC.py:90)
    f32 = jnp.float32
    wq, wk, wv, wo = (w.astype(f32) for w in (wq, wk, wv, wo))
    bq, bk, bv, bo = (b.astype(f32) for b in (bq, bk, bv, bo))
    wpos3 = wpos.astype(f32).reshape(H, nh, dh)
    wsin = wpos3[0::2]  # [d/2, nh, dh]
    wcos = wpos3[1::2]

    A = jnp.zeros((nh, H + 2, H + 2), f32)
    Gs = jnp.zeros((nh, H + 2, d2), f32)
    Gc = jnp.zeros((nh, H + 2, d2), f32)
    Wvo = jnp.zeros((nh, H + 2, H + 2), f32)
    c = bo
    for h in range(nh):
        sl = slice(h * dh, (h + 1) * dh)
        Wq_h, Wk_h, Wv_h = wq[:, sl], wk[:, sl], wv[:, sl]
        Wo_h = wo[sl, :]
        A = A.at[h, :H, :H].set((Wq_h @ Wk_h.T) * scale)
        A = A.at[h, H, :H].set((Wk_h @ (bq[sl] + u_bias[h])) * scale)
        A = A.at[h, H, H + 1].set(NEG_INF)
        qvb = bq[sl] + v_bias[h]  # constant part of q + v_bias
        Gs = Gs.at[h, :H, :].set((Wq_h @ wsin[:, h, :].T) * scale)
        Gs = Gs.at[h, H, :].set((wsin[:, h, :] @ qvb) * scale)
        Gc = Gc.at[h, :H, :].set((Wq_h @ wcos[:, h, :].T) * scale)
        Gc = Gc.at[h, H, :].set((wcos[:, h, :] @ qvb) * scale)
        Wvo = Wvo.at[h, :H, :H].set(Wv_h @ Wo_h)
        Wvo = Wvo.at[h, H, H].set(1.0)
        c = c + bv[sl] @ Wo_h
    ln = jnp.stack([ln_scale.astype(f32), ln_bias.astype(f32)])
    return ln, A, Gs, Gc, Wvo, c[None], eps


def _reference_relpos(x, ln, A, Gs, Gc, Wvo, c, sin_t, cos_t, eps, nh):
    """XLA composition of the folded NBC block (backward / ground truth).
    sin_t/cos_t: [T, d/2] absolute-position tables (unpadded here)."""
    f32 = jnp.float32
    xf = x.astype(f32)
    mu = jnp.mean(xf, -1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, -1, keepdims=True)
    xln = xc * jax.lax.rsqrt(var + eps) * ln[0] + ln[1]
    ones = jnp.ones_like(xln[..., :1])
    xa = jnp.concatenate([xln, ones, 0 * ones], -1).astype(x.dtype)
    dt = x.dtype
    t = jnp.einsum("mqh,nhk->nmqk", xa, A.astype(dt),
                   preferred_element_type=f32).astype(dt)
    s = jnp.einsum("nmqk,mjk->nmqj", t, xa, preferred_element_type=f32)
    gs = jnp.einsum("mqh,nhd->nmqd", xa, Gs.astype(dt),
                    preferred_element_type=f32).astype(dt)
    gc = jnp.einsum("mqh,nhd->nmqd", xa, Gc.astype(dt),
                    preferred_element_type=f32).astype(dt)
    sin_b = sin_t.astype(dt)[None, None]
    cos_b = cos_t.astype(dt)[None, None]
    Aq = gs * sin_b + gc * cos_b
    Bq = gc * sin_b - gs * cos_b
    s = s + (jnp.einsum("nmqd,jd->nmqj", Aq, cos_t.astype(dt),
                        preferred_element_type=f32)
             + jnp.einsum("nmqd,jd->nmqj", Bq, sin_t.astype(dt),
                          preferred_element_type=f32))
    p = jax.nn.softmax(s, axis=-1).astype(dt)
    vo = jnp.einsum("mjh,nhk->nmjk", xa, Wvo.astype(dt),
                    preferred_element_type=f32).astype(dt)
    o = jnp.einsum("nmqj,nmjk->mqk", p, vo, preferred_element_type=f32)
    H = x.shape[-1]
    return (o[..., :H] + c[0] + xf).astype(dt)


def _kernel_relpos(x_ref, ln_ref, a_ref, gs_ref, gc_ref, wvo_ref, c_ref,
                   sin_ref, cos_ref, o_ref, *, nh, eps, t_valid):
    """Megakernel + trig-factorized relative position. sin_ref/cos_ref are
    PRE-BROADCAST [mb, Tp, d/2] (a [Tp, d/2] -> [mb, Tp, d/2] broadcast
    inside the kernel is the k7 Mosaic crash shape)."""
    mb, Tp, H = x_ref.shape
    f32 = jnp.float32
    xv = x_ref[...]
    dt = xv.dtype
    xf = xv.astype(f32)
    mu = jnp.mean(xf, -1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, -1, keepdims=True)
    xln = xc * jax.lax.rsqrt(var + eps) * ln_ref[0] + ln_ref[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (mb, Tp, 2), 2)
    row = jax.lax.broadcasted_iota(jnp.int32, (mb, Tp, 2), 1)
    tail = jnp.where(lane == 0, 1.0, jnp.where(row >= t_valid, 1.0, 0.0))
    xa = jnp.concatenate([xln, tail.astype(f32)], axis=2).astype(dt)
    Ha = H + 2
    xa2 = xa.reshape(mb * Tp, Ha)
    sin3 = sin_ref[...]
    cos3 = cos_ref[...]
    acc = None
    for h in range(nh):
        t = jax.lax.dot_general(
            xa2, a_ref[h].astype(dt), dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(dt).reshape(mb, Tp, Ha)
        s = jax.lax.dot_general(
            t, xa, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32)
        d2 = sin3.shape[-1]
        gs = jax.lax.dot_general(
            xa2, gs_ref[h].astype(dt), dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(dt).reshape(mb, Tp, d2)
        gc = jax.lax.dot_general(
            xa2, gc_ref[h].astype(dt), dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(dt).reshape(mb, Tp, d2)
        Aq = gs * sin3 + gc * cos3
        Bq = gc * sin3 - gs * cos3
        s = s + jax.lax.dot_general(
            Aq, cos3, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32)
        s = s + jax.lax.dot_general(
            Bq, sin3, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m).astype(dt)
        vo = jax.lax.dot_general(
            xa2, wvo_ref[h].astype(dt), dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(dt).reshape(mb, Tp, Ha)
        pv = jax.lax.dot_general(
            e, vo, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)
        o_h = pv[:, :, :H] / pv[:, :, H:H + 1]
        acc = o_h if acc is None else acc + o_h
    o_ref[...] = (acc + c_ref[0] + xf).astype(o_ref.dtype)


def _fused_block_relpos(x, ln, A, Gs, Gc, Wvo, c, sin_t, cos_t, eps, nh, block_m):
    M, T, H = x.shape
    d2 = sin_t.shape[-1]
    Tp = -(-T // 128) * 128
    mb = block_m
    Mp = -(-M // mb) * mb
    xp = jnp.pad(x, ((0, Mp - M), (0, Tp - T), (0, 0)))
    # pre-broadcast position tables to the tile shape (see _kernel_relpos)
    sin3 = jnp.broadcast_to(
        jnp.pad(sin_t, ((0, Tp - T), (0, 0)))[None], (mb, Tp, d2)).astype(x.dtype)
    cos3 = jnp.broadcast_to(
        jnp.pad(cos_t, ((0, Tp - T), (0, 0)))[None], (mb, Tp, d2)).astype(x.dtype)

    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((mb, Tp, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel_relpos, nh=nh, eps=eps, t_valid=T),
        grid=(Mp // mb,),
        in_specs=[xspec, full(ln), full(A), full(Gs), full(Gc), full(Wvo),
                  full(c), full(sin3), full(cos3)],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((Mp, Tp, H), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(xp, ln, A, Gs, Gc, Wvo, c, sin3, cos3)
    return out[:M, :T]


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def attention_block_relpos(x, ln, A, Gs, Gc, Wvo, c, sin_t, cos_t,
                           eps: float, nh: int, block_m: int = 8):
    """y = x + out_proj(RelPosMHSA(LN(x))) on [M, T, H] (NBC block's
    attention half). Use :func:`fold_weights_nbc` for the operands;
    sin_t/cos_t from models.nbc.sincos_position_tables."""
    return _fused_block_relpos(x, ln, A, Gs, Gc, Wvo, c, sin_t, cos_t,
                               eps, nh, block_m)


def _fwd_rp(x, ln, A, Gs, Gc, Wvo, c, sin_t, cos_t, eps, nh, block_m):
    y = _fused_block_relpos(x, ln, A, Gs, Gc, Wvo, c, sin_t, cos_t, eps, nh, block_m)
    return y, (x, ln, A, Gs, Gc, Wvo, c, sin_t, cos_t)


def _bwd_rp(eps, nh, block_m, res, g):
    x, ln, A, Gs, Gc, Wvo, c, sin_t, cos_t = res
    _, vjp = jax.vjp(
        lambda *a: _reference_relpos(*a, sin_t, cos_t, eps, nh),
        x, ln, A, Gs, Gc, Wvo, c)
    return vjp(g) + (None, None)


attention_block_relpos.defvjp(_fwd_rp, _bwd_rp)
