"""Fused narrow-band attention (Pallas TPU kernel).

SpatialNet attends over T (~251 frames) independently for each of B*F
~ 2k short sequences x nh heads. The XLA einsum path materializes the
[N, nh, T, T] fp32 logits in HBM (~2 GB per layer at the bench config) and
is bandwidth-bound; this kernel keeps each block's score matrices entirely
in VMEM, so HBM traffic is just Q/K/V/O.

Layout: the kernel consumes [M, T, H] (M = flattened batch, H = nh*dh)
exactly as produced by the qkv projection — heads are static lane slices
inside the kernel, and the per-block score/PV contractions are batched
``dot_general``s over the M tile, so no transposes or reshapes are needed
around the call.

Supports an optional additive mask, shared [T, T] or per-head [nh, T, T]
(causal-local / ALiBi masks of the online model). Backward is a
hand-written Pallas kernel with the same block structure as the forward:
it recomputes the softmax probabilities in VMEM per (M-tile, head) and
forms dQ/dK/dV with five batched MXU contractions, so the [M, nh, T, T]
score tensors never touch HBM in either direction.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attention_reference(q, k, v, mask, nh):
    """[M, T, H] multi-head einsum attention (ground truth / backward).
    v may have a different per-head width than q/k (e.g. NBC's augmented
    positional q/k); the output follows v's width."""
    M, T, H = q.shape
    dh = H // nh

    def heads(t):
        return t.reshape(M, T, nh, t.shape[-1] // nh)

    qh, kh, vh = heads(q), heads(k), heads(v)
    logits = jnp.einsum("mqhd,mkhd->mhqk", qh, kh,
                        preferred_element_type=jnp.float32) / math.sqrt(dh)
    if mask is not None:
        m3 = mask if mask.ndim == 3 else mask[None]
        logits = logits + m3[None].astype(jnp.float32)
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("mhqk,mkhd->mqhd", p, vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.reshape(M, T, v.shape[-1])


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, nh, dh, dv, scale, t_valid):
    Tp = q_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
    pad_mask = jnp.where(col < t_valid, 0.0, NEG_INF).astype(jnp.float32)
    for h in range(nh):  # static unroll over heads; each head batched over M
        sl = slice(h * dh, (h + 1) * dh)
        slv = slice(h * dv, (h + 1) * dv)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, slv]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # [mb, Tp, Tp]
        s = s + pad_mask
        if mask_ref is not None:
            s = s + mask_ref[h if mask_ref.shape[0] > 1 else 0]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        # fold the softmax normalization into the [T, dv]-sized output
        # instead of dividing the [T, T] score matrix (VPU divide savings)
        rinv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            e.astype(v.dtype), v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:, :, slv] = (o * rinv).astype(o_ref.dtype)


def _kernel_nomask(q_ref, k_ref, v_ref, o_ref, **kw):
    _kernel(q_ref, k_ref, v_ref, None, o_ref, **kw)


def _fused_forward(q, k, v, mask, nh, block_m):
    M, T, H = q.shape
    Hv = v.shape[2]
    dh = H // nh
    dv = Hv // nh
    Tp = -(-T // 128) * 128  # pad T to a lane multiple
    mb = block_m
    Mp = -(-M // mb) * mb

    def pad(x):
        return jnp.pad(x, ((0, Mp - M), (0, Tp - T), (0, 0)))

    qp, kp, vp = pad(q), pad(k), pad(v)
    if mask is not None:
        mask3 = mask if mask.ndim == 3 else mask[None]
        mh = mask3.shape[0]
        maskp = jnp.pad(mask3.astype(jnp.float32), ((0, 0), (0, Tp - T), (0, Tp - T)))
        in_specs_mask = [pl.BlockSpec((mh, Tp, Tp), lambda i: (0, 0, 0),
                                      memory_space=pltpu.VMEM)]
        operands = (qp, kp, vp, maskp)
        kernel = functools.partial(_kernel, nh=nh, dh=dh, dv=dv,
                                   scale=1.0 / math.sqrt(dh), t_valid=T)
    else:
        in_specs_mask = []
        operands = (qp, kp, vp)
        kernel = functools.partial(_kernel_nomask, nh=nh, dh=dh, dv=dv,
                                   scale=1.0 / math.sqrt(dh), t_valid=T)

    spec = pl.BlockSpec((mb, Tp, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((mb, Tp, Hv), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(Mp // mb,),
        in_specs=[spec, spec, vspec] + in_specs_mask,
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((Mp, Tp, Hv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),  # v5e has 128 MB VMEM
        interpret=jax.default_backend() == "cpu",  # CPU tests run interpreted
    )(*operands)
    return out[:M, :T]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def narrowband_attention(q, k, v, mask=None, nh: int = 1, block_m: int = 8):
    """Fused multi-head attention over [M, T, nh*dh] narrow-band sequences.

    mask: optional additive mask, [T, T] (shared) or [nh, T, T] (per head).
    The mask is a (zero-cotangent) differentiable argument so traced mask
    constants (e.g. the online model's causal masks under jit) are allowed.
    """
    return _fused_forward(q, k, v, mask, nh, block_m)


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, g_ref, dq_ref, dk_ref, dv_ref,
                *, nh, dh, dv, scale, t_valid):
    """Adjoint of softmax attention, one (M-tile, head) at a time in VMEM.

    With P = softmax(QK^T*scale + mask):
        dV = P^T dO
        dP = dO V^T
        dS = P o (dP - rowsum(dP o P))
        dQ = dS K * scale ;  dK = dS^T Q * scale
    """
    Tp = q_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
    pad_mask = jnp.where(col < t_valid, 0.0, NEG_INF).astype(jnp.float32)
    for h in range(nh):
        sl = slice(h * dh, (h + 1) * dh)
        slv = slice(h * dv, (h + 1) * dv)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, slv]
        g = g_ref[:, :, slv]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # [mb, Tq, Tk]
        s = s + pad_mask
        if mask_ref is not None:
            s = s + mask_ref[h if mask_ref.shape[0] > 1 else 0]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)  # fp32 [mb, Tq, Tk]; P = e * rinv
        rinv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        # fold 1/rowsum into the [T, dv]-sized cotangent rows once instead
        # of normalizing the [T, T] matrix: with g' = g*rinv,
        #   dV = E^T g' ;  dP' = g' V^T = dP*rinv ;
        #   dS = P o (dP - delta) = E o (dP' - rowsum(dP' o E) * rinv)
        gp = (g.astype(jnp.float32) * rinv).astype(g.dtype)
        dv_ref[:, :, slv] = jax.lax.dot_general(
            e.astype(g.dtype), gp, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            gp, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [mb, Tq, Tk] (= dP*rinv)
        delta = jnp.sum(dp * e, axis=-1, keepdims=True) * rinv
        ds = (e * (dp - delta) * scale).astype(q.dtype)
        dq_ref[:, :, sl] = jax.lax.dot_general(
            ds, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[:, :, sl] = jax.lax.dot_general(
            ds, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _bwd_kernel_nomask(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, **kw):
    _bwd_kernel(q_ref, k_ref, v_ref, None, g_ref, dq_ref, dk_ref, dv_ref, **kw)


def _fused_backward(q, k, v, mask, g, nh, block_m):
    M, T, H = q.shape
    Hv = v.shape[2]
    dh = H // nh
    dv = Hv // nh
    Tp = -(-T // 128) * 128
    mb = block_m
    Mp = -(-M // mb) * mb

    def pad(x):
        return jnp.pad(x, ((0, Mp - M), (0, Tp - T), (0, 0)))

    qp, kp, vp, gp = pad(q), pad(k), pad(v), pad(g)
    kw = dict(nh=nh, dh=dh, dv=dv, scale=1.0 / math.sqrt(dh), t_valid=T)
    if mask is not None:
        mask3 = mask if mask.ndim == 3 else mask[None]
        mh = mask3.shape[0]
        maskp = jnp.pad(mask3.astype(jnp.float32), ((0, 0), (0, Tp - T), (0, Tp - T)))
        in_specs_mask = [pl.BlockSpec((mh, Tp, Tp), lambda i: (0, 0, 0),
                                      memory_space=pltpu.VMEM)]
        operands = (qp, kp, vp, maskp, gp)
        kernel = functools.partial(_bwd_kernel, **kw)
    else:
        in_specs_mask = []
        operands = (qp, kp, vp, gp)
        kernel = functools.partial(_bwd_kernel_nomask, **kw)

    spec = pl.BlockSpec((mb, Tp, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((mb, Tp, Hv), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((Mp, Tp, H), q.dtype)
    vshape = jax.ShapeDtypeStruct((Mp, Tp, Hv), q.dtype)
    dq, dk, dvals = pl.pallas_call(
        kernel,
        grid=(Mp // mb,),
        in_specs=[spec, spec, vspec] + in_specs_mask + [vspec],
        out_specs=(spec, spec, vspec),
        out_shape=(shape, shape, vshape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(*operands)
    return dq[:M, :T], dk[:M, :T], dvals[:M, :T]


def _fwd(q, k, v, mask, nh, block_m):
    return _fused_forward(q, k, v, mask, nh, block_m), (q, k, v, mask)


def _bwd(nh, block_m, res, g):
    q, k, v, mask = res
    dq, dk, dv = _fused_backward(q, k, v, mask, g, nh, block_m)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dq, dk, dv, dmask


narrowband_attention.defvjp(_fwd, _bwd)
