"""Selective state-space scan (Mamba-style) for TPU.

The reference reaches mamba-ssm's CUDA kernels (OnlineSpatialNet.py:15-19,
115-126); here the recurrence

    h_t = exp(dt_t * A) * h_{t-1} + (dt_t * B_t) * x_t
    y_t = C_t . h_t + D * x_t

runs as a ``lax.scan`` over time with fp32 state, wrapped in
``jax.checkpoint`` so the backward pass recomputes the scan instead of
storing [T, B, d_inner, d_state] activations — the same memory strategy as
the CUDA kernel. The carry is a few MB, keeping HBM traffic minimal; the
per-step einsums batch over (B, d_inner) on the VPU/MXU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.checkpoint, policy=jax.checkpoint_policies.nothing_saveable)
def _selective_scan_xla(
    x: jnp.ndarray,      # [B, T, D]   (post-conv, post-activation)
    dt: jnp.ndarray,     # [B, T, D]   (post-softplus)
    A: jnp.ndarray,      # [D, N]      (negative)
    Bm: jnp.ndarray,     # [B, T, N]
    Cm: jnp.ndarray,     # [B, T, N]
    D: jnp.ndarray,      # [D]
) -> jnp.ndarray:
    """Returns y [B, T, D] (without the gating / output projection)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    dt32 = dt.astype(jnp.float32)
    A32 = A.astype(jnp.float32)
    B32 = Bm.astype(jnp.float32)
    C32 = Cm.astype(jnp.float32)

    dA = jnp.exp(dt32[..., None] * A32)  # [B, T, D, N]
    dBx = (dt32 * x32)[..., None] * B32[:, :, None, :]  # [B, T, D, N]

    def step(h, inp):
        dA_t, dBx_t, C_t = inp
        h = dA_t * h + dBx_t  # [B, D, N]
        y_t = jnp.einsum("bdn,bn->bd", h, C_t)
        return h, y_t

    B_, T_, D_ = x.shape
    N_ = A.shape[-1]
    init = jnp.zeros((B_, D_, N_), jnp.float32)
    inps = (jnp.moveaxis(dA, 1, 0), jnp.moveaxis(dBx, 1, 0), jnp.moveaxis(C32, 1, 0))
    _, ys = jax.lax.scan(step, init, inps)
    y = jnp.moveaxis(ys, 0, 1)  # [B, T, D]
    return (y + x32 * D.astype(jnp.float32)).astype(dtype)


def _pallas_scan_kernel(x_ref, dt_ref, a_ref, b_ref, c_ref, y_ref, h_ref,
                        *, tc):
    """One T-chunk: x/dt [Tc, B, D]; a [N, D]; b/c [Tc, B, N]; the time index
    is the leading (untiled) dim so dynamic indexing is legal in Mosaic.
    h scratch [B, N, D] fp32 persists across the (sequential) T grid."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    a = a_ref[...]  # [N, D] fp32 (negative)

    def body(t, _):
        dt_t = dt_ref[t].astype(jnp.float32)  # [B, D]
        x_t = x_ref[t].astype(jnp.float32)
        b_t = b_ref[t].astype(jnp.float32)  # [B, N]
        c_t = c_ref[t].astype(jnp.float32)
        dA = jnp.exp(dt_t[:, None, :] * a[None])  # [B, N, D]
        dBx = (dt_t * x_t)[:, None, :] * b_t[:, :, None]
        h = dA * h_ref[...] + dBx
        h_ref[...] = h
        y_ref[t] = jnp.sum(h * c_t[:, :, None], axis=1).astype(y_ref.dtype)
        return 0

    # fori_loop so the per-step [B, N, D] temporaries are reused, not all
    # live at once (unrolling OOMs VMEM)
    jax.lax.fori_loop(0, tc, body, 0)


def selective_scan_pallas(
    x: jnp.ndarray,      # [B, T, D]
    dt: jnp.ndarray,     # [B, T, D] (post-softplus)
    A: jnp.ndarray,      # [D, N] (negative)
    Bm: jnp.ndarray,     # [B, T, N]
    Cm: jnp.ndarray,     # [B, T, N]
    D: jnp.ndarray,      # [D]
    t_chunk: int = 8,
) -> jnp.ndarray:
    """Pallas selective scan: serial only over T, the whole batch advances
    one frame per step with the state resident in VMEM. Avoids the XLA
    path's [B, T, D, N] dA/dBx materialization entirely. Forward only —
    ``selective_scan`` routes backward through the lax.scan reference."""
    B_, T_, D_ = x.shape
    N_ = A.shape[-1]
    Bp = -(-B_ // 8) * 8
    Tp = -(-T_ // t_chunk) * t_chunk

    def padx(v, dims):
        pads = [(0, p) for p in dims]
        return jnp.pad(v, pads)

    def tmajor(v, pad_feat=0):
        v = jnp.moveaxis(v, 1, 0)  # [T, B, F]
        return jnp.pad(v, ((0, Tp - T_), (0, Bp - B_), (0, 0)))

    xp = tmajor(x)
    dtp = tmajor(dt)
    bp = tmajor(Bm)
    cp = tmajor(Cm)
    a_t = jnp.transpose(A, (1, 0)).astype(jnp.float32)  # [N, D]

    seq_spec = lambda feat: pl.BlockSpec((t_chunk, Bp, feat), lambda i: (i, 0, 0),
                                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_pallas_scan_kernel, tc=t_chunk),
        grid=(Tp // t_chunk,),
        in_specs=[
            seq_spec(D_), seq_spec(D_),
            pl.BlockSpec((N_, D_), lambda i: (0, 0), memory_space=pltpu.VMEM),
            seq_spec(N_), seq_spec(N_),
        ],
        out_specs=seq_spec(D_),
        out_shape=jax.ShapeDtypeStruct((Tp, Bp, D_), x.dtype),
        scratch_shapes=[pltpu.VMEM((Bp, N_, D_), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(xp, dtp, a_t, bp, cp)
    y = jnp.moveaxis(out[:T_, :B_], 0, 1)  # [B, T, D]
    return (y.astype(jnp.float32) + x.astype(jnp.float32) * D.astype(jnp.float32)
            ).astype(x.dtype)


def selective_scan_step(
    h: jnp.ndarray,      # [B, D, N] fp32 carry
    x_t: jnp.ndarray,    # [B, D]
    dt_t: jnp.ndarray,   # [B, D]
    A: jnp.ndarray,      # [D, N]
    B_t: jnp.ndarray,    # [B, N]
    C_t: jnp.ndarray,    # [B, N]
    D: jnp.ndarray,      # [D]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single streaming step; returns (h', y_t [B, D])."""
    x32 = x_t.astype(jnp.float32)
    dt32 = dt_t.astype(jnp.float32)
    dA = jnp.exp(dt32[..., None] * A.astype(jnp.float32))  # [B, D, N]
    dBx = (dt32 * x32)[..., None] * B_t.astype(jnp.float32)[:, None, :]
    h = dA * h + dBx
    y = jnp.einsum("bdn,bn->bd", h, C_t.astype(jnp.float32))
    y = y + x32 * D.astype(jnp.float32)
    return h, y.astype(x_t.dtype)


@jax.custom_vjp
def selective_scan(x, dt, A, Bm, Cm, D):
    """Public selective scan: Pallas forward on TPU (state in VMEM, no
    [B,T,D,N] materialization), lax.scan elsewhere; backward recomputes
    through the checkpointed lax.scan reference on every backend."""
    if jax.default_backend() == "tpu":
        return selective_scan_pallas(x, dt, A, Bm, Cm, D)
    return _selective_scan_xla(x, dt, A, Bm, Cm, D)


def _ss_fwd(x, dt, A, Bm, Cm, D):
    return selective_scan(x, dt, A, Bm, Cm, D), (x, dt, A, Bm, Cm, D)


def _ss_bwd(res, gy):
    """Reverse-time adjoint scan with an O(B*D*N) carry.

    A naive vjp of the lax.scan reference materializes the [B, T, D, N]
    dA/dBx tensors (HBM OOM for 8 layers x 2 mambas at bench sizes); here
    only the forward states h_t are stored ([T, B, D, N], one tensor) and
    every per-step quantity is recomputed inside the reverse scan.
    """
    x, dt, A, Bm, Cm, D = res
    dtype_in = [v.dtype for v in res]
    x32 = x.astype(jnp.float32)
    dt32 = dt.astype(jnp.float32)
    A32 = A.astype(jnp.float32)
    B32 = Bm.astype(jnp.float32)
    C32 = Cm.astype(jnp.float32)
    gy32 = gy.astype(jnp.float32)
    B_, T_, D_ = x.shape
    N_ = A.shape[-1]

    xT = jnp.moveaxis(x32, 1, 0)
    dtT = jnp.moveaxis(dt32, 1, 0)
    bT = jnp.moveaxis(B32, 1, 0)
    cT = jnp.moveaxis(C32, 1, 0)
    gyT = jnp.moveaxis(gy32, 1, 0)

    h0 = jnp.zeros((B_, D_, N_), jnp.float32)

    def fstep(h, inp):
        dt_t, x_t, b_t = inp
        dA = jnp.exp(dt_t[..., None] * A32)
        h = dA * h + (dt_t * x_t)[..., None] * b_t[:, None, :]
        return h, h

    _, hs = jax.lax.scan(fstep, h0, (dtT, xT, bT))  # [T, B, D, N]
    h_prev = jnp.concatenate([h0[None], hs[:-1]], axis=0)

    def bstep(carry, inp):
        lam_in, gA = carry  # lam_in = dA_{t+1}^T lam_{t+1}
        h_tm1, h_t, dt_t, x_t, b_t, c_t, gy_t = inp
        lam = lam_in + gy_t[..., None] * c_t[:, None, :]  # [B, D, N]
        dA = jnp.exp(dt_t[..., None] * A32)
        gdA = lam * h_tm1
        lamB = jnp.einsum("bdn,bn->bd", lam, b_t)
        gdt = jnp.einsum("bdn,dn->bd", gdA * dA, A32) + lamB * x_t
        gx = lamB * dt_t + gy_t * D.astype(jnp.float32)
        gB = jnp.einsum("bdn,bd->bn", lam, dt_t * x_t)
        gC = jnp.einsum("bd,bdn->bn", gy_t, h_t)
        gA = gA + jnp.einsum("bdn,bd->dn", gdA * dA, dt_t)
        return (dA * lam, gA), (gdt, gx, gB, gC)

    (_, gA), (gdtT, gxT, gBT, gCT) = jax.lax.scan(
        bstep,
        (jnp.zeros_like(h0), jnp.zeros((D_, N_), jnp.float32)),
        (h_prev, hs, dtT, xT, bT, cT, gyT),
        reverse=True,
    )
    gD = jnp.einsum("btd,btd->d", gy32, x32)
    outs = (
        jnp.moveaxis(gxT, 0, 1), jnp.moveaxis(gdtT, 0, 1), gA,
        jnp.moveaxis(gBT, 0, 1), jnp.moveaxis(gCT, 0, 1), gD,
    )
    return tuple(o.astype(dt_) for o, dt_ in zip(outs, dtype_in))


selective_scan.defvjp(_ss_fwd, _ss_bwd)
