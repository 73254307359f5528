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


@functools.partial(jax.checkpoint, policy=jax.checkpoint_policies.nothing_saveable)
def selective_scan(
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
