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
import os
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


def _pallas_scan_kernel(x_ref, dt_ref, a_ref, b_ref, c_ref, y_ref, hb_ref,
                        h_ref, *, tc, tdim):
    """One (M-tile, T-chunk) grid cell: x/dt [Tc, Bm, D]; a [N, D]; b/c
    [Tc, Bm, N]. The time index is the leading (untiled) dim of a ≤3-D ref
    so dynamic indexing is a cheap address offset in Mosaic (dynamic
    indexing into ≥4-D VMEM scratch lowers to masked whole-buffer stores —
    50x slower, measured). h scratch [Bm, N, D] fp32 persists across the
    sequential T grid (minor axis) and resets per M tile.

    hb (optional, None to skip): per-chunk boundary state [1, Bm, N, D] —
    the state at the START of this chunk, saved (static index write) for
    the backward kernel's chunked recompute.

    tdim: which grid axis is the sequential T sweep (0 for the common
    single-M-tile 1-D grid, 1 for the M-tiled 2-D grid)."""
    @pl.when(pl.program_id(tdim) == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    if hb_ref is not None:
        hb_ref[0] = h_ref[...]

    a = a_ref[...]  # [N, D] fp32 (negative)

    def body(t, _):
        dt_t = dt_ref[t].astype(jnp.float32)  # [Bm, D]
        x_t = x_ref[t].astype(jnp.float32)
        b_t = b_ref[t].astype(jnp.float32)  # [Bm, N]
        c_t = c_ref[t].astype(jnp.float32)
        dA = jnp.exp(dt_t[:, None, :] * a[None])  # [Bm, N, D]
        dBx = (dt_t * x_t)[:, None, :] * b_t[:, :, None]
        h = dA * h_ref[...] + dBx
        h_ref[...] = h
        y_ref[t] = jnp.sum(h * c_t[:, :, None], axis=1).astype(y_ref.dtype)
        return 0

    # fori_loop so the per-step [Bm, N, D] temporaries are reused, not all
    # live at once (unrolling OOMs VMEM)
    jax.lax.fori_loop(0, tc, body, 0)


def _m_tiling(Bp: int, cap: int = 256):
    """Split the (padded) batch into grid tiles of at most ~cap rows."""
    n_tiles = -(-Bp // cap)
    bm = -(-Bp // n_tiles // 8) * 8
    return bm, n_tiles, bm * n_tiles


# Scoped-VMEM budget the cap model sizes tiles against. The model is
# calibrated to the current libtpu's stack accounting (see
# _fwd_vmem_cap_rows); if a future release changes accounting and a
# compile dies with 'exceeded scoped vmem limit', the RUNTIME recovery is
# NBSS_SSM_VMEM_BUDGET=<bytes> (e.g. 48e6) — it shrinks every derived tile
# without a code edit. An automatic catch-halve-retry probe was considered
# and rejected: the error only surfaces when the ENCLOSING jit compiles,
# and a pre-flight probe would pay a second multi-minute Mosaic compile
# per unique shape to guard a once-per-libtpu-bump event.
_VMEM_BUDGET = int(float(os.environ.get("NBSS_SSM_VMEM_BUDGET",
                                        64 * 1024 * 1024)))


def _fwd_vmem_cap_rows(tc: int, D_: int, N_: int, x_item: int, dt_item: int,
                       b_item: int, c_item: int, boundaries: bool) -> int:
    """Max M-tile rows the forward kernel can hold inside the scoped-VMEM
    budget. Models the compiler's stack accounting: each [tc, bm, feat]
    in/out block pads feat to 128 lanes, input blocks are pipelined up to
    3-deep across the sequential T grid (outputs 2-deep); the [1, bm, N, D]
    boundary output block and the [bm, N, D] fp32 state scratch pad N to 8
    sublanes and D to 128 lanes. A hard-coded row cap (1056 until round 3)
    compiled on one libtpu release and died with 'exceeded scoped vmem
    limit' on the next — scoped-vmem accounting is a moving target, so
    derive the cap from the shapes instead of pinning a magic number.

    Each operand is modeled at its OWN itemsize: ``dt`` is the fp32
    softplus island even in bf16-mixed runs (mamba.py), and accounting it
    at x's 2 bytes undersized the model by 2x on the dt blocks — the
    inference path (no boundary outputs, hence the largest cap) then chose
    a single 1032-row tile whose real footprint (82.4 MiB) blew the ~70 MiB
    scoped limit while the modeled one (50 MiB) fit. Observed-vs-modeled on
    that shape calibrates the 3-deep input pipelining and the 0.8 margin."""
    lane = lambda f: -(-f // 128) * 128
    sub = lambda s: -(-s // 8) * 8
    # bm rows of a [tc, bm, feat] block tile sublanes in units of the
    # narrowest dtype's sublane multiple (16 for 2-byte dtypes, 8 for
    # fp32), so the returned cap must be a multiple of it or small-bm bf16
    # blocks cost up to 2x the modeled per-row bytes (worst at bm=8).
    sub_mult = max(8, 32 // min(x_item, dt_item, b_item, c_item))
    per_row = (
        3 * tc * lane(D_) * (x_item + dt_item)  # x, dt in-blocks, pipelined
        + 3 * tc * lane(N_) * (b_item + c_item)  # b, c in-blocks
        + 2 * tc * lane(D_) * x_item            # y out-block
        + sub(N_) * lane(D_) * 4                # h state scratch (fp32)
    )
    if boundaries:
        per_row += 2 * sub(N_) * lane(D_) * 4  # hb out-block (fp32)
    fixed = sub(N_) * lane(D_) * 4              # constant [N, D] a-block
    rows = (int(_VMEM_BUDGET * 0.8) - fixed) // per_row
    return max(sub_mult, rows // sub_mult * sub_mult)


def selective_scan_pallas(
    x: jnp.ndarray,      # [B, T, D]
    dt: jnp.ndarray,     # [B, T, D] (post-softplus)
    A: jnp.ndarray,      # [D, N] (negative)
    Bm: jnp.ndarray,     # [B, T, N]
    Cm: jnp.ndarray,     # [B, T, N]
    D: jnp.ndarray,      # [D]
    t_chunk: int = 8,
    return_boundaries: bool = False,
    cap: int = 1056,
):
    """Pallas selective scan: serial only over T, the whole batch advances
    one frame per step with the state resident in VMEM. Avoids the XLA
    path's [B, T, D, N] dA/dBx materialization entirely.

    return_boundaries=True additionally returns the chunk-start states
    [n_chunks, B, N, D] fp32 consumed by ``_pallas_scan_bwd`` — 1/t_chunk
    of the activation memory a naive vjp would store."""
    B_, T_, D_ = x.shape
    N_ = A.shape[-1]
    Bp0 = -(-B_ // 8) * 8
    # single M tile (1-D grid over T chunks) for any batch the VMEM budget
    # allows — the 2-D M-tiled grid exists only for very large B*F
    vmem_cap = _fwd_vmem_cap_rows(t_chunk, D_, N_, x.dtype.itemsize,
                                  dt.dtype.itemsize, Bm.dtype.itemsize,
                                  Cm.dtype.itemsize, return_boundaries)
    bm, n_mt, Bp = _m_tiling(Bp0, cap=min(cap, vmem_cap))
    Tp = -(-T_ // t_chunk) * t_chunk
    n_chunks = Tp // t_chunk

    def tmajor(v):
        v = jnp.moveaxis(v, 1, 0)  # [T, B, F]
        return jnp.pad(v, ((0, Tp - T_), (0, Bp - B_), (0, 0)))

    xp = tmajor(x)
    dtp = tmajor(dt)
    bp = tmajor(Bm)
    cp = tmajor(Cm)
    a_t = jnp.transpose(A, (1, 0)).astype(jnp.float32)  # [N, D]

    if n_mt == 1:
        grid = (n_chunks,)
        tdim = 0
        seq_ix, hb_ix, a_ix = (lambda t: (t, 0, 0)), (lambda t: (t, 0, 0, 0)), (lambda t: (0, 0))
    else:
        grid = (n_mt, n_chunks)
        tdim = 1
        seq_ix, hb_ix, a_ix = (lambda m, t: (t, m, 0)), (lambda m, t: (t, m, 0, 0)), (lambda m, t: (0, 0))
    seq_spec = lambda feat: pl.BlockSpec((t_chunk, bm, feat), seq_ix,
                                         memory_space=pltpu.VMEM)
    out_specs = [seq_spec(D_)]
    out_shapes = [jax.ShapeDtypeStruct((Tp, Bp, D_), x.dtype)]
    kernel = functools.partial(_pallas_scan_kernel, tc=t_chunk, tdim=tdim)
    if return_boundaries:
        out_specs.append(pl.BlockSpec((1, bm, N_, D_), hb_ix,
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((n_chunks, Bp, N_, D_),
                                               jnp.float32))
    else:
        kernel = functools.partial(_pallas_scan_kernel_noboundary, tc=t_chunk,
                                   tdim=tdim)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            seq_spec(D_), seq_spec(D_),
            pl.BlockSpec((N_, D_), a_ix, memory_space=pltpu.VMEM),
            seq_spec(N_), seq_spec(N_),
        ],
        out_specs=out_specs if return_boundaries else out_specs[0],
        out_shape=out_shapes if return_boundaries else out_shapes[0],
        scratch_shapes=[pltpu.VMEM((bm, N_, D_), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(grid),
            vmem_limit_bytes=max(64 * 1024 * 1024, _VMEM_BUDGET)),
        interpret=jax.default_backend() == "cpu",
    )(xp, dtp, a_t, bp, cp)
    out, hb = outs if return_boundaries else (outs, None)
    y = jnp.moveaxis(out[:T_, :B_], 0, 1)  # [B, T, D]
    y = (y.astype(jnp.float32) + x.astype(jnp.float32) * D.astype(jnp.float32)
         ).astype(x.dtype)
    return (y, hb) if return_boundaries else y


def _pallas_scan_kernel_noboundary(x_ref, dt_ref, a_ref, b_ref, c_ref, y_ref,
                                   h_ref, *, tc, tdim):
    _pallas_scan_kernel(x_ref, dt_ref, a_ref, b_ref, c_ref, y_ref, None,
                        h_ref, tc=tc, tdim=tdim)


def _pallas_scan_bwd_kernel(x_ref, dt_ref, a_ref, b_ref, c_ref, gy_ref, hb_ref,
                            gx_ref, gdt_ref, gb_ref, gc_ref, ga_ref,
                            lam_ref, ga_acc_ref, *, tc, n_chunks, tdim):
    """Reverse-time adjoint, one (M-tile, reverse-ordered T-chunk) per grid
    cell.

    Within the chunk the states h are recomputed forward from the saved
    chunk-start state; the adjoint lam then runs backward. Both in-chunk
    loops are PYTHON-unrolled so every time index is static — dynamic
    indexing into ≥4-D VMEM scratch lowers to masked whole-buffer stores in
    Mosaic (50x slower, measured), so no [tc, Bm, N, D] scratch exists at
    all; Mosaic spills the tc+1 live chunk states to VMEM itself. lam and
    the gA accumulator persist in VMEM across the sequential T sweep of
    each M tile; state-sized tensors never touch HBM. Gradient math
    mirrors ``_ss_bwd``:

        lam_t  = dA_{t+1} * lam_{t+1} + gy_t (x) c_t
        g_dt   = sum_n (lam*h_{t-1}*dA*A) + (lam . b_t) * x_t
        g_x    = (lam . b_t) * dt_t            (+ gy*D added by the wrapper)
        g_B    = sum_d lam * (dt*x) ;  g_C = sum_d gy (x) h_t
        g_A   += sum_b lam*h_{t-1}*dA*dt
    """
    m = pl.program_id(0) if tdim == 1 else 0
    t_rev = pl.program_id(tdim)

    @pl.when(t_rev == 0)
    def _():
        lam_ref[...] = jnp.zeros_like(lam_ref)
        ga_acc_ref[...] = jnp.zeros_like(ga_acc_ref)

    a = a_ref[...]  # [N, D] fp32 (negative)

    # forward recompute of in-chunk states from the saved boundary
    # (unrolled; hs[t] = state BEFORE step t)
    hs = [hb_ref[0]]
    das = []
    for t in range(tc):
        dt_t = dt_ref[t].astype(jnp.float32)
        x_t = x_ref[t].astype(jnp.float32)
        b_t = b_ref[t].astype(jnp.float32)  # [Bm, N]
        dA = jnp.exp(dt_t[:, None, :] * a[None])  # [Bm, N, D]
        hs.append(dA * hs[-1] + (dt_t * x_t)[:, None, :] * b_t[:, :, None])
        das.append(dA)

    lam = lam_ref[...]
    ga = ga_acc_ref[...]
    for t in range(tc - 1, -1, -1):
        dt_t = dt_ref[t].astype(jnp.float32)
        x_t = x_ref[t].astype(jnp.float32)
        b_t = b_ref[t].astype(jnp.float32)  # [Bm, N]
        c_t = c_ref[t].astype(jnp.float32)
        gy_t = gy_ref[t].astype(jnp.float32)  # [Bm, D]

        lam = lam + gy_t[:, None, :] * c_t[:, :, None]  # [Bm, N, D]
        dA = das[t]
        gdAdA = lam * hs[t] * dA  # lam * h_{t-1} * dA
        lamB = jnp.sum(lam * b_t[:, :, None], axis=1)  # [Bm, D]
        gdt_ref[t] = (jnp.sum(gdAdA * a[None], axis=1)
                      + lamB * x_t).astype(gdt_ref.dtype)
        gx_ref[t] = (lamB * dt_t).astype(gx_ref.dtype)
        gb_ref[t] = jnp.sum(lam * (dt_t * x_t)[:, None, :], axis=-1).astype(gb_ref.dtype)
        gc_ref[t] = jnp.sum(gy_t[:, None, :] * hs[t + 1], axis=-1).astype(gc_ref.dtype)
        ga = ga + jnp.sum(gdAdA * dt_t[:, None, :], axis=0)
        lam = dA * lam
    lam_ref[...] = lam
    ga_acc_ref[...] = ga

    @pl.when(t_rev == n_chunks - 1)
    def _():
        prev = jnp.where(m == 0, jnp.zeros_like(ga_acc_ref[...]), ga_ref[...])
        ga_ref[...] = prev + ga_acc_ref[...]


def _pallas_scan_bwd(x, dt, A, Bm, Cm, hb, gy, t_chunk: int = 8):
    """Pallas reverse scan; returns (gx_core, gdt, gA, gB, gC) — the
    wrapper adds the gy*D and D-gradient terms. t_chunk must match the
    forward call that produced the boundary states hb."""
    B_, T_, D_ = x.shape
    N_ = A.shape[-1]
    Bp0 = -(-B_ // 8) * 8
    # small tiles measure FASTER here than one full-batch tile (1211 vs
    # 1511 ms model grad at B*F=258): the tc+1 unrolled chunk states stay
    # small enough for Mosaic to keep resident while grid cells pipeline
    bm, n_mt, Bp = _m_tiling(Bp0, cap=128)
    Tp = -(-T_ // t_chunk) * t_chunk
    n_chunks = Tp // t_chunk
    if hb.shape[1] != Bp:  # forward may have used a different M padding
        hb = (jnp.pad(hb, ((0, 0), (0, Bp - hb.shape[1]), (0, 0), (0, 0)))
              if hb.shape[1] < Bp else hb[:, :Bp])

    def tmajor(v):
        v = jnp.moveaxis(v, 1, 0)
        return jnp.pad(v, ((0, Tp - T_), (0, Bp - B_), (0, 0)))

    xp, dtp, bp, cp, gyp = (tmajor(v) for v in (x, dt, Bm, Cm, gy))
    a_t = jnp.transpose(A, (1, 0)).astype(jnp.float32)  # [N, D]

    if n_mt == 1:
        grid = (n_chunks,)
        tdim = 0
        rev = lambda t: (n_chunks - 1 - t, 0, 0)
        rev_hb = lambda t: (n_chunks - 1 - t, 0, 0, 0)
        a_ix = lambda t: (0, 0)
    else:
        grid = (n_mt, n_chunks)
        tdim = 1
        rev = lambda m, t: (n_chunks - 1 - t, m, 0)
        rev_hb = lambda m, t: (n_chunks - 1 - t, m, 0, 0)
        a_ix = lambda m, t: (0, 0)
    seq_spec = lambda feat: pl.BlockSpec((t_chunk, bm, feat), rev,
                                         memory_space=pltpu.VMEM)
    gx, gdt, gb, gc, ga = pl.pallas_call(
        functools.partial(_pallas_scan_bwd_kernel, tc=t_chunk,
                          n_chunks=n_chunks, tdim=tdim),
        grid=grid,
        in_specs=[
            seq_spec(D_), seq_spec(D_),
            pl.BlockSpec((N_, D_), a_ix, memory_space=pltpu.VMEM),
            seq_spec(N_), seq_spec(N_),
            seq_spec(D_),
            pl.BlockSpec((1, bm, N_, D_), rev_hb, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            seq_spec(D_), seq_spec(D_), seq_spec(N_), seq_spec(N_),
            pl.BlockSpec((N_, D_), a_ix, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Bp, D_), jnp.float32),
            jax.ShapeDtypeStruct((Tp, Bp, D_), jnp.float32),
            jax.ShapeDtypeStruct((Tp, Bp, N_), jnp.float32),
            jax.ShapeDtypeStruct((Tp, Bp, N_), jnp.float32),
            jax.ShapeDtypeStruct((N_, D_), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bm, N_, D_), jnp.float32),
            pltpu.VMEM((N_, D_), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(grid),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(xp, dtp, a_t, bp, cp, gyp, hb)

    unpad = lambda v: jnp.moveaxis(v[:T_, :B_], 0, 1)
    return unpad(gx), unpad(gdt), jnp.transpose(ga, (1, 0)), unpad(gb), unpad(gc)


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
    """Public selective scan: Pallas forward + Pallas reverse-scan backward
    on TPU (state resident in VMEM, only chunk-boundary states in HBM);
    lax.scan forward + reverse-scan backward elsewhere.

    A flat-lane [Bm, N*D] kernel layout was A/B'd in round 2 and measured
    ~25% slower end to end (BENCH_NOTES.md "Flat-lane scan layout"); the
    variant was removed — this [Bm, N, D] family is the one maintained
    path.

    NBSS_SSM_TCHUNK overrides the kernel's sequential chunk length (default
    8 frames/grid step) for A/B measurements; the forward and the
    boundary-consuming backward always use the same value."""
    if jax.default_backend() == "tpu":
        return selective_scan_pallas(x, dt, A, Bm, Cm, D,
                                     t_chunk=_t_chunk())
    return _selective_scan_xla(x, dt, A, Bm, Cm, D)


def _t_chunk() -> int:
    return int(os.environ.get("NBSS_SSM_TCHUNK", "8"))


def _ss_fwd(x, dt, A, Bm, Cm, D):
    if jax.default_backend() == "tpu":
        y, hb = selective_scan_pallas(x, dt, A, Bm, Cm, D,
                                      return_boundaries=True,
                                      t_chunk=_t_chunk())
        return y, (x, dt, A, Bm, Cm, D, hb)
    return selective_scan(x, dt, A, Bm, Cm, D), (x, dt, A, Bm, Cm, D, None)


def _ss_bwd(res, gy):
    """Reverse-time adjoint with an O(B*D*N) carry.

    TPU: the Pallas reverse kernel recomputes in-chunk states from the
    forward's saved chunk boundaries entirely in VMEM (``_pallas_scan_bwd``).
    Other backends: a lax.scan that stores the forward states h_t
    ([T, B, D, N], one tensor) and recomputes every per-step quantity inside
    the reverse scan (a naive vjp of the scan reference would materialize
    the [B, T, D, N] dA/dBx tensors — HBM OOM at bench sizes).
    """
    x, dt, A, Bm, Cm, D, hb = res
    if hb is not None:
        dtype_in = [v.dtype for v in (x, dt, A, Bm, Cm, D)]
        x32, dt32 = x.astype(jnp.float32), dt.astype(jnp.float32)
        gy32 = gy.astype(jnp.float32)
        gx, gdt, gA, gB, gC = _pallas_scan_bwd(
            x32, dt32, A.astype(jnp.float32), Bm.astype(jnp.float32),
            Cm.astype(jnp.float32), hb, gy32, t_chunk=_t_chunk())
        gx = gx + gy32 * D.astype(jnp.float32)
        gD = jnp.einsum("btd,btd->d", gy32, x32)
        outs = (gx, gdt, gA, gB, gC, gD)
        return tuple(o.astype(t) for o, t in zip(outs, dtype_in))
    dtype_in = [v.dtype for v in res[:6]]
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
