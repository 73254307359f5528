"""Micro-benchmark the selective-scan kernel vs the mamba block's matmuls.

VERDICT round-4 item 5: the OnlineSpatialNet mamba training step is 894 ms
(B=8, remat) with no speed-of-light decomposition. This script times, at
the real training shape ([B*F=1032, T=251, d_inner=192, N=16], 16 blocks
per model):

  scan fwd          selective_scan forward alone
  scan fwd+bwd      value_and_grad through the scan
  block fwd         full MambaBlock forward (matmuls + conv + scan + gate)
  block fwd+bwd     value_and_grad through the block
  matmuls fwd       the block with the scan replaced by a pass-through
                    (isolates in/x/dt/out projections + depthwise conv)

plus the VPU speed-of-light estimate for the scan's elementwise work
(~6 fp32 ops per (b, t, n, d) element) printed next to the measured time.

Usage: python scripts/bench_ssm_micro.py [M=1032] [T=251] [iters=10]
Env: NBSS_SSM_TCHUNK for chunk-length A/Bs.
"""

from __future__ import annotations

# run as `python scripts/<name>.py` from anywhere:
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn, args, iters, reps=3):
    float(fn(*args, 2))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args, iters))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    from nbss_tpu.models.mamba import MambaBlock
    from nbss_tpu.ops.ssm import selective_scan

    M = int(sys.argv[1]) if len(sys.argv) > 1 else 1032
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 251
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    d_model, N = 96, 16
    D = 2 * d_model
    rng = np.random.default_rng(0)
    f32, bf16 = jnp.float32, jnp.bfloat16

    x = jnp.asarray(rng.standard_normal((M, T, D)), bf16)
    dt = jax.nn.softplus(jnp.asarray(rng.standard_normal((M, T, D)), f32))
    A = -jnp.exp(jnp.asarray(rng.standard_normal((D, N)), f32))
    Bm = jnp.asarray(rng.standard_normal((M, T, N)), bf16)
    Cm = jnp.asarray(rng.standard_normal((M, T, N)), bf16)
    Dp = jnp.ones((D,), f32)

    @jax.jit
    def scan_fwd(x, dt, A, Bm, Cm, Dp, n):
        def body(i, c):
            y = selective_scan(x + c * 1e-9, dt, A, Bm, Cm, Dp)
            return jnp.mean(y.astype(f32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    @jax.jit
    def scan_fwdbwd(x, dt, A, Bm, Cm, Dp, n):
        def body(i, c):
            def loss(x, dt, Bm, Cm):
                return jnp.mean(selective_scan(
                    x + c * 1e-9, dt, A, Bm, Cm, Dp).astype(f32))
            l, gs = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(x, dt, Bm, Cm)
            return l + sum(jnp.sum(jnp.abs(g).astype(f32)) * 0 for g in gs) + \
                jnp.sum(jnp.abs(gs[0]).astype(f32)) * 1e-20
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    blk = MambaBlock(d_model=d_model, d_state=N, d_conv=4, dtype=bf16)
    xin = jnp.asarray(rng.standard_normal((M, T, d_model)), f32)
    params = blk.init(jax.random.PRNGKey(0), xin)

    @jax.jit
    def block_fwd(params, xin, n):
        def body(i, c):
            y = blk.apply(params, xin + c * 1e-9)
            return jnp.mean(y.astype(f32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    @jax.jit
    def block_fwdbwd(params, xin, n):
        def body(i, c):
            l, g = jax.value_and_grad(lambda p: jnp.mean(blk.apply(
                p, xin + c * 1e-9).astype(f32)))(params)
            return l + jnp.sum(jnp.abs(
                g["params"]["A_log"]).astype(f32)) * 1e-20
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    rows = [
        ("scan fwd", _timed(scan_fwd, (x, dt, A, Bm, Cm, Dp), iters)),
        ("scan fwd+bwd", _timed(scan_fwdbwd, (x, dt, A, Bm, Cm, Dp), iters)),
        ("block fwd", _timed(block_fwd, (params, xin), iters)),
        ("block fwd+bwd", _timed(block_fwdbwd, (params, xin), iters)),
    ]
    tc = os.environ.get("NBSS_SSM_TCHUNK", "8")
    print(f"\n== ssm micro M={M} T={T} D={D} N={N} t_chunk={tc} ==")
    for k, v in rows:
        print(f"{k:16s} {v:8.2f} ms")
    # VPU speed-of-light: ~6 fp32 elementwise ops (mul, exp ~2, mul, fma,
    # fma) per (b,t,n,d) element per direction
    elems = M * T * N * D
    print(f"scan elementwise elems/dir: {elems/1e9:.2f} G "
          f"(~{6*elems/1e9:.1f} GFLOP fp32 VPU per direction)")
    print("x16 blocks per OnlineSpatialNet model; compare block rows "
          "against scan rows to see matmul vs scan split")


if __name__ == "__main__":
    main()
