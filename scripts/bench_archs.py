"""Per-family forward benchmark on one TPU chip.

Times the jitted arch forward (bf16, [B, F, T, H] layout, B=8 x 4 s
8 kHz, F=129/257 as the arch expects) for each of the five model
families; same fori_loop + scalar-fetch timing methodology as bench.py.

Usage: python scripts/bench_archs.py [family ...]
Families: spatialnet nbc nbc2 nbblstm online-mamba online-ret online-mhsa
"""

from __future__ import annotations

# run as `python scripts/<name>.py` from anywhere:
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(name):
    from nbss_tpu.models import (BLSTM2_FC1, NBC, NBC2, OnlineSpatialNet,
                                 SpatialNet)

    C, spk = 6, 2
    if name == "spatialnet":
        return SpatialNet(dim_input=2 * C, dim_output=2 * spk, num_layers=8,
                          dim_hidden=96, dim_ffn=192, num_heads=4,
                          kernel_size=(5, 3), conv_groups=(8, 8),
                          norms=("LN", "LN", "GN", "LN", "LN", "LN"),
                          dim_squeeze=8, num_freqs=129, full_share=0,
                          dtype=jnp.bfloat16), 12
    if name == "nbc":
        return NBC(dim_input=2 * C, dim_output=2 * spk, n_layers=4,
                   hidden_size=192, dtype=jnp.bfloat16), 12
    if name == "nbc2":
        return NBC2(dim_input=2 * C, dim_output=2 * spk, n_layers=8,
                    dim_hidden=96, dim_ffn=192, num_freqs=129, n_heads=2,
                    dtype=jnp.bfloat16), 12
    if name == "nbblstm":
        return BLSTM2_FC1(dim_input=2 * C, dim_output=2 * spk,
                          dtype=jnp.bfloat16), 12
    att = {"online-mamba": "mamba(16,4)", "online-ret": "ret(2,share_qk)",
           "online-mhsa": "mhsa(251)"}[name]
    return OnlineSpatialNet(dim_input=2 * C, dim_output=2 * spk, num_layers=8,
                            dim_hidden=96, dim_ffn=192, num_heads=4,
                            attention=att, dim_squeeze=8, num_freqs=129,
                            dtype=jnp.bfloat16), 12


def main():
    names = sys.argv[1:] or ["spatialnet", "nbc", "nbc2", "nbblstm",
                             "online-mamba", "online-ret", "online-mhsa"]
    B, F, T, secs = 8, 129, 251, 4.0
    for name in names:
        arch, dim_in = build(name)
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (B, F, T, dim_in)), jnp.bfloat16)
        params = arch.init(jax.random.PRNGKey(0), x)

        # params/x MUST be jit ARGUMENTS: a zero-arg closure embeds them as
        # HLO constants, which this backend re-materializes per call (6x
        # inflated timings, measured -- see BENCH_NOTES round 2)
        @jax.jit
        def loop(params, x, n):
            def body(i, c):
                return jnp.mean(arch.apply(params, x + c * 1e-9
                                           ).astype(jnp.float32))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(loop(params, x, 2))
        t0 = time.perf_counter()
        float(loop(params, x, 10))
        dt = (time.perf_counter() - t0) / 10
        print(f"{name}: {dt*1e3:.1f} ms fwd (B={B}) -> "
              f"{B * secs / dt:.0f} audio-sec/s", flush=True)


if __name__ == "__main__":
    main()
