"""Benchmark OnlineSpatialNet frame-by-frame streaming inference on TPU.

The deployment path of the SPL-2024 online model (reference
OnlineSpatialNet.py:333-354 runs Python frame loops; here
``streaming_step`` is one jitted program per frame with an explicit O(1)
state pytree). Reports per-frame latency and the realtime factor at the
8 kHz / 128-sample-hop STFT (one frame every 16 ms).

Timing methodology: the whole T-frame stream runs inside ONE jitted
lax.scan carrying (state, outputs); a single scalar fetch syncs (the axon
backend's block_until_ready returns early). That measures the per-frame
DEVICE cost; a real deployment adds one dispatch (~10 ms tunnel RTT here,
sub-ms on a local chip) per frame.

Usage: python scripts/bench_streaming.py [attention=mamba(16,4)] [B=1] [T=251]
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


def main():
    from nbss_tpu.models import OnlineSpatialNet

    attention = sys.argv[1] if len(sys.argv) > 1 else "mamba(16,4)"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 251
    F, C, spk = 129, 6, 2
    hop_s = 128 / 8000  # frame hop in seconds

    arch = OnlineSpatialNet(
        dim_input=2 * C, dim_output=2 * spk, num_layers=8, dim_hidden=96,
        dim_ffn=192, num_heads=4, attention=attention, dim_squeeze=8,
        num_freqs=F, dtype=jnp.bfloat16)

    x = jnp.asarray(np.random.randn(B, F, T, 2 * C), jnp.bfloat16)
    params = arch.init(jax.random.PRNGKey(0), x[:, :, :8])
    state0 = arch.apply(params, B, method=arch.init_streaming_state)

    # params/state0/x as jit ARGUMENTS (constants embedded in a closure are
    # re-materialized per call on this backend -- 6x inflated timings)
    @jax.jit
    def f(params, state0, x):
        def step(state, x_t):
            y_t, state = arch.apply(params, x_t, state,
                                    method=arch.streaming_step)
            return state, y_t

        _, ys = jax.lax.scan(step, state0, jnp.moveaxis(x, 2, 0))
        return ys

    y = f(params, state0, x)
    float(jnp.sum(y.astype(jnp.float32)))  # compile + sync
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        y = f(params, state0, x)
    float(jnp.sum(y.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / reps
    per_frame_ms = dt / T * 1e3
    rtf = hop_s / (dt / T)
    print(f"streaming {attention} B={B}: {per_frame_ms:.2f} ms/frame "
          f"-> {rtf:.1f}x realtime per stream "
          f"({rtf * B:.1f} stream-seconds/s)")


if __name__ == "__main__":
    main()
