"""Benchmark: SpatialNet-small end-to-end separation throughput on one chip.

Measures the full inference pipeline (STFT -> norm -> SpatialNet-small (8
layers, bf16) -> inorm -> iSTFT) on 4-second 6-channel 8 kHz utterances —
the reference's headline config (configs/SpatialNet.yaml + BASELINE.md) —
and reports audio-seconds processed per wall-clock second per chip
(= real-time factor x batch).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / BASELINE_AUDIO_SEC_PER_SEC where the baseline
anchor is 5x real time x batch 16 — a conservative stand-in for the A100
real-time-factor target in BASELINE.json (the reference publishes no
measured throughput; see BASELINE.md).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# BASELINE.json north star: ">=5x A100 real-time-factor ... on a single v5e
# chip". Anchor: 5 x realtime per stream over a batch of 16 streams.
BASELINE_AUDIO_SEC_PER_SEC = 5.0 * 16


def main():
    from nbss_tpu.io import Loss, Norm, STFT
    from nbss_tpu.models import SpatialNet
    from nbss_tpu.train import TrainModule

    fs, secs, B, C, spk = 8000, 4.0, 16, 6, 2
    T = int(fs * secs)

    arch = SpatialNet(
        dim_input=2 * C, dim_output=2 * spk, num_layers=8, dim_hidden=96,
        dim_ffn=192, num_heads=4, kernel_size=(5, 3), conv_groups=(8, 8),
        norms=("LN", "LN", "GN", "LN", "LN", "LN"), dim_squeeze=8,
        num_freqs=129, full_share=0, dtype=jnp.bfloat16,
    )
    module = TrainModule(
        arch=arch, channels=tuple(range(C)), ref_channel=0,
        stft=STFT(n_fft=256, n_hop=128),
        norm=Norm(mode="frequency", online=True),
        loss=Loss(name="neg_si_sdr", pit=True),
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, C, T)), jnp.float32)

    Xin = jnp.zeros((1, 129, 251, 2 * C), jnp.float32)
    params = arch.init(jax.random.PRNGKey(0), Xin)

    # The whole timed region runs on device inside one jitted fori_loop —
    # each iteration depends on the previous one's output (prevents DCE /
    # overlap) and the single scalar fetch at the end is the only host sync.
    # (On the tunneled axon backend block_until_ready returns before remote
    # execution finishes; fetching a value is the only reliable sync.)
    @jax.jit
    def bench_fn(params, x, n):
        def body(i, carry):
            yr_hat, _ = module.forward(params, x + carry * 1e-9)
            return jnp.mean(yr_hat)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(bench_fn(params, x, 2))  # compile + warmup, synced by the fetch

    # best-of-3 timed loops: the tunneled chip's effective rate varies
    # +-8% run to run; min is the honest hardware capability
    iters = 20
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(bench_fn(params, x, iters))
        dt = min(dt, (time.perf_counter() - t0) / iters)

    audio_sec_per_sec = B * secs / dt
    print(json.dumps({
        "metric": "spatialnet_small_6ch_separation_throughput",
        "value": round(audio_sec_per_sec, 2),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(audio_sec_per_sec / BASELINE_AUDIO_SEC_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
