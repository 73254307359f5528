"""Benchmark the full SpatialNet-small training step on one TPU chip.

Same methodology as bench.py: the timed region is one jitted fori_loop of
full train steps (forward + uPIT SI-SDR + backward + Adam) with the
(params, opt_state) carry threading a data dependency between iterations;
the single scalar fetch at the end is the only host sync.

Usage: python scripts/bench_train_step.py [batch=8] [iters=10] [remat] [mamba]
(``mamba`` benches the OnlineSpatialNet mamba(16,4) step instead; neg_snr
loss per configs/onlineSpatialNet.yaml.)
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
import optax


def main():
    from nbss_tpu.io import Loss, Norm, STFT
    from nbss_tpu.models import SpatialNet
    from nbss_tpu.train import TrainModule
    from nbss_tpu.train.optim import build_optimizer

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    remat = "remat" in sys.argv[3:]  # per-layer jax.checkpoint (big-B HBM fit)
    mamba = "mamba" in sys.argv[3:]
    fs, secs, C, spk = 8000, 4.0, 6, 2
    T = int(fs * secs)

    if mamba:
        from nbss_tpu.models import OnlineSpatialNet

        arch = OnlineSpatialNet(
            dim_input=2 * C, dim_output=2 * spk, num_layers=8, dim_hidden=96,
            dim_ffn=192, num_heads=4, kernel_size=(5, 3), conv_groups=(8, 8),
            norms=("LN", "LN", "GN", "LN", "LN", "LN"), dim_squeeze=8,
            num_freqs=129, full_share=0, attention="mamba(16,4)",
            dtype=jnp.bfloat16, remat=remat,
        )
        module = TrainModule(
            arch=arch, channels=tuple(range(C)), ref_channel=0,
            stft=STFT(n_fft=256, n_hop=128),
            norm=Norm(mode="utterance", online=True),
            loss=Loss(name="neg_snr", pit=True),
        )
    else:
        arch = SpatialNet(
            dim_input=2 * C, dim_output=2 * spk, num_layers=8, dim_hidden=96,
            dim_ffn=192, num_heads=4, kernel_size=(5, 3), conv_groups=(8, 8),
            norms=("LN", "LN", "GN", "LN", "LN", "LN"), dim_squeeze=8,
            num_freqs=129, full_share=0, dtype=jnp.bfloat16, remat=remat,
        )
        module = TrainModule(
            arch=arch, channels=tuple(range(C)), ref_channel=0,
            stft=STFT(n_fft=256, n_hop=128),
            norm=Norm(mode="frequency", online=True),
            loss=Loss(name="neg_si_sdr", pit=True),
        )
    tx = build_optimizer("Adam", {"lr": 1e-3}, 5.0)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, C, T)), jnp.float32)
    ys = jnp.asarray(rng.standard_normal((B, spk, C, T)) * 0.3, jnp.float32)

    Xin = jnp.zeros((1, 129, 251, 2 * C), jnp.float32)
    params = arch.init(jax.random.PRNGKey(0), Xin)
    opt_state = tx.init(params)

    @jax.jit
    def bench_fn(params, opt_state, x, ys, n):
        def body(i, carry):
            params, opt_state, _ = carry
            key = jax.random.fold_in(jax.random.PRNGKey(0), i)

            def loss_fn(p):
                return module.training_step(p, (x, ys), rngs={"dropout": key})

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        _, _, loss = jax.lax.fori_loop(
            0, n, body, (params, opt_state, jnp.float32(0.0)))
        return loss

    print("compiling...", flush=True)
    float(bench_fn(params, opt_state, x, ys, 2))  # compile + warmup
    t0 = time.perf_counter()
    float(bench_fn(params, opt_state, x, ys, iters))
    dt = (time.perf_counter() - t0) / iters
    tag = "mamba " if mamba else ""
    print(f"{tag}train step (B={B}): {dt * 1e3:.1f} ms  "
          f"-> {B * secs / dt:.0f} audio-sec/s training throughput")


if __name__ == "__main__":
    main()
