"""Decompose the SpatialNet-small training step into timed components.

VERDICT round-4 item 3: the 477.8 ms step (B=8, throttled chip) has no
breakdown identifying where the ~3x over the round-2 <=120 ms target lives.
This script times nested prefixes of the step with the axon-safe
methodology (each timed region is ONE jitted fori_loop whose carry threads
a data dependency; a single scalar fetch syncs), then reports the
differences:

    arch fwd            forward through the network only ([B,F,T,2C] in)
    dsp fwd             STFT + norm + inorm + iSTFT overhead (fwd - arch)
    loss                uPIT loss on top of the full forward
    backward            value_and_grad minus plain forward+loss
    optimizer           full step minus fwd+bwd

Usage: python scripts/bench_step_breakdown.py [batch=8] [iters=10] [mamba]
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


def _timed(fn, args, iters, reps=3):
    """Compile + best-of-reps mean ms per iteration."""
    float(fn(*args, 2))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args, iters))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    from nbss_tpu.io import Loss, Norm, STFT
    from nbss_tpu.models import SpatialNet
    from nbss_tpu.train import TrainModule
    from nbss_tpu.train.optim import build_optimizer

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    mamba = "mamba" in sys.argv[3:]
    nbc2 = "nbc2" in sys.argv[3:]
    remat_policy = "dots" if "dots" in sys.argv[3:] else None
    fs, secs, C, spk = 8000, 4.0, 6, 2
    T = int(fs * secs)

    if nbc2:
        from nbss_tpu.models import NBC2

        arch = NBC2(dim_input=2 * C, dim_output=2 * spk, n_layers=8,
                    dim_hidden=96, dim_ffn=192, num_freqs=129, n_heads=2,
                    dtype=jnp.bfloat16)
        module = TrainModule(
            arch=arch, channels=tuple(range(C)), ref_channel=0,
            stft=STFT(n_fft=256, n_hop=128),
            norm=Norm(mode="frequency", online=False),
            loss=Loss(name="neg_sa_sdr", pit=True),
        )
    elif mamba:
        from nbss_tpu.models import OnlineSpatialNet

        arch = OnlineSpatialNet(
            dim_input=2 * C, dim_output=2 * spk, num_layers=8, dim_hidden=96,
            dim_ffn=192, num_heads=4, kernel_size=(5, 3), conv_groups=(8, 8),
            norms=("LN", "LN", "GN", "LN", "LN", "LN"), dim_squeeze=8,
            num_freqs=129, full_share=0, attention="mamba(16,4)",
            dtype=jnp.bfloat16, remat=True, remat_policy=remat_policy,
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
            num_freqs=129, full_share=0, dtype=jnp.bfloat16,
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
    F = 129
    Tf = T // 128 + 1
    Xin = jnp.asarray(rng.standard_normal((B, F, Tf, 2 * C)), jnp.float32)

    params = arch.init(jax.random.PRNGKey(0), Xin[:1])
    opt_state = tx.init(params)

    # ---- stage functions; every body keeps a scalar carry dependency
    @jax.jit
    def arch_fwd(params, Xin, n):
        def body(i, c):
            y = arch.apply(params, Xin + c * 1e-9)
            return jnp.mean(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    @jax.jit
    def full_fwd(params, x, n):
        def body(i, c):
            yr_hat, _ = module.forward(params, x + c * 1e-9)
            return jnp.mean(yr_hat)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    @jax.jit
    def fwd_loss(params, x, ys, n):
        def body(i, c):
            return module.training_step(params, (x + c * 1e-9, ys))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    @jax.jit
    def fwd_bwd(params, x, ys, n):
        # the grad reduction MUST feed the carry the next iteration reads,
        # or XLA dead-code-eliminates the whole backward (observed: fwd+bwd
        # == fwd when gsum was a discarded second carry element)
        def body(i, s):
            loss, grads = jax.value_and_grad(
                lambda p: module.training_step(p, (x + s * 1e-9, ys)))(params)
            gsum = sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                       for g in jax.tree_util.tree_leaves(grads))
            return loss + gsum * jnp.float32(1e-20)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    @jax.jit
    def full_step(params, opt_state, x, ys, n):
        def body(i, carry):
            params, opt_state, _ = carry
            loss, grads = jax.value_and_grad(
                lambda p: module.training_step(p, (x, ys)))(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss
        _, _, loss = jax.lax.fori_loop(
            0, n, body, (params, opt_state, jnp.float32(0.0)))
        return loss

    rows = []
    t_arch = _timed(arch_fwd, (params, Xin), iters)
    rows.append(("arch fwd", t_arch))
    t_fwd = _timed(full_fwd, (params, x), iters)
    rows.append(("full fwd (stft+norm+arch+istft)", t_fwd))
    t_fl = _timed(fwd_loss, (params, x, ys), iters)
    rows.append(("fwd + uPIT loss", t_fl))
    t_fb = _timed(fwd_bwd, (params, x, ys), iters)
    rows.append(("fwd + bwd", t_fb))
    t_full = _timed(full_step, (params, opt_state, x, ys), iters)
    rows.append(("full step (+Adam)", t_full))

    fam = "nbc2" if nbc2 else ("mamba" if mamba else "spatialnet")
    print(f"\n== breakdown B={B} ({fam}) ==")
    for k, v in rows:
        print(f"{k:36s} {v:8.1f} ms")
    print("-- derived --")
    print(f"{'dsp (stft/norm/istft)':36s} {t_fwd - t_arch:8.1f} ms")
    print(f"{'loss':36s} {t_fl - t_fwd:8.1f} ms")
    print(f"{'backward':36s} {t_fb - t_fl:8.1f} ms")
    print(f"{'optimizer':36s} {t_full - t_fb:8.1f} ms")
    print(f"{'throughput':36s} {B * secs / (t_full / 1e3):8.1f} audio-sec/s")


if __name__ == "__main__":
    main()
