"""Benchmark: SpatialNet-small end-to-end separation throughput on one chip.

Measures the full inference pipeline (STFT -> norm -> SpatialNet-small (8
layers, bf16) -> inorm -> iSTFT) on 4-second 6-channel 8 kHz utterances —
the reference's headline config (configs/SpatialNet.yaml + BASELINE.md) —
and reports audio-seconds processed per wall-clock second per chip
(= real-time factor x batch).

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / BASELINE_AUDIO_SEC_PER_SEC where the baseline
anchor is 5x real time x batch 16 — a conservative stand-in for the A100
real-time-factor target in BASELINE.json (the reference publishes no
measured throughput; see BASELINE.md).

Robustness (the round-2 official bench timed out with nothing printed):

- All progress goes to stderr with elapsed timestamps, so a timeout still
  leaves evidence of how far the run got.
- Stage 1 times the XLA-attention path (fast, cache-independent compile)
  and records it as the best-so-far result; stage 2 swaps in the Pallas
  narrow-band attention kernel (the fast path, but its Mosaic compile can
  cost minutes on a cold cache) and upgrades the result if it wins.
- A watchdog thread prints the best-so-far JSON and exits 0 at
  NBSS_BENCH_BUDGET_S seconds (default 480) — a daemon-thread timer is not
  blocked by a native compile call the way a signal handler would be.
  SIGTERM gets the same best-effort print.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

# BASELINE.json north star: ">=5x A100 real-time-factor ... on a single v5e
# chip". Anchor: 5 x realtime per stream over a batch of 16 streams.
BASELINE_AUDIO_SEC_PER_SEC = 5.0 * 16

BUDGET_S = float(os.environ.get("NBSS_BENCH_BUDGET_S", "480"))

_T0 = time.monotonic()
_best = {"value": None, "chip_tflops": None, "chip_pct_of_spec": None}
_printed = threading.Lock()


def _log(msg: str) -> None:
    print(f"[bench +{time.monotonic() - _T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def _emit_and_exit(code: int = 0) -> None:
    """Print the best-so-far JSON line exactly once and hard-exit."""
    if not _printed.acquire(blocking=False):
        return
    v = _best["value"]
    if v is not None:
        rec = {
            "metric": "spatialnet_small_6ch_separation_throughput",
            "value": round(v, 2),
            "unit": "audio-sec/sec/chip",
            "vs_baseline": round(v / BASELINE_AUDIO_SEC_PER_SEC, 3),
        }
        # Hardware context travels with the result: the tunneled chip has
        # been observed at ~36-100% of v5e bf16 spec across sessions, which
        # moves the headline ~2x for hardware reasons alone (BENCH_NOTES).
        if _best["chip_pct_of_spec"] is not None:
            rec["chip_tflops_bf16"] = round(_best["chip_tflops"], 1)
            rec["chip_pct_of_spec"] = round(_best["chip_pct_of_spec"], 1)
        print(json.dumps(rec), flush=True)
    else:
        _log("no result measured before exit")
    os._exit(code if v is not None else 1)


def _watchdog() -> None:
    time.sleep(max(0.0, BUDGET_S - (time.monotonic() - _T0)))
    _log(f"budget {BUDGET_S:.0f}s exhausted; emitting best-so-far")
    _emit_and_exit(0)


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    signal.signal(signal.SIGTERM, lambda *_: _emit_and_exit(0))

    _log("importing jax + nbss_tpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nbss_tpu.io import Loss, Norm, STFT
    from nbss_tpu.models import SpatialNet
    from nbss_tpu.train import TrainModule

    # Chip-health probe: raw MXU + HBM rates vs v5e spec (197 bf16 TFLOP/s,
    # 819 GB/s). The tunneled chip has been observed running at ~53% of BOTH
    # simultaneously (a clock throttle) — rounds 1-3 headline numbers moved
    # 2x for hardware reasons alone, so every official run now records the
    # in-run hardware state next to its result.
    try:
        d = jax.devices()[0]
        n = 4096
        ones = jnp.ones((n, n), jnp.bfloat16)

        @jax.jit
        def _mm(a, k):
            return jax.lax.fori_loop(0, k, lambda i, c: jnp.tanh(c @ a), a)[0, 0]

        float(_mm(ones, 2))
        t0 = time.perf_counter()
        float(_mm(ones, 30))
        tf = 2 * n**3 * 30 / (time.perf_counter() - t0) / 1e12
        _best["chip_tflops"] = tf
        _best["chip_pct_of_spec"] = tf / 197 * 100
        _log(f"chip health: {d.device_kind} ({d.platform}), "
             f"{tf:.0f} bf16 TFLOP/s = {tf / 197 * 100:.0f}% of v5e spec")
    except Exception as e:  # never let the probe kill the bench
        _log(f"chip health probe failed: {type(e).__name__}: {e}")

    fs, secs, B, C, spk = 8000, 4.0, 16, 6, 2
    T = int(fs * secs)

    def build(fused_attn_env, fused_block=False):
        os.environ["NBSS_ATTN"] = fused_attn_env
        arch = SpatialNet(
            dim_input=2 * C, dim_output=2 * spk, num_layers=8, dim_hidden=96,
            dim_ffn=192, num_heads=4, kernel_size=(5, 3), conv_groups=(8, 8),
            norms=("LN", "LN", "GN", "LN", "LN", "LN"), dim_squeeze=8,
            num_freqs=129, full_share=0, dtype=jnp.bfloat16,
            fused_block=fused_block,
        )
        module = TrainModule(
            arch=arch, channels=tuple(range(C)), ref_channel=0,
            stft=STFT(n_fft=256, n_hop=128),
            norm=Norm(mode="frequency", online=True),
            loss=Loss(name="neg_si_sdr", pit=True),
        )

        # The whole timed region runs on device inside one jitted fori_loop —
        # each iteration depends on the previous one's output (prevents DCE /
        # overlap) and the single scalar fetch at the end is the only host
        # sync. (On the tunneled axon backend block_until_ready returns
        # before remote execution finishes; fetching a value is the only
        # reliable sync.) Params/inputs are jit ARGUMENTS: a zero-arg closure
        # would embed them as HLO constants that this backend re-materializes
        # per call (measured 6.4x inflation, BENCH_NOTES.md).
        @jax.jit
        def bench_fn(params, x, n):
            def body(i, carry):
                yr_hat, _ = module.forward(params, x + carry * 1e-9)
                return jnp.mean(yr_hat)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return arch, bench_fn

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, C, T)), jnp.float32)
    Xin = jnp.zeros((1, 129, 251, 2 * C), jnp.float32)

    def run_stage(name, attn_env, reps, iters=20, fused_block=False):
        arch, bench_fn = build(attn_env, fused_block)
        params = arch.init(jax.random.PRNGKey(0), Xin)
        _log(f"stage {name}: warmup/compile started")
        t0 = time.monotonic()
        float(bench_fn(params, x, 2))  # compile + warmup, synced by the fetch
        _log(f"stage {name}: compile+warmup done in {time.monotonic() - t0:.1f}s")
        # best-of-N timed loops: the tunneled chip's effective rate varies
        # +-8% run to run; min is the honest hardware capability
        dt = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(bench_fn(params, x, iters))
            dt = min(dt, (time.perf_counter() - t0) / iters)
        v = B * secs / dt
        _log(f"stage {name}: {v:.1f} audio-sec/s ({dt * 1e3:.1f} ms/batch)")
        return v

    # Stage 1: XLA attention — cheap compile, guaranteed fallback value.
    v_xla = run_stage("xla-attention", "xla", reps=1, iters=10)
    _best["value"] = v_xla

    # Stage 2: Pallas narrow-band attention — the fast path. Mosaic compile
    # can cost minutes cold; the watchdog covers a pathological compile.
    try:
        v_pallas = run_stage("pallas-attention", "pallas", reps=3)
        _best["value"] = max(_best["value"], v_pallas)
    except Exception as e:  # fall back to the XLA number, don't die empty
        _log(f"pallas stage failed: {type(e).__name__}: {e}")

    # Stage 3: fused attention-BLOCK megakernel (LN + folded projections +
    # attention + residual in one Pallas pass, ops/attention_block.py).
    try:
        v_block = run_stage("fused-block", "xla", reps=3, fused_block=True)
        _best["value"] = max(_best["value"], v_block)
    except Exception as e:
        _log(f"fused-block stage failed: {type(e).__name__}: {e}")

    _emit_and_exit(0)


if __name__ == "__main__":
    main()
