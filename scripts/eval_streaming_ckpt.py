"""Streaming-equals-offline evaluation at trained weights.

Loads a trained OnlineSpatialNet run (version dir + checkpoint), takes test
batches from its own datamodule, and

1. runs the offline causal forward and the frame-by-frame
   ``TrainModule.forward_streaming`` path on the same waveforms,
   reporting the max deviation between the two separated signals
   (the deployment-parity check, reference OnlineSpatialNet.py:423-426);
2. reports SI-SDR / SI-SDRi of the offline output vs the direct-path
   targets over the test batches.

Usage: python scripts/eval_streaming_ckpt.py <version_dir> [epoch] [n_batches]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    run_dir = sys.argv[1]
    epoch = int(sys.argv[2]) if len(sys.argv) > 2 else -1
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from nbss_tpu.cli.config import instantiate, load_configs
    from nbss_tpu.cli.main import build_module
    from nbss_tpu.train.ckpt import CheckpointManager

    cfg = load_configs([os.path.join(run_dir, "config.yaml")], [])
    data = instantiate(cfg["data"])
    module = build_module(cfg)
    ckpt = CheckpointManager(os.path.join(run_dir, "checkpoints"))
    restored = ckpt.restore(None if epoch < 0 else epoch)
    params = restored["params"]
    print(f"restored epoch {restored['epoch']}", file=sys.stderr)

    fwd = jax.jit(lambda p, x: module.forward(p, x)[0])
    fwd_stream = jax.jit(lambda p, x: module.forward_streaming(p, x)[0])

    from nbss_tpu.ops import metrics as M

    devs, match_dbs, si_sdrs, si_sdris = [], [], [], []
    loader = data.test_dataloader()
    for i, (x, ys, paras) in enumerate(loader):
        if i >= n_batches:
            break
        x = jnp.asarray(x)
        # raw arrays are indexed by channel id (module.py:140), not by the
        # position of the ref channel within `channels`
        yr = jnp.asarray(ys)[:, :, module.ref_channel].astype(jnp.float32)
        y_off = fwd(params, x)
        y_str = fwd_stream(params, x)
        dev = float(jnp.max(jnp.abs(y_off - y_str)))
        scale = float(jnp.max(jnp.abs(y_off)))
        # SI-SDR of streaming vs offline output: waveform-level agreement
        # in dB (insensitive to the bf16 max-abs outlier the rel-dev shows)
        match_db = float(M.si_sdr(y_str.astype(jnp.float32),
                                  y_off.astype(jnp.float32)).mean())
        # PIT over the output permutation (model stream order is arbitrary)
        from nbss_tpu.ops.pit import pit

        si, _ = pit(y_off, yr,
                    lambda preds, target: M.si_sdr(preds, target).mean(-1))
        si = np.asarray(si)
        si_in = np.asarray(M.si_sdr(
            jnp.broadcast_to(x[:, module.ref_channel:module.ref_channel + 1],
                             yr.shape), yr).mean(-1))
        devs.append(dev / max(scale, 1e-9))
        match_dbs.append(match_db)
        si_sdrs.append(float(si.mean()))
        si_sdris.append(float((si - si_in).mean()))
        print(f"batch {i}: rel_dev={devs[-1]:.2e} "
              f"stream_vs_offline={match_db:.1f}dB si_sdr={si_sdrs[-1]:.2f} "
              f"si_sdri={si_sdris[-1]:.2f}", file=sys.stderr)

    if not devs:
        print(json.dumps({"error": "no test batches evaluated"}))
        return
    out = {
        "streaming_max_rel_dev": max(devs),
        "stream_vs_offline_si_sdr_db": float(np.mean(match_dbs)),
        "si_sdr": float(np.mean(si_sdrs)),
        "si_sdri": float(np.mean(si_sdris)),
        "n_batches": len(devs),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
