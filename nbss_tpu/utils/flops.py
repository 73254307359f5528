"""FLOPs / parameter accounting from XLA's compiled cost analysis.

Counterpart of /root/reference/models/utils/flops.py (torch FlopCounterMode
on a meta device): here the numbers come from the actual compiled XLA
program (``compiled.cost_analysis()``), so they reflect what the TPU really
executes. Writes FLOPs.yaml into the run dir at train start
(general_steps.py:240 analogue).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import yaml


def _cost(fn, *args) -> Dict[str, float]:
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per computation
        ca = ca[0]
    return dict(ca or {})


def count_flops(
    module,
    params,
    x: jnp.ndarray,
    audio_seconds: Optional[float] = None,
) -> Dict[str, Any]:
    """FLOPs for forward and forward+backward of the TrainModule pipeline.

    Args:
        module: TrainModule.
        params: parameter pytree.
        x: example waveform batch [B, C, T].
    Returns:
        dict with flops_forward, flops_forward_avg (per second of audio),
        flops_backward, params.
    """

    def fwd(p, x):
        yr_hat, _ = module.forward(p, x)
        return jnp.mean(yr_hat)

    def fwd_bwd(p, x):
        return jax.grad(fwd)(p, x)

    f_cost = _cost(fwd, params, x)
    fb_cost = _cost(fwd_bwd, params, x)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    flops_f = float(f_cost.get("flops", 0.0))
    flops_fb = float(fb_cost.get("flops", 0.0))
    out = {
        "flops_forward": flops_f,
        "flops_backward": max(flops_fb - flops_f, 0.0),
        "params": int(n_params),
        "bytes_accessed_forward": float(f_cost.get("bytes accessed", 0.0)),
    }
    if audio_seconds:
        out["flops_forward_avg"] = flops_f / audio_seconds  # FLOPs per audio-second
    return out


def write_flops(log_dir: str, module, params, x, audio_seconds=None) -> Dict[str, Any]:
    out = count_flops(module, params, x, audio_seconds)
    with open(os.path.join(log_dir, "FLOPs.yaml"), "w") as f:
        yaml.safe_dump(out, f)
    return out
