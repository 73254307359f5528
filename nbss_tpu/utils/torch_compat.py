"""Convert reference (torch) checkpoints into nbss_tpu flax parameter trees.

Used for golden-parity tests and for users migrating trained reference
checkpoints. Input is a plain ``{name: np.ndarray}`` state dict (call
``{k: v.numpy() for k, v in torch_module.state_dict().items()}`` — this
module itself does not import torch).

Layout conventions converted here:
- torch Conv1d weight [out, in/groups, k]  ->  flax Conv kernel [k, in/groups, out]
- torch Linear weight [out, in]            ->  flax Dense kernel [in, out]
- 1x1 convs used as pointwise projections  ->  Dense kernels
- torch MultiheadAttention packed in_proj  ->  in_proj Dense [H, 3H]
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 1, 0))


def _dense(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _dense_from_1x1(w: np.ndarray) -> np.ndarray:
    return np.transpose(w[:, :, 0], (1, 0))


def _ln(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def spatialnet_params_from_torch(
    sd: Mapping[str, np.ndarray], num_layers: int, full_share: int = 0
) -> Dict:
    """Map the reference SpatialNet state_dict (SpatialNet.py:152-220) onto
    nbss_tpu.models.spatialnet.SpatialNet's parameter tree."""
    sd = {k.replace("_orig_mod.", ""): np.asarray(v) for k, v in sd.items()}
    p: Dict = {
        "encoder": {"Conv_0": {"kernel": _conv(sd["encoder.weight"]), "bias": sd["encoder.bias"]}},
        "decoder": {"Dense_0": {"kernel": _dense(sd["decoder.weight"]), "bias": sd["decoder.bias"]}},
    }
    n_fulls = min(full_share, num_layers - 1) + 1
    for l in range(n_fulls):
        p[f"full_{l}"] = {
            "weight": sd[f"layers.{l}.full.weight"],
            "bias": sd[f"layers.{l}.full.bias"],
        }
    for l in range(num_layers):
        t = f"layers.{l}"
        lp: Dict = {}
        for fc in ("fconv1", "fconv2"):
            lp[f"{fc}_norm"] = _ln(sd, f"{t}.{fc}.0")
            lp[f"{fc}_conv"] = {"Conv_0": {"kernel": _conv(sd[f"{t}.{fc}.1.weight"]),
                                           "bias": sd[f"{t}.{fc}.1.bias"]}}
            lp[f"{fc}_act"] = {"alpha": sd[f"{t}.{fc}.2.weight"]}
        lp["norm_full"] = _ln(sd, f"{t}.norm_full")
        lp["squeeze"] = {"Dense_0": {"kernel": _dense_from_1x1(sd[f"{t}.squeeze.0.weight"]),
                                     "bias": sd[f"{t}.squeeze.0.bias"]}}
        lp["unsqueeze"] = {"Dense_0": {"kernel": _dense_from_1x1(sd[f"{t}.unsqueeze.0.weight"]),
                                       "bias": sd[f"{t}.unsqueeze.0.bias"]}}
        lp["norm_mhsa"] = _ln(sd, f"{t}.norm_mhsa")
        lp["mhsa"] = {
            "in_proj": {"Dense_0": {"kernel": _dense(sd[f"{t}.mhsa.in_proj_weight"]),
                                    "bias": sd[f"{t}.mhsa.in_proj_bias"]}},
            "out_proj": {"Dense_0": {"kernel": _dense(sd[f"{t}.mhsa.out_proj.weight"]),
                                     "bias": sd[f"{t}.mhsa.out_proj.bias"]}},
        }
        lp["tconvffn_norm"] = _ln(sd, f"{t}.tconvffn.0")
        lp["tconvffn_up"] = {"Dense_0": {"kernel": _dense_from_1x1(sd[f"{t}.tconvffn.1.weight"]),
                                         "bias": sd[f"{t}.tconvffn.1.bias"]}}
        for name, idx in (("tconvffn_conv1", 3), ("tconvffn_conv2", 5), ("tconvffn_conv3", 8)):
            lp[name] = {"Conv_0": {"kernel": _conv(sd[f"{t}.tconvffn.{idx}.weight"]),
                                   "bias": sd[f"{t}.tconvffn.{idx}.bias"]}}
        lp["tconvffn_midnorm"] = _ln(sd, f"{t}.tconvffn.6")
        lp["tconvffn_down"] = {"Dense_0": {"kernel": _dense_from_1x1(sd[f"{t}.tconvffn.10.weight"]),
                                           "bias": sd[f"{t}.tconvffn.10.bias"]}}
        p[f"layer_{l}"] = lp
    return p
