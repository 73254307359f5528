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


def _convT(w: np.ndarray) -> np.ndarray:
    # torch ConvTranspose1d weight [in, out, k] -> flax kernel [k, in, out],
    # spatially flipped (flax conv_transpose does not flip the kernel)
    return np.ascontiguousarray(np.transpose(w, (2, 0, 1))[::-1])


def _mha(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "in_proj": {"Dense_0": {"kernel": _dense(sd[f"{prefix}.in_proj_weight"]),
                                "bias": sd[f"{prefix}.in_proj_bias"]}},
        "out_proj": {"Dense_0": {"kernel": _dense(sd[f"{prefix}.out_proj.weight"]),
                                 "bias": sd[f"{prefix}.out_proj.bias"]}},
    }


def nbc2_params_from_torch(sd: Mapping[str, np.ndarray], n_layers: int) -> Dict:
    """Map the reference NBC2 state_dict (NBC2.py:241-289) onto
    nbss_tpu.models.nbc2.NBC2. Norm kinds are assumed ('LN','GBN','GBN')."""
    sd = {k.replace("_orig_mod.", ""): np.asarray(v) for k, v in sd.items()}
    p: Dict = {
        "encoder": {"Conv_0": {"kernel": _conv(sd["encoder.weight"]), "bias": sd["encoder.bias"]}},
        "decoder": {"kernel": _dense(sd["decoder.weight"]), "bias": sd["decoder.bias"]},
    }
    for l in range(n_layers):
        t = f"sa_layers.{l}"
        p[f"block_{l}"] = {
            "norm1": {"LayerNorm_0": {"scale": sd[f"{t}.norm1.weight"],
                                      "bias": sd[f"{t}.norm1.bias"]}},
            "self_attn": _mha(sd, f"{t}.self_attn"),
            "norm2": {"GroupBatchNorm_0": {"scale": sd[f"{t}.norm2.weight"].reshape(-1),
                                           "bias": sd[f"{t}.norm2.bias"].reshape(-1)}},
            "linear1": {"Dense_0": {"kernel": _dense(sd[f"{t}.linear1.weight"]),
                                    "bias": sd[f"{t}.linear1.bias"]}},
            "conv1": {"Conv_0": {"kernel": _conv(sd[f"{t}.conv.1.weight"]),
                                 "bias": sd[f"{t}.conv.1.bias"]}},
            "conv2": {"Conv_0": {"kernel": _conv(sd[f"{t}.conv.3.weight"]),
                                 "bias": sd[f"{t}.conv.3.bias"]}},
            "conv_norm": {"GroupBatchNorm_0": {"scale": sd[f"{t}.conv.4.weight"].reshape(-1),
                                               "bias": sd[f"{t}.conv.4.bias"].reshape(-1)}},
            "conv3": {"Conv_0": {"kernel": _conv(sd[f"{t}.conv.6.weight"]),
                                 "bias": sd[f"{t}.conv.6.bias"]}},
            "linear2": {"Dense_0": {"kernel": _dense(sd[f"{t}.linear2.weight"]),
                                    "bias": sd[f"{t}.linear2.bias"]}},
        }
    return p


def nbc_params_from_torch(sd: Mapping[str, np.ndarray], n_layers: int,
                          n_conv_layers: int = 3) -> Dict:
    """Map the reference NBC state_dict (NBC.py:240-293) onto
    nbss_tpu.models.nbc.NBC (conv_mid_norm='GN' layout)."""
    sd = {k.replace("_orig_mod.", ""): np.asarray(v) for k, v in sd.items()}
    p: Dict = {
        "encoder": {"Conv_0": {"kernel": _conv(sd["encoder.weight"]), "bias": sd["encoder.bias"]}},
        "decoder": {"ConvTranspose_0": {"kernel": _convT(sd["decoder.weight"]),
                                        "bias": sd["decoder.bias"]}},
    }
    for l in range(n_layers):
        t = f"sa_layers.{l}"
        blk: Dict = {
            "norm1": _ln(sd, f"{t}.norm1"),
            "norm2": _ln(sd, f"{t}.norm2"),
            "self_attn": {
                "u_bias": sd[f"{t}.self_attn.u_bias"],
                "v_bias": sd[f"{t}.self_attn.v_bias"],
            },
            "linear1": {"Dense_0": {"kernel": _dense(sd[f"{t}.linear1.weight"]),
                                    "bias": sd[f"{t}.linear1.bias"]}},
            "linear2": {"Dense_0": {"kernel": _dense(sd[f"{t}.linear2.weight"]),
                                    "bias": sd[f"{t}.linear2.bias"]}},
        }
        for proj in ("query_proj", "key_proj", "value_proj", "out_proj"):
            blk["self_attn"][proj] = {"Dense_0": {
                "kernel": _dense(sd[f"{t}.self_attn.{proj}.weight"]),
                "bias": sd[f"{t}.self_attn.{proj}.bias"]}}
        blk["self_attn"]["pos_proj"] = {"Dense_0": {
            "kernel": _dense(sd[f"{t}.self_attn.pos_proj.weight"])}}
        # conv Sequential indices: conv at 3*i, GN at 3*i+1, SiLU at 3*i+2
        for i in range(n_conv_layers):
            blk[f"conv_{i}"] = {"Conv_0": {"kernel": _conv(sd[f"{t}.conv.{3*i}.weight"]),
                                           "bias": sd[f"{t}.conv.{3*i}.bias"]}}
            blk[f"conv_norm_{i}"] = {"scale": sd[f"{t}.conv.{3*i+1}.weight"],
                                     "bias": sd[f"{t}.conv.{3*i+1}.bias"]}
        p[f"block_{l}"] = blk
    return p


def _lstm_cell(sd: Mapping[str, np.ndarray], prefix: str, layer: int,
               reverse: bool) -> Dict:
    sfx = f"l{layer}" + ("_reverse" if reverse else "")
    w_ih = sd[f"{prefix}.weight_ih_{sfx}"]  # [4h, in], gate order i,f,g,o
    w_hh = sd[f"{prefix}.weight_hh_{sfx}"]  # [4h, h]
    b = sd[f"{prefix}.bias_ih_{sfx}"] + sd[f"{prefix}.bias_hh_{sfx}"]  # [4h]
    h = w_hh.shape[1]
    gates = ("i", "f", "g", "o")
    cell: Dict = {}
    for gi, g in enumerate(gates):
        cell[f"i{g}"] = {"kernel": _dense(w_ih[gi * h:(gi + 1) * h])}
        cell[f"h{g}"] = {"kernel": _dense(w_hh[gi * h:(gi + 1) * h]),
                         "bias": b[gi * h:(gi + 1) * h]}
    return cell


def blstm2_fc1_params_from_torch(sd: Mapping[str, np.ndarray],
                                 n_repeat_last_lstm: int = 1) -> Dict:
    """Map the reference BLSTM2_FC1 state_dict (blstm2_fc1.py:6-69) onto
    nbss_tpu.models.nb_blstm.BLSTM2_FC1.

    Note: torch nn.LSTM(num_layers=k) stacks layers inside one module; our
    BiLSTM stacks flax RNNs, so torch layer l maps to fwd_{l}/bwd_{l}."""
    sd = {k.replace("_orig_mod.", ""): np.asarray(v) for k, v in sd.items()}
    p: Dict = {
        "blstm1": {"fwd_0": _lstm_cell(sd, "blstm1", 0, False),
                   "bwd_0": _lstm_cell(sd, "blstm1", 0, True)},
        "blstm2": {},
        "linear": {"kernel": _dense(sd["linear.weight"]), "bias": sd["linear.bias"]},
    }
    for l in range(n_repeat_last_lstm):
        p["blstm2"][f"fwd_{l}"] = _lstm_cell(sd, "blstm2", l, False)
        p["blstm2"][f"bwd_{l}"] = _lstm_cell(sd, "blstm2", l, True)
    return p


def online_spatialnet_params_from_torch(
    sd: Mapping[str, np.ndarray], num_layers: int, full_share: int = 0,
    attention: str = "mhsa(inf)",
) -> Dict:
    """Map the reference OnlineSpatialNet (mhsa variant) state_dict
    (OnlineSpatialNet.py:259-337) onto nbss_tpu's OnlineSpatialNet.

    The mhsa-variant layer layout is module-for-module the offline
    SpatialNet one (same fconv/full/mhsa/tconvffn submodule indices,
    OnlineSpatialNet.py:86-141 vs SpatialNet.py:46-73; only padding
    semantics differ, which carry no parameters), so the mapping is shared.
    ret/mamba time modules have their own parameter sets and are not
    handled here.

    Pass the checkpoint's configured ``attention`` string (e.g.
    ``"mhsa(251)"``) so the bounded-scope caveat can be surfaced: the
    reference's SDPA call drops the local-scope mask whenever
    ``is_causal=True`` (OnlineSpatialNet.py:191), so reference ``mhsa(N)``
    checkpoints were actually trained UNBOUNDED-causal. nbss_tpu implements
    true bounded scope (required for O(1) streaming); running such a
    checkpoint at finite scope N changes behavior on sequences longer than
    N frames. A UserWarning is raised for any finite N — evaluate imported
    mhsa checkpoints with ``attention='mhsa(inf)'`` for parity."""
    att = attention.replace(" ", "")
    if att.startswith("mhsa(") and att not in ("mhsa(inf)", "mhsa()"):
        import warnings

        warnings.warn(
            f"reference OnlineSpatialNet checkpoints with attention={attention!r} "
            "were trained with the local-scope mask silently dropped "
            "(torch SDPA is_causal=True, OnlineSpatialNet.py:191) — i.e. "
            "unbounded-causal. nbss_tpu enforces the bounded scope, which "
            "diverges from the trained behavior beyond the scope length; "
            "use attention='mhsa(inf)' to reproduce the checkpoint.",
            UserWarning, stacklevel=2)
    return spatialnet_params_from_torch(sd, num_layers, full_share)


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
