"""CLI smoke runs for the NBC2 / NB-BLSTM / online configs over synthetic
data — proves every shipped YAML drives the full fit path."""

import os

import numpy as np
import pytest

from nbss_tpu.cli.main import run

CONFIGS = os.path.join(os.path.dirname(__file__), "..", "configs")


def _args(tmp_path, model_cfg, extra=()):
    return [
        "fit",
        "--config", os.path.join(CONFIGS, model_cfg),
        "--config", os.path.join(CONFIGS, "datasets", "synthetic.yaml"),
        "--log_root", str(tmp_path / "logs"),
        "--trainer.max_epochs", "1",
        "--trainer.limit_train_batches", "1",
        "--trainer.precision", "32",
        "--model.stft.init_args.n_fft", "64",
        "--model.stft.init_args.n_hop", "32",
        "--data.init_args.num_items", "4",
        "--data.init_args.num_channels", "2",
        "--data.init_args.audio_time_len", "0.25",
        "--data.init_args.num_replicas", "1",
        "--data.init_args.rank", "0",
        "--data.init_args.seeds", "[1, 2, 3, 3]",
        "--model.channels", "[0, 1]",
        *extra,
    ]


def test_nbc2_config(tmp_path):
    out = run(_args(tmp_path, "NBC2.yaml", (
        "--model.arch.init_args.n_layers", "1",
        "--model.arch.init_args.dim_hidden", "32",
        "--model.arch.init_args.dim_ffn", "64",
        "--model.arch.init_args.num_freqs", "33",
    )))
    assert np.isfinite(out["train_loss"])


def test_nb_blstm_config(tmp_path):
    out = run(_args(tmp_path, "NB-BLSTM.yaml", (
        "--model.arch.init_args.hidden_size", "[16, 8]",
    )))
    assert np.isfinite(out["train_loss"])


def test_online_spatialnet_config(tmp_path):
    out = run(_args(tmp_path, "onlineSpatialNet.yaml", (
        "--model.arch.init_args.num_layers", "1",
        "--model.arch.init_args.dim_hidden", "32",
        "--model.arch.init_args.dim_ffn", "64",
        "--model.arch.init_args.dim_squeeze", "4",
        "--model.arch.init_args.num_freqs", "33",
        "--model.arch.init_args.attention", "mamba(8,4)",
    )))
    assert np.isfinite(out["train_loss"])
