"""CLI end-to-end: fit/validate/test/predict on synthetic data with a tiny
SpatialNet, exercising config merge, overrides, version dirs, checkpointing,
results JSON, and example writing."""

import json
import os
import glob

import numpy as np
import pytest

from nbss_tpu.cli.config import (
    deep_merge, instantiate, load_configs, parse_argv, parse_value, resolve_class)
from nbss_tpu.cli.main import run

CONFIGS = os.path.join(os.path.dirname(__file__), "..", "configs")


def _base_args(tmp_path, extra=()):
    return [
        "--config", os.path.join(CONFIGS, "SpatialNet.yaml"),
        "--config", os.path.join(CONFIGS, "datasets", "synthetic.yaml"),
        "--log_root", str(tmp_path / "logs"),
        "--trainer.max_epochs", "1",
        "--trainer.limit_train_batches", "2",
        "--trainer.precision", "32",
        "--model.arch.init_args.num_layers", "1",
        "--model.arch.init_args.dim_hidden", "32",
        "--model.arch.init_args.dim_ffn", "64",
        "--model.arch.init_args.dim_squeeze", "4",
        "--model.arch.init_args.num_freqs", "33",
        "--model.stft.init_args.n_fft", "64",
        "--model.stft.init_args.n_hop", "32",
        "--data.init_args.num_items", "8",
        "--data.init_args.num_channels", "2",
        "--data.init_args.audio_time_len", "0.5",
        "--data.init_args.num_replicas", "1",
        "--data.init_args.rank", "0",
        "--model.channels", "[0, 1]",
        *extra,
    ]


def test_parse_argv():
    sub, paths, ovr = parse_argv(["fit", "--config=a.yaml", "--config", "b.yaml",
                                  "--model.arch.init_args.num_layers=4",
                                  "--trainer.precision", "bf16-mixed"])
    assert sub == "fit" and paths == ["a.yaml", "b.yaml"]
    assert ovr["model.arch.init_args.num_layers"] == 4
    assert ovr["trainer.precision"] == "bf16-mixed"
    assert parse_value("[1, 2]") == [1, 2]
    assert parse_value("null") is None


def test_reference_class_path_aliases():
    from nbss_tpu.models import SpatialNet
    assert resolve_class("models.arch.SpatialNet.SpatialNet") is SpatialNet
    from nbss_tpu.io import Loss
    loss = instantiate({"class_path": "models.io.loss.Loss",
                        "init_args": {"loss_func": "models.io.loss.neg_si_sdr", "pit": True}})
    assert isinstance(loss, Loss) and loss.name == "neg_si_sdr" and loss.pit


def test_deep_merge():
    a = {"m": {"x": 1, "y": 2}, "k": 1}
    b = {"m": {"y": 3}, "j": 4}
    assert deep_merge(a, b) == {"m": {"x": 1, "y": 3}, "k": 1, "j": 4}


def test_fit_and_test_and_predict(tmp_path):
    out = run(["fit", *_base_args(tmp_path)])
    log_dir = out["log_dir"]
    assert os.path.isdir(log_dir) and "version_0" in log_dir
    assert os.path.exists(os.path.join(log_dir, "config.yaml"))
    assert os.path.exists(os.path.join(log_dir, "provenance.txt"))
    assert np.isfinite(out["train_loss"])
    ckpts = glob.glob(os.path.join(log_dir, "checkpoints", "epoch*"))
    assert ckpts, "no checkpoints written"

    # second fit -> version_1
    out2 = run(["fit", *_base_args(tmp_path)])
    assert "version_1" in out2["log_dir"]

    # test from checkpoint
    ckpt = os.path.join(log_dir, "checkpoints", "epoch0")
    res = run(["test", *_base_args(
        tmp_path, ("--ckpt_path", ckpt, "--model.metrics", "[SI_SDR, SDR]",
                   "--model.write_examples", "1"))])
    assert res["num_items"] > 0
    assert "SI_SDR" in res and np.isfinite(res["SI_SDR"])
    assert "SI_SDR_i" in res
    results_files = [p for p in glob.glob(os.path.join(res["log_dir"], "results_*.json"))
                     if not p.endswith("results_mean.json")]
    assert results_files
    items = json.load(open(results_files[0]))
    assert {"wavname", "SI_SDR", "input_SI_SDR"} <= set(items[0].keys())
    assert glob.glob(os.path.join(res["log_dir"], "examples", "*", "prediction_0.wav"))
    # incremental artifact: one parseable JSONL line per item, written as the
    # eval progressed (an interrupted eval leaves these + results_mean.json)
    inc = os.path.join(res["log_dir"], "results_incremental.jsonl")
    assert os.path.exists(inc)
    inc_items = [json.loads(l) for l in open(inc)]
    assert len(inc_items) == res["num_items"]
    assert {"wavname", "SI_SDR"} <= set(inc_items[0].keys())

    # resume: fit with ckpt_path re-enters the SAME version dir (reference
    # base_cli.py:60-69) and continues from the stored epoch
    args3 = _base_args(tmp_path, ("--ckpt_path", ckpt))
    args3[args3.index("--trainer.max_epochs") + 1] = "2"
    out3 = run(["fit", *args3])
    assert os.path.abspath(out3["log_dir"]) == os.path.abspath(log_dir)
    assert os.path.isdir(os.path.join(log_dir, "checkpoints", "epoch1"))

    # predict
    pres = run(["predict", *_base_args(tmp_path, ("--ckpt_path", ckpt))])
    wavs = glob.glob(os.path.join(pres["log_dir"], "examples", "*.wav"))
    assert wavs


def test_bf16_precision_fit(tmp_path):
    args = ["fit", *_base_args(tmp_path)]
    args[args.index("32")] = "bf16-mixed"  # trainer.precision
    out = run(args)
    assert np.isfinite(out["train_loss"])
