"""Config-surface parity: every reference dataset YAML works unchanged.

The reference ships 8 dataset YAMLs (/root/reference/configs/datasets/*.yaml)
selecting DataModules by ``class_path``/``init_args``; the claim tested here
is that each one (a) resolves through the class-path alias table onto an
nbss_tpu DataModule, (b) has every init_arg accepted by that DataModule, and
(c) instantiates. The repo's own counterparts in configs/datasets/ are
smoke-tested the same way, and one family (WHAMR, the cheapest fixture) runs
end to end: reference YAML -> DataModule -> train batch.
"""

import dataclasses
import glob
import os

import numpy as np
import pytest

from nbss_tpu.cli.config import instantiate, load_configs, resolve_class

REF_DIR = "/root/reference/configs/datasets"
OUR_DIR = os.path.join(os.path.dirname(__file__), "..", "configs", "datasets")

ref_yamls = sorted(glob.glob(os.path.join(REF_DIR, "*.yaml")))
our_yamls = sorted(glob.glob(os.path.join(OUR_DIR, "*.yaml")))


@pytest.mark.skipif(not ref_yamls, reason="reference configs not mounted")
@pytest.mark.parametrize("path", ref_yamls, ids=os.path.basename)
def test_reference_dataset_yaml_instantiates(path):
    cfg = load_configs([path])
    node = cfg["data"]
    cls = resolve_class(node["class_path"])
    assert cls.__module__.startswith("nbss_tpu."), node["class_path"]
    fields = {f.name for f in dataclasses.fields(cls)}
    unknown = set((node.get("init_args") or {})) - fields
    assert not unknown, f"{os.path.basename(path)}: unknown init_args {unknown}"
    dm = instantiate(node)
    assert type(dm) is cls


def test_every_reference_yaml_has_counterpart():
    """configs/datasets/ ships a counterpart for each reference YAML."""
    if not ref_yamls:
        pytest.skip("reference configs not mounted")
    ours = {os.path.basename(p) for p in our_yamls}
    missing = {os.path.basename(p) for p in ref_yamls} - ours
    assert not missing, missing


@pytest.mark.parametrize("path", our_yamls, ids=os.path.basename)
def test_our_dataset_yaml_instantiates(path):
    cfg = load_configs([path])
    dm = instantiate(cfg["data"])
    assert hasattr(dm, "train_dataloader")


def test_reference_whamr_yaml_end_to_end(tmp_path, rng):
    """Reference whamr.yaml, dirs overridden to a fixture corpus -> batch."""
    from nbss_tpu.utils.audio_io import write_audio

    path = os.path.join(REF_DIR, "whamr.yaml")
    if not os.path.exists(path):
        pytest.skip("reference configs not mounted")
    for sub in ("mix_both_reverb", "s1_anechoic", "s2_anechoic"):
        d = tmp_path / "whamr" / "wav8k" / "min" / "tr" / sub
        d.mkdir(parents=True)
        for u in range(2):
            write_audio(str(d / f"u{u}.wav"),
                        (rng.standard_normal((8000, 2)) * 0.1).astype(np.float32),
                        8000)
    cfg = load_configs([path], {"data.init_args.whamr_dir": str(tmp_path / "whamr"),
                                "data.init_args.audio_time_len": [0.5, 0.5, None],
                                "data.init_args.num_workers": 0})
    dm = instantiate(cfg["data"])
    x, ys, paras = next(iter(dm.train_dataloader(epoch=0)))
    assert x.shape == (2, 2, 4000) and ys.shape == (2, 2, 2, 4000)
    assert np.isfinite(x).all()
