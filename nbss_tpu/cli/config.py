"""YAML config system with a reference-compatible surface.

Mirrors the jsonargparse/LightningCLI conventions the reference uses
(SURVEY.md §2.7): objects are selected by ``class_path`` + ``init_args``
(configs/SpatialNet.yaml:12-15), multiple ``--config`` files merge left to
right, and any field is overridable from argv as ``--a.b.c=value``. Resolved
configs are written back into the run's version dir so test/resume re-read
them (reference my_save_config_callback.py:7-33).

Reference class paths (``models.arch.SpatialNet.SpatialNet``,
``models.io.loss.Loss`` ...) are transparently aliased onto the nbss_tpu
equivalents so existing YAMLs work unchanged.
"""

from __future__ import annotations

import importlib
import inspect
from typing import Any, Dict, List, Optional

import yaml

# reference class_path -> nbss_tpu class_path
_ALIASES = {
    "models.arch.SpatialNet.SpatialNet": "nbss_tpu.models.SpatialNet",
    "models.arch.OnlineSpatialNet.OnlineSpatialNet": "nbss_tpu.models.OnlineSpatialNet",
    "models.arch.NBC.NBC": "nbss_tpu.models.NBC",
    "models.arch.NBC2.NBC2": "nbss_tpu.models.NBC2",
    "models.arch.blstm2_fc1.BLSTM2_FC1": "nbss_tpu.models.BLSTM2_FC1",
    "models.arch.NBSS.NBSS": "nbss_tpu.models.NBSS",
    "models.io.stft.STFT": "nbss_tpu.io.STFT",
    "models.io.norm.Norm": "nbss_tpu.io.Norm",
    "models.io.loss.Loss": "nbss_tpu.io.Loss",
    "data_loaders.sms_wsj_plus.SmsWsjPlusDataModule": "nbss_tpu.data.sms_wsj_plus.SmsWsjPlusDataModule",
    "data_loaders.whamr.WHAMRDataModule": "nbss_tpu.data.whamr.WHAMRDataModule",
    "data_loaders.spatialized_wsj0_mix.SpatializedWSJ0MixDataModule":
        "nbss_tpu.data.spatialized_wsj0_mix.SpatializedWSJ0MixDataModule",
    "data_loaders.sms_wsj.SmsWsjDataModule": "nbss_tpu.data.sms_wsj.SmsWsjDataModule",
    "data_loaders.chime3_moving.CHiME3MovingDataModule":
        "nbss_tpu.data.chime3_moving.CHiME3MovingDataModule",
    "data_loaders.libricss.LibriCSSDataModule": "nbss_tpu.data.libricss.LibriCSSDataModule",
    "data_loaders.reverb.ReverbDataModule": "nbss_tpu.data.reverb.ReverbDataModule",
    "data_loaders.spk4_wsj0_mix_sp.Spk4Wsj0mixSp":
        "nbss_tpu.data.spk4_wsj0_mix_sp.Spk4Wsj0MixSpDataModule",
}


def resolve_class(class_path: str):
    class_path = _ALIASES.get(class_path, class_path)
    module, name = class_path.rsplit(".", 1)
    return getattr(importlib.import_module(module), name)


def deep_merge(base: Dict, override: Dict) -> Dict:
    """Right-biased recursive dict merge (later configs win)."""
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def set_dotted(cfg: Dict, dotted: str, value: Any) -> None:
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        node = node.setdefault(k, {})
        assert isinstance(node, dict), f"cannot override through non-dict at {k!r}"
    node[keys[-1]] = value


def parse_value(text: str) -> Any:
    """YAML-parse a CLI override value ('true', '[1,2]', '0.5', 'abc'...)."""
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def load_configs(paths: List[str], overrides: Optional[Dict[str, Any]] = None) -> Dict:
    cfg: Dict = {}
    for p in paths:
        with open(p) as f:
            cfg = deep_merge(cfg, yaml.safe_load(f) or {})
    for dotted, value in (overrides or {}).items():
        set_dotted(cfg, dotted, value)
    return cfg


def parse_argv(argv: List[str]):
    """['fit', '--config=a.yaml', '--model.x=1', ...] ->
    (subcommand, config_paths, overrides)."""
    assert argv and not argv[0].startswith("-"), \
        "first argument must be a subcommand (fit/validate/test/predict)"
    sub = argv[0]
    paths, overrides = [], {}
    i = 1
    while i < len(argv):
        arg = argv[i]
        assert arg.startswith("--"), arg
        if "=" in arg:
            key, value = arg[2:].split("=", 1)
        else:
            key = arg[2:]
            i += 1
            assert i < len(argv), f"missing value for --{key}"
            value = argv[i]
        if key == "config":
            paths.append(value)
        else:
            overrides[key] = parse_value(value)
        i += 1
    return sub, paths, overrides


def instantiate(node: Any, **extra_kwargs):
    """Recursively instantiate {'class_path': ..., 'init_args': {...}} nodes.

    Leaves plain dicts/lists untouched except for recursing into them.
    ``extra_kwargs`` are passed to the top-level constructor (e.g. dims only
    known at runtime), filtered to the constructor's signature.
    """
    if isinstance(node, dict) and "class_path" in node:
        cls = resolve_class(node["class_path"])
        kwargs = {k: instantiate(v) for k, v in (node.get("init_args") or {}).items()}
        if extra_kwargs:
            sig = inspect.signature(cls.__init__ if inspect.isclass(cls) else cls)
            for k, v in extra_kwargs.items():
                if k in sig.parameters and k not in kwargs:
                    kwargs[k] = v
        kwargs = _coerce_kwargs(cls, kwargs)
        return cls(**kwargs)
    if isinstance(node, dict):
        return {k: instantiate(v) for k, v in node.items()}
    if isinstance(node, list):
        return [instantiate(v) for v in node]
    return node


def _coerce_kwargs(cls, kwargs: Dict) -> Dict:
    """Lists from YAML -> tuples where constructors expect hashable fields
    (our io/arch dataclasses and flax modules are frozen/hashable), plus
    reference-style argument spellings."""
    out = {}
    for k, v in kwargs.items():
        out[k] = tuple(v) if isinstance(v, list) else v
    if getattr(cls, "__name__", "") == "Loss":
        # reference spelling: loss_func is an import path (loss.py:79)
        if "loss_func" in out:
            out["name"] = str(out.pop("loss_func"))
        if isinstance(out.get("loss_func_kwargs"), dict):
            out["loss_func_kwargs"] = tuple(sorted(out["loss_func_kwargs"].items()))
    return out


def save_config(cfg: Dict, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
