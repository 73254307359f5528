"""`python -m nbss_tpu.cli {fit,validate,test,predict}` — the training CLI.

Command surface mirrors the reference TrainCLI (README.md:46-79):

    python -m nbss_tpu.cli fit --config=configs/SpatialNet.yaml \
        --config=configs/datasets/sms_wsj_plus.yaml \
        --model.arch.init_args.num_layers=8 --trainer.max_epochs=100

- version dirs logs/{ArchName}/version_{N} with resolved config.yaml,
  checkpoints/ (every epoch + metric metadata) and TensorBoard events
- test/predict read a version's config.yaml and checkpoint
- trainer.precision '32' or 'bf16-mixed' selects the network compute dtype
  (fp32 STFT/loss islands are always on, matching the reference policy)
"""

from __future__ import annotations

import os
import sys
from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from nbss_tpu.cli.config import instantiate, load_configs, parse_argv, save_config
from nbss_tpu.train.loop import Trainer
from nbss_tpu.train.module import TrainModule
from nbss_tpu.utils.logging import TensorBoardLogger, log_provenance


def _next_version(root: str) -> int:
    if not os.path.isdir(root):
        return 0
    versions = [int(d.split("_")[1]) for d in os.listdir(root)
                if d.startswith("version_") and d.split("_")[1].isdigit()]
    return max(versions) + 1 if versions else 0


def build_module(cfg: Dict) -> TrainModule:
    m = cfg.get("model", {})
    channels = tuple(m.get("channels", (0, 1, 2, 3, 4, 5)))
    num_spk = _num_spk(cfg)
    arch = instantiate(m["arch"], dim_input=2 * len(channels), dim_output=2 * num_spk)
    # precision policy: bf16-mixed puts the network in bf16 (fp32 islands stay)
    precision = str(cfg.get("trainer", {}).get("precision", "32"))
    if "bf16" in precision and getattr(arch, "dtype", None) is None:
        import dataclasses

        arch = dataclasses.replace(arch, dtype=jnp.bfloat16)
    stft = instantiate(m.get("stft", {"class_path": "nbss_tpu.io.STFT"}))
    norm = instantiate(m.get("norm", {"class_path": "nbss_tpu.io.Norm"}))
    loss = instantiate(m.get("loss", {"class_path": "nbss_tpu.io.Loss"}))
    return TrainModule(
        arch=arch, channels=channels, ref_channel=m.get("ref_channel", 0),
        stft=stft, norm=norm, loss=loss, val_metric=m.get("val_metric", "loss"),
    )


def _num_spk(cfg: Dict) -> int:
    data_args = (cfg.get("data") or {}).get("init_args") or {}
    for key in ("num_spk", "num_speakers", "n_speaker"):
        if key in data_args:
            return int(data_args[key])
    return 2


def _mesh_for(cfg: Dict):
    """Data-parallel mesh sized by trainer.devices, capped so the per-step
    train batch divides the device count."""
    import jax

    from nbss_tpu.parallel import make_mesh

    t = cfg.get("trainer", {})
    n = t.get("devices") or jax.device_count()
    n = min(n, jax.device_count())
    bs = ((cfg.get("data") or {}).get("init_args") or {}).get("batch_size", (1,))
    train_bs = bs[0] if isinstance(bs, (list, tuple)) else bs
    while train_bs % n != 0:
        n -= 1
    return make_mesh(n)


def build_trainer(cfg: Dict, module: TrainModule, log_dir: str) -> Trainer:
    import jax

    m = cfg.get("model", {})
    t = cfg.get("trainer", {})
    # rank-0-only event writing (the reference's Lightning loggers are
    # rank-zero too); metric values are identical on every host by
    # construction (fully-replicated reductions)
    logger = (TensorBoardLogger(log_dir) if jax.process_index() == 0
              else (lambda k, v, step: None))
    optimizer = m.get("optimizer", ("Adam", {"lr": 1e-3}))
    lr_scheduler = m.get("lr_scheduler", ("ExponentialLR", {"gamma": 0.99}))
    es = cfg.get("early_stopping") or {}
    early_stopping = None
    if es.get("enable"):
        early_stopping = {"monitor": es.get("monitor", "val/metric"),
                          "patience": es.get("patience", 10),
                          "mode": es.get("mode", "max"),
                          "min_delta": es.get("min_delta", 0.1)}
    # heavy host metrics (PESQ/STOI/...) every N epochs over the val set:
    # the host-side subset of model.metrics, like the reference's
    # every-5-epoch mp.Pool pass (general_steps.py:20-48)
    from nbss_tpu.eval.metrics import HOST_METRICS

    vhm = m.get("val_host_metrics")
    if vhm is None:
        vhm = [x for x in m.get("metrics", []) if x in HOST_METRICS]
    return Trainer(
        module,
        mesh=_mesh_for(cfg),
        optimizer=(optimizer[0], dict(optimizer[1])),
        lr_scheduler=(lr_scheduler[0], dict(lr_scheduler[1])) if lr_scheduler else None,
        gradient_clip_val=t.get("gradient_clip_val", 5.0),
        seed=cfg.get("seed_everything", 2),
        ckpt_dir=os.path.join(log_dir, "checkpoints"),
        logger=logger,
        early_stopping=early_stopping,
        val_host_metrics=vhm or None,
        val_host_metrics_every=m.get("val_host_metrics_every", 5),
        val_host_metrics_batches=m.get("val_host_metrics_batches"),
        profile_dir=t.get("profile_dir"),
    )


def _example_batch(data_module):
    loader = data_module.train_dataloader(epoch=0)
    return next(iter(loader))


def _maybe_init_distributed(cfg: Dict) -> None:
    """Multi-host wiring (the reference's Lightning DDP analogue).

    Explicit env contract: NBSS_COORDINATOR=host:port, NBSS_NUM_PROCESSES,
    NBSS_PROCESS_ID (one process per host; each host then loads only its
    rank-strided data shard, sampler.py). Alternatively trainer.num_nodes>1
    triggers jax.distributed.initialize() auto-detection (TPU pods).

    The decision to initialize is made from env/config ALONE before touching
    any jax device API: jax.process_count() would initialize the XLA backend,
    after which jax.distributed.initialize() raises RuntimeError."""
    coord = os.environ.get("NBSS_COORDINATOR")
    num_nodes = int(cfg.get("trainer", {}).get("num_nodes") or 1)
    if not coord and num_nodes <= 1:
        return
    import jax.distributed

    if jax.distributed.is_initialized():  # launcher already wired it
        return
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["NBSS_NUM_PROCESSES"]),
            process_id=int(os.environ["NBSS_PROCESS_ID"]),
        )
    else:
        jax.distributed.initialize()


def run(argv: Optional[List[str]] = None) -> Dict[str, Any]:
    sub, paths, overrides = parse_argv(argv if argv is not None else sys.argv[1:])
    cfg = load_configs(paths, overrides)
    assert sub in ("fit", "validate", "test", "predict"), sub
    _maybe_init_distributed(cfg)

    data_module = instantiate(cfg["data"])
    module = build_module(cfg)
    arch_name = type(module.arch).__name__

    ckpt_path = cfg.get("ckpt_path")
    if sub == "fit" and ckpt_path is not None:
        # resume logs into the checkpoint's own version dir, like the
        # reference's resumed fit (base_cli.py:60-69: version parsed from the
        # ckpt path re-routes the logger) — metrics.jsonl/events append
        log_dir = os.path.dirname(os.path.dirname(os.path.abspath(ckpt_path)))
    elif sub == "fit" or ckpt_path is None:
        root = os.path.join(cfg.get("log_root", "logs"), arch_name)
        log_dir = os.path.join(root, f"version_{_next_version(root)}")
    else:
        # test/predict next to the checkpoint's version dir (base_cli.py:74-94)
        version_dir = os.path.dirname(os.path.dirname(os.path.abspath(ckpt_path)))
        epoch_tag = os.path.splitext(os.path.basename(ckpt_path))[0]
        test_set = (cfg.get("data", {}).get("init_args", {}) or {}).get("test_set", "test")
        log_dir = os.path.join(version_dir, f"{epoch_tag}_{test_set}_set")
    import jax

    os.makedirs(log_dir, exist_ok=True)
    if jax.process_index() == 0:
        save_config(cfg, os.path.join(log_dir, "config.yaml"))
        log_provenance(log_dir)

    trainer = build_trainer(cfg, module, log_dir)
    x0, _, _ = _example_batch(data_module)
    trainer.init(np.asarray(x0[:1]))

    from nbss_tpu.utils.logging import write_model_summary

    if jax.process_index() == 0:
        write_model_summary(log_dir, module, trainer.params)
    if cfg.get("trainer", {}).get("write_flops"):
        from nbss_tpu.utils.flops import write_flops

        fs = getattr(data_module, "sample_rate", 8000)
        write_flops(log_dir, module, trainer.params, jnp.asarray(x0[:1]),
                    audio_seconds=x0.shape[-1] / fs)

    if ckpt_path is not None:
        epoch = None
        if os.path.basename(ckpt_path).startswith("epoch"):
            epoch = int(os.path.basename(ckpt_path).replace("epoch", "").split("_")[0].split(".")[0])
        trainer.ckpt.ckpt_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(ckpt_path))), "checkpoints")
        trainer.restore(epoch=epoch, reset=cfg.get("model", {}).get("reset"),
                        ensemble=cfg.get("model", {}).get("ensemble"))

    t = cfg.get("trainer", {})
    if sub == "fit":
        history = trainer.fit(
            lambda: iter(data_module.train_dataloader(trainer.epoch)),
            lambda: iter(data_module.val_dataloader()),
            max_epochs=t.get("max_epochs", 1),
            steps_per_epoch=t.get("limit_train_batches"),
        )
        return {"log_dir": log_dir, **history}
    if sub == "validate":
        logs = trainer.validate(lambda: iter(data_module.val_dataloader()))
        return {"log_dir": log_dir, **logs}
    if sub == "test":
        from nbss_tpu.eval.runner import run_test

        metrics = (cfg.get("model", {}) or {}).get(
            "metrics", ["SDR", "SI_SDR", "NB_PESQ", "WB_PESQ", "eSTOI"])
        results = run_test(trainer, module, data_module.test_dataloader(), log_dir,
                           metrics=metrics,
                           write_examples=cfg.get("model", {}).get("write_examples", 200),
                           mchunk=cfg.get("model", {}).get("mchunk"))
        return {"log_dir": log_dir, **results}
    # predict
    from nbss_tpu.eval.runner import run_predict

    run_predict(trainer, module, data_module.predict_dataloader(), log_dir)
    return {"log_dir": log_dir}


def main():  # console entry
    out = run()
    print({k: v for k, v in out.items() if not isinstance(v, (list, dict))})


if __name__ == "__main__":
    main()
