"""Jit-compiled fit / validate / test / predict driver.

The TPU-native analogue of the reference's Lightning Trainer usage
(call stacks in SURVEY.md §3): one compiled train step (forward + uPIT loss +
backward + optimizer, donated buffers), data-parallel over a ``data`` mesh
axis with parameters replicated and gradients reduced by XLA collectives,
per-epoch host-side LR scheduling, every-epoch checkpointing, and metric
logging through a pluggable logger.
"""

from __future__ import annotations

import functools
import time
from typing import Any, Callable, Dict, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nbss_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from nbss_tpu.train.ckpt import CheckpointManager
from nbss_tpu.train.module import TrainModule
from nbss_tpu.train.optim import LRSchedule, build_optimizer, set_learning_rate


class Trainer:
    def __init__(
        self,
        module: TrainModule,
        optimizer: Tuple[str, Dict[str, Any]] = ("Adam", {"lr": 1e-3}),
        lr_scheduler: Optional[Tuple[str, Dict[str, Any]]] = ("ExponentialLR", {"gamma": 0.99}),
        gradient_clip_val: Optional[float] = 5.0,
        mesh=None,
        seed: int = 2,
        ckpt_dir: Optional[str] = None,
        logger: Optional[Callable[[str, float, int], None]] = None,
        val_metric_mode: str = "max",
        early_stopping: Optional[Dict[str, Any]] = None,
        detect_unused_parameters: bool = False,
        val_host_metrics: Optional[Sequence[str]] = None,
        val_host_metrics_every: int = 5,
        val_host_metrics_batches: Optional[int] = None,
        profile_dir: Optional[str] = None,
        profile_steps: Tuple[int, int] = (10, 15),
    ):
        """val_host_metrics: e.g. ('NB_PESQ', 'STOI') — heavy host-side
        metrics computed every N epochs over the FULL validation set (the
        reference's every-5-epoch mp.Pool PESQ, general_steps.py:20-48);
        val_host_metrics_batches caps the batch count when set (None = all)."""
        """early_stopping: {'monitor': 'val/metric', 'patience': 10,
        'mode': 'max', 'min_delta': 0.1} — reference TrainCLI defaults
        (SharedTrainer.py:348-356), disabled when None."""
        self.mesh = mesh if mesh is not None else make_mesh()
        if "freq" in self.mesh.axis_names and module.freq_axis is None:
            import dataclasses

            module = dataclasses.replace(module, freq_axis="freq")
        self.module = module
        self.tx = build_optimizer(optimizer[0], optimizer[1], gradient_clip_val)
        lr0 = optimizer[1].get("lr", 1e-3)
        self.lr_schedule = LRSchedule(
            lr_scheduler[0] if lr_scheduler else None, lr0,
            lr_scheduler[1] if lr_scheduler else {},
        )
        self.seed = seed
        self.ckpt = CheckpointManager(ckpt_dir) if ckpt_dir else None
        self.logger = logger or (lambda k, v, step: None)
        self.val_metric_mode = val_metric_mode
        self.early_stopping = early_stopping
        self.detect_unused_parameters = detect_unused_parameters
        self.val_host_metrics = tuple(val_host_metrics) if val_host_metrics else None
        self.val_host_metrics_every = val_host_metrics_every
        self.val_host_metrics_batches = val_host_metrics_batches
        # optional XLA profiler capture of steps [a, b) in the first epoch
        # (the reference has no profiler integration, SURVEY.md §5 —
        # FLOPs.yaml is its whole profiling story)
        self.profile_dir = profile_dir
        self.profile_steps = tuple(profile_steps)
        self.epoch = 0
        self._train_step = None
        self._val_step = None
        self._es_best: Optional[float] = None
        self._es_bad = 0

    # ------------------------------------------------------------------ setup
    def init(self, example_x: np.ndarray):
        """Initialize (or restore) replicated params + optimizer state.

        example_x: one host batch of waveforms [B, C, T].
        """
        x = jnp.asarray(example_x[:1])
        rng = jax.random.PRNGKey(self.seed)

        def _init(rng, x):
            X, _ = self.module.stft.stft(x[:, list(self.module.channels)])
            B, C, F, T = X.shape
            Xin = jnp.zeros((B, F, T, 2 * C), jnp.float32)
            return self.module.arch.init(rng, Xin)

        params = _init(rng, x)
        opt_state = self.tx.init(params)
        self.params = replicate(self.mesh, params)
        self.opt_state = replicate(self.mesh, opt_state)
        return self.params

    def restore(self, epoch: Optional[int] = None, reset: Optional[Sequence[str]] = None,
                ensemble: Optional[Any] = None):
        assert self.ckpt is not None
        if ensemble is not None:
            restored = self.ckpt.ensemble(ensemble, template={"params": self.params})
            self.params = replicate(self.mesh, restored["params"])
            return
        template = {"params": self.params, "opt_state": self.opt_state}
        restored = self.ckpt.restore(epoch, template=template, reset=reset)
        self.params = replicate(self.mesh, restored["params"])
        if "opt_state" in restored:
            self.opt_state = replicate(self.mesh, restored["opt_state"])
        self.epoch = restored["epoch"] + 1

    # ------------------------------------------------------------------ steps
    def _build_steps(self):
        module, tx = self.module, self.tx

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch, rng):
            def loss_fn(p):
                return module.training_step(p, batch, rngs={"dropout": rng})

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            params2 = optax.apply_updates(params, updates)
            return params2, opt_state2, loss

        @jax.jit
        def val_step(params, batch):
            return module.validation_step(params, batch)

        self._train_step = train_step
        self._val_step = val_step

    # -------------------------------------------------------------------- fit
    def fit(
        self,
        train_data: Iterable,
        val_data: Optional[Iterable] = None,
        max_epochs: int = 1,
        steps_per_epoch: Optional[int] = None,
        log_every: int = 50,
    ) -> Dict[str, float]:
        """Run the fit loop. ``train_data``/``val_data`` are callables or
        re-iterables yielding (x [B,C,T], ys [B,Spk,C,T], paras)."""
        if self._train_step is None:
            self._build_steps()
        rng = jax.random.PRNGKey(self.seed)
        history: Dict[str, float] = {}
        checked_unused = self.epoch > 0 or not self.detect_unused_parameters
        first_epoch = self.epoch  # profiler captures only this epoch

        for epoch in range(self.epoch, max_epochs):
            t0 = time.time()
            losses = []
            it = train_data() if callable(train_data) else iter(train_data)
            for step, batch in enumerate(it):
                if steps_per_epoch is not None and step >= steps_per_epoch:
                    break
                if self.profile_dir and epoch == first_epoch:
                    self._profile_hook(step)
                x, ys = jnp.asarray(batch[0]), jnp.asarray(batch[1])
                sb = shard_batch(self.mesh, (x, ys))
                rng, sub = jax.random.split(rng)
                if not checked_unused:
                    self._warn_unused_parameters(sb, sub)
                    checked_unused = True
                with self.mesh:  # mesh context for PartitionSpec constraints
                    self.params, self.opt_state, loss = self._train_step(
                        self.params, self.opt_state, sb, sub
                    )
                losses.append(loss)
                if (step + 1) % log_every == 0:
                    self.logger(f"train/{self.module.loss.name}", float(loss), epoch)
            train_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
            history["train_loss"] = train_loss
            self.logger(f"train/{self.module.loss.name}", train_loss, epoch)

            val_metric = None
            if val_data is not None:
                val_logs = self.validate(val_data)
                if (self.val_host_metrics
                        and (epoch + 1) % self.val_host_metrics_every == 0):
                    val_logs.update(self._host_metrics(val_data))
                for k, v in val_logs.items():
                    self.logger(k, v, epoch)
                history.update(val_logs)
                val_metric = val_logs.get("val/metric")

            if self.ckpt is not None:
                self.ckpt.save(epoch, self.params, self.opt_state, metric=val_metric)

            # per-epoch LR schedule (reference steps schedulers per epoch)
            monitored = None
            if val_metric is not None:
                monitored = -val_metric if self.val_metric_mode == "max" else val_metric
            new_lr = self.lr_schedule.step(epoch, monitored)
            self.opt_state = set_learning_rate(self.opt_state, new_lr)
            self.logger("lr", new_lr, epoch)
            self.epoch = epoch + 1
            history["epoch_time"] = time.time() - t0
            # epoch summary line (the reference's progress-bar epoch metric
            # summary, my_rich_progress_bar.py:13-34)
            vm = f" val/metric={val_metric:.4f}" if val_metric is not None else ""
            print(f"epoch {epoch}: train/{self.module.loss.name}={train_loss:.4f}"
                  f"{vm} lr={new_lr:.2e} ({history['epoch_time']:.1f}s)", flush=True)

            if self.early_stopping and val_metric is not None:
                if self._should_stop(val_metric):
                    break
        return history

    def _profile_hook(self, step: int) -> None:
        """Capture an XLA profiler trace of profile_steps in the first
        trained epoch; view with tensorboard/xprof. Failures (e.g. an
        unsupported remote backend) only warn."""
        a, b = self.profile_steps
        try:
            if step == a:
                jax.profiler.start_trace(self.profile_dir)
                self._profiling = True
            elif step == b and getattr(self, "_profiling", False):
                jax.profiler.stop_trace()
                self._profiling = False
                print(f"profiler trace written to {self.profile_dir}", flush=True)
        except Exception as e:  # pragma: no cover - backend dependent
            import warnings

            warnings.warn(f"profiler capture failed: {e}")
            self._profiling = False

    def _host_metrics(self, val_data) -> Dict[str, float]:
        """Heavy host metrics (PESQ/STOI/...) on a few validation batches."""
        import numpy as np

        from nbss_tpu.eval.metrics import cal_metrics

        if self._val_step is None:
            self._build_steps()
        predict = jax.jit(lambda p, x: self.module.predict_step(
            p, x, norm_if_exceed_1=False))
        it = val_data() if callable(val_data) else iter(val_data)
        sums: Dict[str, float] = {}
        counts: Dict[str, int] = {}
        for bi, batch in enumerate(it):
            if (self.val_host_metrics_batches is not None
                    and bi >= self.val_host_metrics_batches):
                break
            x, ys, paras = batch[0], batch[1], batch[2] if len(batch) > 2 else [{}]
            fs = paras[0].get("sample_rate", 8000) if paras else 8000
            yhat = np.asarray(predict(self.params, jnp.asarray(x)))
            yr = np.asarray(ys[:, :, self.module.ref_channel, :])
            for b in range(yhat.shape[0]):
                m, _, _ = cal_metrics(self.val_host_metrics, yhat[b], yr[b],
                                      yr[b], fs, device_only="host")
                for k, v in m.items():
                    # skip failed/degenerate items (e.g. STOI of a
                    # near-silent masked segment) like the reference's
                    # exception->None degrade (metrics.py:142-149)
                    if isinstance(v, (int, float)) and np.isfinite(v):
                        sums[k] = sums.get(k, 0.0) + v
                        counts[k] = counts.get(k, 0) + 1
        return {f"val/{k}": sums[k] / counts[k] for k in sums}

    def _warn_unused_parameters(self, batch, rng) -> None:
        """Epoch-0 zero-gradient parameter detector (the reference's
        on_after_backward debug aid, SharedTrainer.py:333-341)."""
        import warnings

        grads = jax.grad(lambda p: self.module.training_step(
            p, batch, rngs={"dropout": rng}))(self.params)
        flat, _ = jax.tree_util.tree_flatten_with_path(grads)
        for path, g in flat:
            if float(jnp.max(jnp.abs(g))) == 0.0:
                warnings.warn(
                    "unused parameter (check code or freeze it): "
                    + jax.tree_util.keystr(path))

    def _should_stop(self, monitored: float) -> bool:
        es = self.early_stopping
        mode = es.get("mode", "max")
        min_delta = es.get("min_delta", 0.0)
        patience = es.get("patience", 10)
        improved = (
            self._es_best is None
            or (mode == "max" and monitored > self._es_best + min_delta)
            or (mode == "min" and monitored < self._es_best - min_delta)
        )
        if improved:
            self._es_best, self._es_bad = monitored, 0
            return False
        self._es_bad += 1
        return self._es_bad >= patience

    def validate(self, val_data: Iterable) -> Dict[str, float]:
        if self._val_step is None:
            self._build_steps()
        it = val_data() if callable(val_data) else iter(val_data)
        sums: Dict[str, float] = {}
        n = 0
        for batch in it:
            x, ys = jnp.asarray(batch[0]), jnp.asarray(batch[1])
            sb = shard_batch(self.mesh, (x, ys))
            with self.mesh:
                logs = self._val_step(self.params, sb)
            # weight per-batch means by batch size so a ragged final batch
            # doesn't skew val/metric (the reference logs per-sample with
            # sync_dist reductions, SharedTrainer.py:174-182)
            bs = int(x.shape[0])
            for k, v in logs.items():
                sums[k] = sums.get(k, 0.0) + float(v) * bs
            n += bs
        return {k: v / max(n, 1) for k, v in sums.items()}
