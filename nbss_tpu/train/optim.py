"""Optimizer / LR-scheduler factory on optax.

Counterpart of the reference's ``getattr(torch.optim, name)`` factory and
per-epoch scheduler stepping (/root/reference/models/utils/general_steps.py:
243-271). Optimizers are built with injectable hyperparams so the learning
rate can be re-scheduled per epoch on the host (ExponentialLR) or from the
monitored validation metric (ReduceLROnPlateau) without recompiling.

Gradient clipping (global norm, default 5 per configs/SpatialNet.yaml:3-4)
is part of the chain.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import optax

_OPTIMIZERS = {
    "adam": optax.adam,
    "adamw": optax.adamw,
    "sgd": optax.sgd,
    "rmsprop": optax.rmsprop,
    "adagrad": optax.adagrad,
}


def build_optimizer(
    name: str,
    kwargs: Optional[Dict[str, Any]] = None,
    gradient_clip_val: Optional[float] = 5.0,
) -> optax.GradientTransformation:
    """Build a clipped, lr-injectable optax optimizer.

    Args:
        name: Adam / AdamW / SGD / ... (case-insensitive, torch.optim names).
        kwargs: torch-style kwargs — lr, weight_decay, betas, eps.
    """
    kwargs = dict(kwargs or {})
    lr = kwargs.pop("lr", 1e-3)
    opt_kwargs: Dict[str, Any] = {}
    if "betas" in kwargs:
        b1, b2 = kwargs.pop("betas")
        opt_kwargs.update(b1=b1, b2=b2)
    if "eps" in kwargs:
        opt_kwargs["eps"] = kwargs.pop("eps")
    wd = kwargs.pop("weight_decay", None)
    key = name.lower()
    if key not in _OPTIMIZERS:
        raise KeyError(f"unknown optimizer {name!r}; known: {sorted(_OPTIMIZERS)}")
    if key == "adamw" and wd is not None:
        opt_kwargs["weight_decay"] = wd
    opt_kwargs.update(kwargs)

    base = optax.inject_hyperparams(_OPTIMIZERS[key])(learning_rate=lr, **opt_kwargs)
    chain = []
    if gradient_clip_val is not None:
        chain.append(optax.clip_by_global_norm(gradient_clip_val))
    if key != "adamw" and wd:
        chain.append(optax.add_decayed_weights(wd))
    chain.append(base)
    return optax.chain(*chain) if len(chain) > 1 else base


def set_learning_rate(opt_state, lr: float):
    """Return a copy of ``opt_state`` with the injected learning rate replaced."""
    import jax
    import jax.numpy as jnp

    def is_inject(n):
        return isinstance(n, optax.InjectHyperparamsState)

    def rewrite(node):
        if is_inject(node):
            hp = dict(node.hyperparams)
            old = jnp.asarray(hp["learning_rate"])
            hp["learning_rate"] = jnp.asarray(lr, dtype=old.dtype)
            return node._replace(hyperparams=hp)
        return node

    return jax.tree.map(rewrite, opt_state, is_leaf=is_inject)


def get_learning_rate(opt_state) -> float:
    """Read the injected learning rate out of an optimizer state pytree."""
    found = []

    def visit(node):
        if isinstance(node, optax.InjectHyperparamsState):
            found.append(float(node.hyperparams["learning_rate"]))
        return node

    import jax

    jax.tree.map(visit, opt_state,
                 is_leaf=lambda n: isinstance(n, optax.InjectHyperparamsState))
    return found[0]


@dataclass
class LRSchedule:
    """Host-side per-epoch LR controller.

    - ``ExponentialLR``: lr = lr0 * gamma^epoch (stepped per epoch).
    - ``ReduceLROnPlateau``: multiply by ``factor`` after ``patience`` epochs
      without improvement of the monitored value (mode min/max), floored at
      ``min_lr`` — the reference default (SharedTrainer.py:49-54).
    """

    name: Optional[str]
    lr0: float
    kwargs: Dict[str, Any]

    def __post_init__(self):
        self._lr = self.lr0
        self._best: Optional[float] = None
        self._bad_epochs = 0

    @property
    def lr(self) -> float:
        return self._lr

    def step(self, epoch: int, monitored: Optional[float] = None) -> float:
        if self.name is None:
            return self._lr
        n = self.name.lower()
        if n == "exponentiallr":
            gamma = self.kwargs.get("gamma", 0.99)
            self._lr = self.lr0 * gamma ** (epoch + 1)
        elif n == "reducelronplateau":
            mode = self.kwargs.get("mode", "min")
            factor = self.kwargs.get("factor", 0.5)
            patience = self.kwargs.get("patience", 5)
            min_lr = self.kwargs.get("min_lr", 0.0)
            if monitored is not None:
                better = (
                    self._best is None
                    or (mode == "min" and monitored < self._best)
                    or (mode == "max" and monitored > self._best)
                )
                if better:
                    self._best, self._bad_epochs = monitored, 0
                else:
                    self._bad_epochs += 1
                    if self._bad_epochs > patience:
                        self._lr = max(self._lr * factor, min_lr)
                        self._bad_epochs = 0
        else:
            raise KeyError(self.name)
        return self._lr
