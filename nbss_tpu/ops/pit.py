"""Utterance-level permutation-invariant training (uPIT).

JAX counterpart of torchmetrics' ``permutation_invariant_training`` with
``mode='permutation-wise'`` as used by the reference Loss wrapper
(/root/reference/models/io/loss.py:111): the metric function is evaluated on
whole permuted prediction tensors (so metrics may aggregate across sources,
e.g. SA-SDR), and the best permutation per batch item is selected.

Speaker counts are small (<= 3 in all reference configs, <= 4 supported), so
the factorial number of permutations (<= 24) is statically unrolled — each
permutation is a gather + one fused metric evaluation, all batched; no
Hungarian assignment is needed.
"""

from __future__ import annotations

import itertools
from typing import Callable, Tuple

import jax.numpy as jnp


def pit(
    preds: jnp.ndarray,
    target: jnp.ndarray,
    metric_func: Callable[..., jnp.ndarray],
    eval_func: str = "max",
    **kwargs,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Permutation-invariant metric evaluation.

    Args:
        preds: [B, spk, ...]
        target: [B, spk, ...]
        metric_func: maps (preds=[B,spk,...], target=[B,spk,...]) -> [B]
            (permutation-wise mode: called on the full permuted tensor).
        eval_func: 'max' for quality metrics, 'min' for losses.

    Returns:
        (best_metric [B], best_perm [B, spk] int32) — apply with `permutate`.
    """
    assert eval_func in ("max", "min"), eval_func
    num_spk = preds.shape[1]
    perms = list(itertools.permutations(range(num_spk)))
    vals = jnp.stack(
        [metric_func(preds=preds[:, list(p)], target=target, **kwargs) for p in perms],
        axis=0,
    )  # [P, B]
    best_idx = jnp.argmax(vals, axis=0) if eval_func == "max" else jnp.argmin(vals, axis=0)
    best_val = jnp.take_along_axis(vals, best_idx[None, :], axis=0)[0]
    perm_table = jnp.asarray(perms, dtype=jnp.int32)  # [P, spk]
    best_perm = perm_table[best_idx]  # [B, spk]
    return best_val, best_perm


def permutate(preds: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """Reorder the source axis of ``preds`` [B, spk, ...] by ``perm`` [B, spk]."""
    idx = perm.reshape(perm.shape + (1,) * (preds.ndim - 2))
    return jnp.take_along_axis(preds, idx, axis=1)
