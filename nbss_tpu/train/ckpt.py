"""Checkpoint save/restore/ensemble on orbax.

Mirrors the reference checkpoint policy (SURVEY.md §5 / SharedTrainer.py:
358-369): save every epoch (save_top_k=-1) + ``last``, filenames carry the
monitored validation metric, resume restores params/optimizer/epoch, and
``ensemble`` averages the weights of the last N checkpoints at load
(/root/reference/models/utils/ensemble.py:6-52). ``reset`` drops optimizer
state on load (general_steps.py:201-212).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import numpy as np
import orbax.checkpoint as ocp


def _epoch_dirs(ckpt_dir: str) -> List[str]:
    if not os.path.isdir(ckpt_dir):
        return []
    out = []
    for d in os.listdir(ckpt_dir):
        if re.match(r"^epoch\d+$", d):
            out.append(d)
    return sorted(out, key=lambda d: int(d[5:]))


class CheckpointManager:
    """Every-epoch checkpointing with a ``last`` pointer and metric metadata."""

    def __init__(self, ckpt_dir: str):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def save(self, epoch: int, params, opt_state=None, metric: Optional[float] = None):
        # params and opt_state live in separate sub-checkpoints so that
        # params-only restores (test/predict/ensemble) need no optimizer
        # template
        path = os.path.join(self.ckpt_dir, f"epoch{epoch}")
        self._ckptr.save(os.path.join(path, "params"), params, force=True)
        if opt_state is not None:
            self._ckptr.save(os.path.join(path, "opt_state"), opt_state, force=True)
        self._ckptr.wait_until_finished()
        if jax.process_index() != 0:  # orbax coordinates the array writes;
            return  # metadata is rank-0's job (shared filesystem)
        meta = {"epoch": epoch, "metric": metric}
        with open(os.path.join(self.ckpt_dir, f"epoch{epoch}.json"), "w") as f:
            json.dump(meta, f)
        with open(os.path.join(self.ckpt_dir, "last.json"), "w") as f:
            json.dump(meta, f)

    def latest_epoch(self) -> Optional[int]:
        dirs = _epoch_dirs(self.ckpt_dir)
        return int(dirs[-1][5:]) if dirs else None

    def best_epoch(self, mode: str = "max") -> Optional[int]:
        best, best_m = None, None
        for d in _epoch_dirs(self.ckpt_dir):
            meta_path = os.path.join(self.ckpt_dir, d + ".json")
            if not os.path.exists(meta_path):
                continue
            m = json.load(open(meta_path)).get("metric")
            if m is None:
                continue
            if best_m is None or (m > best_m if mode == "max" else m < best_m):
                best, best_m = int(d[5:]), m
        return best

    def restore(self, epoch: Optional[int] = None, template=None,
                reset: Optional[Sequence[str]] = None) -> Dict[str, Any]:
        """Restore a checkpoint; ``reset=['optimizer']`` drops opt_state.

        ``template``: {'params': ..., 'opt_state': ...} pytrees with the
        target structure; opt_state is restored only when present in both the
        template and the checkpoint.
        """
        if epoch is None:
            epoch = self.latest_epoch()
            assert epoch is not None, f"no checkpoints in {self.ckpt_dir}"
        template = template or {}
        path = os.path.join(self.ckpt_dir, f"epoch{epoch}")
        restored: Dict[str, Any] = {
            "params": self._ckptr.restore(
                os.path.join(path, "params"), target=template.get("params")
            )
        }
        skip_opt = reset and {r.lower() for r in reset} & {"optimizer", "opt_state"}
        opt_path = os.path.join(path, "opt_state")
        if not skip_opt and "opt_state" in template and os.path.isdir(opt_path):
            restored["opt_state"] = self._ckptr.restore(
                opt_path, target=template["opt_state"]
            )
        restored["epoch"] = epoch
        return restored

    def _resolve_ensemble_epochs(self, opts) -> List[int]:
        """int N -> last N epochs; list of ints -> those epochs; a string or
        list of strings -> glob patterns / explicit checkpoint dirs (the
        reference accepts globs and ckpt-path lists too, ensemble.py:6-52)."""
        import glob as _glob

        if isinstance(opts, int):
            dirs = _epoch_dirs(self.ckpt_dir)
            return [int(d[5:]) for d in dirs[-opts:]]
        items = [opts] if isinstance(opts, str) else list(opts)
        epochs: List[int] = []
        for it in items:
            if isinstance(it, int):
                epochs.append(it)
                continue
            pattern = str(it)
            matches = sorted(_glob.glob(pattern)) or sorted(
                _glob.glob(os.path.join(self.ckpt_dir, pattern)))
            assert matches, f"ensemble pattern matched nothing: {it}"
            for m in matches:
                name = os.path.basename(m.rstrip("/"))
                em = re.match(r"^epoch(\d+)", name)
                assert em, f"not an epoch checkpoint: {m}"
                epochs.append(int(em.group(1)))
        return sorted(set(epochs))

    def ensemble(
        self, opts: Union[int, str, Sequence[Union[int, str]]], template=None
    ) -> Dict[str, Any]:
        """Average params across checkpoints (reference ensemble.py:6-52).

        opts: int N -> last N epochs; a list of epoch numbers; or glob
        pattern(s) / checkpoint dir paths (e.g. ``'epoch9*'``).
        """
        epochs = self._resolve_ensemble_epochs(opts)
        assert epochs, "no checkpoints to ensemble"
        acc = None
        for e in epochs:
            p = self.restore(e, template=template)["params"]
            p = jax.tree.map(lambda a: np.asarray(a, dtype=np.float64), p)
            acc = p if acc is None else jax.tree.map(np.add, acc, p)
        n = float(len(epochs))
        params = jax.tree.map(lambda a: (a / n).astype(np.float32), acc)
        return {"params": params, "epochs": epochs}
