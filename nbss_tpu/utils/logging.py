"""Observability: TensorBoard scalars + run provenance.

Counterpart of the reference's MyLogger/TensorBoard setup and git provenance
capture (SURVEY.md §5: git tag + status dump + package freeze into the
version dir, general_steps.py:217-240 / git_tools.py:3-18).
"""

from __future__ import annotations

import os
import subprocess
import sys


class TensorBoardLogger:
    """Minimal scalar logger on tensorboardX (falls back to a JSONL file)."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        try:
            from tensorboardX import SummaryWriter

            self._writer = SummaryWriter(log_dir)
        except ImportError:
            self._writer = None
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def __call__(self, key: str, value: float, step: int) -> None:
        if self._writer is not None:
            self._writer.add_scalar(key, value, step)
        import json

        self._jsonl.write(json.dumps({"key": key, "value": float(value), "step": step}) + "\n")
        self._jsonl.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()
        self._jsonl.close()


def _run(cmd) -> str:
    try:
        return subprocess.run(cmd, capture_output=True, text=True, timeout=30).stdout
    except Exception as e:  # provenance is best-effort
        return f"<failed: {e}>"


def log_provenance(log_dir: str) -> None:
    """Record git state + environment into the version dir."""
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, "provenance.txt"), "w") as f:
        f.write("## git rev\n" + _run(["git", "rev-parse", "HEAD"]))
        f.write("\n## git status\n" + _run(["git", "status", "--short"]))
        f.write("\n## python\n" + sys.version + "\n")
        f.write("\n## pip freeze\n" + _run([sys.executable, "-m", "pip", "freeze"]))


def write_model_summary(log_dir: str, module, params) -> None:
    """model.txt: architecture repr + parameter count (reference writes
    model.txt at train start, general_steps.py:233-238)."""
    import jax

    n_params = sum(p.size for p in jax.tree.leaves(params))
    with open(os.path.join(log_dir, "model.txt"), "w") as f:
        f.write(repr(module.arch) + "\n")
        f.write(f"\nparams: {n_params / 1e6:.3f} M ({n_params})\n")
