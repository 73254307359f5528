"""Summarize a training run's metrics.jsonl into a markdown curve table.

Usage: python scripts/results_summary.py logs/SpatialNet/version_1 [stride]
Prints a table of epoch vs train loss / val metric (+ any val/* host
metrics), plus the best-epoch line — the inputs for RESULTS.md.
"""

# run as `python scripts/<name>.py` from anywhere:
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
from collections import defaultdict


def load(run_dir):
    per_key = defaultdict(dict)
    with open(f"{run_dir}/metrics.jsonl") as f:
        for line in f:
            r = json.loads(line)
            per_key[r["key"]][r["step"]] = r["value"]
    return per_key


def main():
    run_dir = sys.argv[1]
    stride = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    per_key = load(run_dir)
    val = per_key.get("val/metric", {})
    train_keys = [k for k in per_key if k.startswith("train/")]
    tkey = train_keys[0] if train_keys else None
    host_keys = sorted(k for k in per_key
                       if k.startswith("val/") and k not in ("val/metric",))

    epochs = sorted(val)
    cols = ["epoch", tkey, "val/metric(SI-SDR dB)"] + host_keys
    print("| " + " | ".join(str(c) for c in cols) + " |")
    print("|" + "---|" * len(cols))
    shown = [e for e in epochs if e % stride == 0 or e == epochs[-1]]
    for e in shown:
        row = [e, f"{per_key[tkey].get(e, float('nan')):.3f}" if tkey else "-",
               f"{val[e]:.3f}"]
        for k in host_keys:
            v = per_key[k].get(e)
            row.append("-" if v is None or v != v else f"{v:.3f}")
        print("| " + " | ".join(str(c) for c in row) + " |")
    if epochs:
        best = max(epochs, key=lambda e: val[e])
        print(f"\nbest val/metric: {val[best]:.3f} dB at epoch {best} "
              f"(of {len(epochs)} epochs)")


if __name__ == "__main__":
    main()
