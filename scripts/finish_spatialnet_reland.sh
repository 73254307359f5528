#!/bin/bash
# Endgame for the SpatialNet re-land convergence run (VERDICT round-4
# item 7): wait until the fit (launched by run_spatialnet_convergence.sh,
# pid in /tmp/spnet_conv.pid) reaches TARGET_EPOCH or a wall deadline,
# stop it, evaluate the best-val checkpoint on the held-out test rooms,
# and force-commit every artifact so the run is re-verifiable from the
# repo (same discipline as logs/OnlineSpatialNet/version_0).
#
# Usage: bash scripts/finish_spatialnet_reland.sh [target_epoch] [max_wait_s]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo

TARGET_EPOCH="${1:-50}"
MAX_WAIT="${2:-3600}"
DEADLINE=$(( $(date +%s) + MAX_WAIT ))
VDIR=logs/SpatialNet/version_0
FITLOG=/tmp/spnet_conv.log

echo "WAIT_START $(date -u) target_epoch=$TARGET_EPOCH deadline_in=${MAX_WAIT}s" >&2
while :; do
  done_epochs=$(grep -c '^epoch ' "$FITLOG" 2>/dev/null || echo 0)
  [ "$done_epochs" -gt "$TARGET_EPOCH" ] && break
  [ "$(date +%s)" -ge "$DEADLINE" ] && break
  kill -0 "$(cat /tmp/spnet_conv.pid)" 2>/dev/null || break
  sleep 30
done
echo "WAIT_DONE $(date -u) epochs_done=$(grep -c '^epoch ' "$FITLOG")" >&2

# Stop the fit: kill the python child of the launcher (pid-targeted, never
# pattern-matched), then the launcher itself; poll until the chip is free.
LPID=$(cat /tmp/spnet_conv.pid)
for p in $(ps -o pid= --ppid "$LPID" 2>/dev/null); do kill "$p" 2>/dev/null; done
kill "$LPID" 2>/dev/null
for _ in $(seq 30); do kill -0 "$LPID" 2>/dev/null || break; sleep 2; done
sleep 5
echo "FIT_STOPPED $(date -u)" >&2

# Pick the best val/metric epoch among COMPLETED checkpoints (the epochN.json
# sidecar is written only after the orbax save finishes, train/ckpt.py:46-54).
python3 - <<'EOF'
import json, os, glob
vdir = "logs/SpatialNet/version_0"
vals = {}
for l in open(f"{vdir}/metrics.jsonl"):
    d = json.loads(l)
    if d["key"] == "val/metric":
        vals[d["step"]] = d["value"]
have = set()
for p in glob.glob(f"{vdir}/checkpoints/epoch*.json"):
    try:
        have.add(int(os.path.basename(p)[5:-5]))
    except ValueError:
        pass
best = max((e for e in vals if e in have), key=lambda e: vals[e])
open("/tmp/spnet_best_epoch", "w").write(str(best))
print(f"BEST epoch={best} val={vals[best]:.3f}")
EOF
BEST=$(cat /tmp/spnet_best_epoch)
echo "EVAL_START $(date -u) epoch=$BEST" >&2
timeout 1800 python -m nbss_tpu.cli test \
  --config="$VDIR/config.yaml" \
  --ckpt_path="$VDIR/checkpoints/epoch$BEST"
rc=$?
echo "EVAL_DONE rc=$rc $(date -u)" >&2

# Force-commit the artifacts (logs/ is gitignored by design; run evidence is
# committed explicitly, mirroring the fourth-family discipline).
git add -f "$VDIR/metrics.jsonl" "$VDIR/config.yaml" "$VDIR/provenance.txt" \
  "$VDIR/model.txt" "$VDIR/checkpoints/epoch$BEST" \
  "$VDIR/checkpoints/epoch$BEST.json"
# Commit the result JSONs and one example, not all 200 example wav dirs
# (the wavs are reproducible from the committed checkpoint + corpus seed).
TDIR="$VDIR/epoch${BEST}_test_set"
if [ -d "$TDIR" ]; then
  git add -f "$TDIR"/*.json "$TDIR"/*.jsonl "$TDIR"/*.yaml "$TDIR"/*.txt 2>/dev/null
  [ -d "$TDIR/examples/0" ] && git add -f "$TDIR/examples/0"
fi
VAL=$(python3 -c "import json;print(round(max(json.loads(l)['value'] for l in open('$VDIR/metrics.jsonl') if json.loads(l)['key']=='val/metric'),2))")
git commit -q -m "SpatialNet re-land: flagship convergence artifacts force-committed (best epoch $BEST, val $VAL dB)"
echo "COMMITTED $(date -u) $(git log --oneline -1)" >&2
