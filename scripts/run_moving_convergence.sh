#!/bin/bash
# OnlineSpatialNet moving-speaker convergence run (VERDICT round-3 item 7).
#
# Trains onlineSpatialNet.yaml (mamba(16,4), 8 layers, H=96) on the
# trajectory-RIR on-device corpus (configs/datasets/device_synth_moving.yaml,
# corpora/rir8k_moving rendered with sim --trajectory=4points+sin,0.5).
# Checkpoints land every epoch, so the run can be stopped at any time and the
# latest checkpoint evaluated with scripts/eval_streaming_ckpt.py.
#
# Usage: bash scripts/run_moving_convergence.sh [max_epochs]
set -u
cd "$(dirname "$0")/.."
EPOCHS="${1:-100}"
export PYTHONPATH=/root/.axon_site:/root/repo
echo "FIT_START $(date -u)" >&2
python -m nbss_tpu.cli fit \
  --config=configs/onlineSpatialNet.yaml \
  --config=configs/datasets/device_synth_moving.yaml \
  --trainer.max_epochs="$EPOCHS" --trainer.precision=bf16-mixed
rc=$?
echo "FIT_DONE rc=$rc $(date -u)" >&2
exit $rc
