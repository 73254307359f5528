#!/bin/bash
# SpatialNet-small convergence run (re-land of the round-1 flagship quality
# artifacts, VERDICT round-4 item 7).
#
# Trains configs/SpatialNet.yaml on the static-room on-device corpus
# (configs/datasets/device_synth.yaml, corpora/rir8k). Checkpoints land
# every epoch, so the run can be stopped at any time and the latest
# checkpoint evaluated with `nbss_tpu.cli test`.
#
# corpora/ is gitignored and wiped between build rounds, so this script
# always invokes the corpus generator first; it is resumable (rooms are
# deterministic in (seed, index); completed rooms are skipped).
# The exact sim + fit flags mirror the RESULTS.md "SpatialNet-small
# convergence" section so the re-run is comparable to the round-1 curve.
#
# Usage: bash scripts/run_spatialnet_convergence.sh [max_epochs]
set -u
cd "$(dirname "$0")/.."
EPOCHS="${1:-100}"
export PYTHONPATH=/root/.axon_site:/root/repo

echo "SIM_START $(date -u)" >&2
python -m nbss_tpu.sim.generate --rir_dir=corpora/rir8k \
  --spk_num=2 --noise_num=0 --rir_nums 400 40 60 \
  --arr_geometry=circular+cm --mic_num=6 --fs=8000 \
  --RT60_lim 0.1 0.6 --length_round=2048 --seed=0 || exit $?
echo "SIM_DONE $(date -u)" >&2

echo "FIT_START $(date -u)" >&2
python -m nbss_tpu.cli fit \
  --config=configs/SpatialNet.yaml \
  --config=configs/datasets/device_synth.yaml \
  --trainer.max_epochs="$EPOCHS" --trainer.precision=bf16-mixed \
  --data.init_args.num_items="[4000,256,256,256]" \
  --model.val_host_metrics="[STOI,eSTOI]" --model.val_host_metrics_every=10
rc=$?
echo "FIT_DONE rc=$rc $(date -u)" >&2
exit $rc
