#!/bin/bash
# OnlineSpatialNet moving-speaker convergence run (VERDICT round-3 item 7).
#
# Trains onlineSpatialNet.yaml (mamba(16,4), 8 layers, H=96) on the
# trajectory-RIR on-device corpus (configs/datasets/device_synth_moving.yaml,
# corpora/rir8k_moving rendered with sim --trajectory=4points+sin,0.5).
# Checkpoints land every epoch, so the run can be stopped at any time and the
# latest checkpoint evaluated with scripts/eval_streaming_ckpt.py.
#
# corpora/ is gitignored and wiped between build rounds, so this script
# bootstraps the RIR corpus first if it is missing (resumable: rooms are
# deterministic in (seed, index), partial corpora continue where they left
# off). RIR_NUMS controls the corpus size: "128 16 16" is the documented
# full corpus (~90 min of chip time to render); "32 6 6" is a time-boxed
# variant that trains the identical pipeline on fewer rooms.
#
# Usage: [RIR_NUMS="128 16 16"] bash scripts/run_moving_convergence.sh [max_epochs]
set -u
cd "$(dirname "$0")/.."
EPOCHS="${1:-100}"
RIR_NUMS="${RIR_NUMS:-128 16 16}"
export PYTHONPATH=/root/.axon_site:/root/repo

read -r N_TRAIN N_VAL N_TEST <<< "$RIR_NUMS"
need=0
for setdir_count in "train:$N_TRAIN" "validation:$N_VAL" "test:$N_TEST"; do
  setdir="${setdir_count%%:*}"; count="${setdir_count##*:}"
  have=$(ls corpora/rir8k_moving/"$setdir"/*.npz 2>/dev/null | wc -l)
  [ "$have" -lt "$count" ] && need=1
done
if [ "$need" = 1 ]; then
  echo "SIM_START rir_nums=$RIR_NUMS $(date -u)" >&2
  python -m nbss_tpu.sim.generate --rir_dir=corpora/rir8k_moving \
    --spk_num=2 --rir_nums $RIR_NUMS --fs=8000 \
    --trajectory=4points+sin,0.5 --seed=0 || exit $?
  echo "SIM_DONE $(date -u)" >&2
fi

echo "FIT_START $(date -u)" >&2
python -m nbss_tpu.cli fit \
  --config=configs/onlineSpatialNet.yaml \
  --config=configs/datasets/device_synth_moving.yaml \
  --trainer.max_epochs="$EPOCHS" --trainer.precision=bf16-mixed
rc=$?
echo "FIT_DONE rc=$rc $(date -u)" >&2
exit $rc
