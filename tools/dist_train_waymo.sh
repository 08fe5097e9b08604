#!/bin/bash
# Multi-host Waymo training launcher — the analogue of the reference's
# torchrun script (tools/dist_train_waymo.sh): 4 hosts x 8 chips, global
# batch 96.  Run once per host with PROCESS_ID=0..3; rendezvous goes through
# jax.distributed.initialize (tools/train.py reads these variables).
#
#   COORDINATOR=host0:8476 PROCESS_ID=$i NUM_PROCESSES=4 bash tools/dist_train_waymo.sh
set -euo pipefail

export JAX_COORDINATOR="${COORDINATOR:?set COORDINATOR=host0:port}"
export JAX_NUM_PROCESSES="${NUM_PROCESSES:-4}"
export JAX_PROCESS_ID="${PROCESS_ID:?set PROCESS_ID}"

python tools/train.py \
  --config pillarnext_tpu/configs/experiments/waymo_det_pp18_aspp_iou_car_sp.yaml \
  dataloader.train.batch_size=3 \
  scheduler.max_lr=0.006 \
  trainer.max_epochs=36 \
  "$@"
