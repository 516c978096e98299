#!/bin/bash
# Sweep real-only pretraining checkpoints.
source "$(dirname "$0")/_lib.sh"
parse_val_args "$@"
SECTION_NM=val_drone_real
MIN_CKPT_ITER=${MIN_CKPT_ITER:-0}
[ "$TASK" == "semantics" ] && MIN_CKPT_ITER=0

python3 test_single_task.py ${DATASET} --task ${TASK} --uncertainty ${UNC} \
  --section ${SECTION_NM} --network_in ${CKPT_DIR} $(tiny_flag) $(fullsize_flag) \
  --min_ckpt_iter ${MIN_CKPT_ITER} --max_ckpt_iter ${MAX_CKPT_ITER} ${EXTRA_ARGS}
