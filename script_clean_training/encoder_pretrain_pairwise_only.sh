#!/bin/bash
# Encoder pretraining ablation: pairwise sim-to-real data only (no LHS sim).
source "$(dirname "$0")/_lib.sh"
parse_common_args "$@"
LR=2e-4; BATCH_SIZE=12
EPOCHS=150; [ "$DATASET" != "urbanscape" ] && EPOCHS=100
[ "$TASK" == "semantics" ] && EPOCHS=30

python3 train_single_task.py ${DATASET} --task ${TASK} $(task_flags) $(tiny_flag) \
  --learningrate ${LR} --epochs ${EPOCHS} --batch_size ${BATCH_SIZE} \
  --uncertainty ${UNC} --auto_resume --ckpt_dir ${CKPT_DIR} \
  --real_data_domain ${REAL_DATA_DOM} --real_data_chunk ${REAL_DATA_CHUNK} \
  --sim_data_chunk 0.0 --session "clean_training" ${EXTRA_ARGS}
