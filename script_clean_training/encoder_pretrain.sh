#!/bin/bash
# Encoder pretraining on LHS synthetic data.
# Hyperparameters per the reference matrix: LR 2e-4, batch 12,
# 150 (urbanscape) / 100 (naturescape) epochs, 30 for semantics.
source "$(dirname "$0")/_lib.sh"
parse_common_args "$@"
LR=2e-4; BATCH_SIZE=12
EPOCHS=150; [ "$DATASET" != "urbanscape" ] && EPOCHS=100
[ "$TASK" == "semantics" ] && EPOCHS=30

python3 train_single_task.py ${DATASET} --task ${TASK} $(task_flags) $(tiny_flag) \
  --learningrate ${LR} --epochs ${EPOCHS} --batch_size ${BATCH_SIZE} \
  --uncertainty ${UNC} --auto_resume --ckpt_dir ${CKPT_DIR} \
  --real_data_domain ${REAL_DATA_DOM} --real_data_chunk ${REAL_DATA_CHUNK} \
  --sim_data_chunk ${SIM_DATA_CHUNK} --session "clean_training" ${EXTRA_ARGS}
