#!/bin/bash
# Fine-tune a pretrained encoder on pairwise sim-to-real data.
# Epoch schedule per the reference matrix: in-place 400 (urbanscape) /
# 800 (naturescape); out-of-place 1000, 3000 for the coord task.
source "$(dirname "$0")/_lib.sh"
parse_common_args "$@"
LR=1e-4; BATCH_SIZE=12
if [ "$REAL_DATA_DOM" == "in_place" ]; then
  EPOCHS=400; [ "$DATASET" != "urbanscape" ] && EPOCHS=800
else
  EPOCHS=1000; [ "$TASK" == "coord" ] && EPOCHS=3000
fi
PROJ_DIR=$(pwd)
SIM_DATA_CHUNK=$(printf "%.2f" ${SIM_DATA_CHUNK})
ENC_PRETRAINED=${ENC_PRETRAINED:-$PROJ_DIR/weights-clean/encoders-pretraining/${DATASET}/${TASK}/model-sc-${SIM_DATA_CHUNK}.net}
if [ "$REAL_DATA_DOM" == "in_place" ]; then SP=ip; else SP=oop; fi

python3 train_single_task.py ${DATASET} --task ${TASK} $(task_flags) $(tiny_flag) \
  --learningrate ${LR} --epochs ${EPOCHS} --batch_size ${BATCH_SIZE} \
  --uncertainty ${UNC} --auto_resume --ckpt_dir ${CKPT_DIR} \
  --real_data_domain ${REAL_DATA_DOM} --real_data_chunk ${REAL_DATA_CHUNK} \
  --sim_data_chunk ${SIM_DATA_CHUNK} \
  --network_in ${ENC_PRETRAINED} --session "clean_training_${SP}" --no_lr_scheduling ${EXTRA_ARGS}
