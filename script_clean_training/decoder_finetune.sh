#!/bin/bash
# CrossLoc MLR decoder fine-tuning (coord+depth+normal encoders).
# Reference matrix: LR 1e-4, batch 8, 1000 epochs; encoder weight paths by
# convention under weights-clean/encoders-finetuning/.
source "$(dirname "$0")/_lib.sh"
parse_common_args "$@"
LR=1e-4; BATCH_SIZE=8; EPOCHS=1000
PT_SIM=$(printf "%.2f" ${SIM_DATA_CHUNK})
PT_RC=$(printf "%.2f" ${REAL_DATA_CHUNK})
PROJ_DIR=$(pwd)
W=$PROJ_DIR/weights-clean/encoders-finetuning/${DATASET}/${REAL_DATA_DOM}
ENC_COORD=${ENC_COORD:-$W/coord/model-sc-${PT_SIM}-rc-${PT_RC}.net}
ENC_DEPTH=${ENC_DEPTH:-$W/depth/model-sc-${PT_SIM}-rc-${PT_RC}.net}
ENC_NORMAL=${ENC_NORMAL:-$W/normal/model-sc-${PT_SIM}-rc-${PT_RC}.net}
ENC_SEMANTICS=${ENC_SEMANTICS:-$W/semantics/model-sc-${PT_SIM}-rc-${PT_RC}.net}
if [ "$REAL_DATA_DOM" == "in_place" ]; then SP="enc-pt${PT_SIM}-ip-ft${PT_RC}"; else SP="enc-pt${PT_SIM}-oop-ft${PT_RC}"; fi

python3 finetune_decoder_single_task.py ${DATASET} --task ${TASK} $(task_flags) $(tiny_flag) \
  --learningrate ${LR} --epochs ${EPOCHS} --batch_size ${BATCH_SIZE} \
  --uncertainty ${UNC} --auto_resume --ckpt_dir ${CKPT_DIR} \
  --real_data_domain ${REAL_DATA_DOM} --real_data_chunk ${REAL_DATA_CHUNK} --sim_data_chunk 0.0 \
  --coord_weight ${ENC_COORD} --depth_weight ${ENC_DEPTH} --normal_weight ${ENC_NORMAL} --semantics_weight ${ENC_SEMANTICS} \
  --encoders coord depth normal --session "${SP}" \
  --reuse_coord_encoder --unfreeze_coord_encoder --no_lr_scheduling ${EXTRA_ARGS}
