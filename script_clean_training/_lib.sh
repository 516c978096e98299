#!/bin/bash
# Shared helpers for the experiment-matrix scripts.
#
# Same positional-argument interface as the reference harness
# (script_clean_training/encoder_pretrain.sh:9-103):
#   DATASET TASK NET_DEPTH SIM_DATA_CHUNK REAL_DATA_DOM REAL_DATA_CHUNK UNC DEVICE_ID
# DEVICE_ID selects the accelerator (was CUDA_VISIBLE_DEVICES; here it maps
# to JAX's device ordinal via CROSSLOC_DEVICE_ORDINAL).

parse_common_args() {
  DATASET=${1:-urbanscape}
  TASK=${2:-NONE}
  NET_DEPTH=${3:-FULL}
  SIM_DATA_CHUNK=${4:-1.0}
  REAL_DATA_DOM=${5:-in_place}
  REAL_DATA_CHUNK=${6:-0.0}
  UNC=${7:-MLE}
  DEVICE_ID=${8:-0}
  export CROSSLOC_DEVICE_ORDINAL=${DEVICE_ID}
  CKPT_DIR=${CKPT_DIR:-./ckpts}
  echo "DATASET=$DATASET TASK=$TASK NET_DEPTH=$NET_DEPTH SIM=$SIM_DATA_CHUNK"
  echo "REAL_DOM=$REAL_DATA_DOM REAL=$REAL_DATA_CHUNK UNC=$UNC DEVICE=$DEVICE_ID"
}

tiny_flag() {
  if [ "$NET_DEPTH" == "TINY" ]; then echo "--tiny"; else echo ""; fi
}

# per-task loss hyperparameters (encoder_pretrain.sh:109-204)
task_flags() {
  case $TASK in
    coord)      echo "--inittolerance 50.0 --softclamp 100 --hardclamp 1000" ;;
    depth)      echo "--hardclamp 10" ;;
    normal)     echo "--hardclamp 10" ;;
    semantics)  echo "--fullsize" ;;
    *) echo "unsupported task $TASK" >&2; exit 1 ;;
  esac
}
