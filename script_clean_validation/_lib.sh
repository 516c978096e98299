#!/bin/bash
# Shared helpers for the validation sweeps. Positional args:
#   DATASET TASK NET_DEPTH UNC DEVICE_ID
# Env vars (reference convention): CKPT_DIR (weights to sweep),
# MIN_CKPT_ITER / MAX_CKPT_ITER (checkpoint filters).
parse_val_args() {
  DATASET=${1:-urbanscape}
  TASK=${2:-NONE}
  NET_DEPTH=${3:-FULL}
  UNC=${4:-MLE}
  DEVICE_ID=${5:-0}
  export CROSSLOC_DEVICE_ORDINAL=${DEVICE_ID}
  CKPT_DIR=${CKPT_DIR:-./ckpts}
  MAX_CKPT_ITER=${MAX_CKPT_ITER:-1e98}
}
tiny_flag() { if [ "$NET_DEPTH" == "TINY" ]; then echo "--tiny"; else echo ""; fi }
fullsize_flag() { if [ "$TASK" == "semantics" ]; then echo "--fullsize"; else echo ""; fi }
