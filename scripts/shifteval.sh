#!/usr/bin/env bash
# Shift-robustness sweep (reference shifteval.sh): x in 100..300, y in
# 50..150 on sintel/slowflow.
set -e
COMMON="--craft --setrans --f2 full"

python3 -m craft_tpu.evaluate --model checkpoints/craft-sintel.pth --dataset sintel \
  --xshifts 100,200,300 --yshifts 50,100,150 $COMMON
python3 -m craft_tpu.evaluate --model checkpoints/craft-sintel.pth --dataset slowflow \
  --xshifts 100,200,300 --yshifts 50,100,150 $COMMON
