#!/usr/bin/env bash
# Shifted-input SlowFlow visualization (reference vis-slowflow-shift.sh:
# same pairs with --xshifts 220 --yshifts 110, query point 552,256).
set -e
DATA=${DATA:-datasets/slowflow/100}
IMG1=${IMG1:-$DATA/sequence_R03/Animals/seq14_0000000.png}
IMG2=${IMG2:-$DATA/sequence_R03/Animals/seq14_0000001.png}
MODEL=${MODEL:-checkpoints/craft-sintel.pth}
POINTS=${POINTS:-32,69}    # ~(552,256) full-res at scale 0.5 -> 1/8 cell

python3 scripts/visdump.py --model "$MODEL" --craft --setrans --f2 full \
  --img1 "$IMG1" --img2 "$IMG2" --scale 0.5 --xshift 220 --yshift 110 \
  --points "$POINTS" --out vis_out/slowflow-shift "$@"
