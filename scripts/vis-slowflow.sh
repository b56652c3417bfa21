#!/usr/bin/env bash
# SlowFlow attention/correlation visualization at half resolution (reference
# vis-slowflow.sh: SAVECORR/SAVEF2 dumps on a slowflow Animals pair at
# --scale 0.5, rendered with attvis.py).  Pass different --model/--points to
# compare raft/gma/craft variants as the reference does.
set -e
DATA=${DATA:-datasets/slowflow/100}
IMG1=${IMG1:-$DATA/sequence_R03/Animals/seq14_0000000.png}
IMG2=${IMG2:-$DATA/sequence_R03/Animals/seq14_0000001.png}
MODEL=${MODEL:-checkpoints/craft-sintel.pth}
POINTS=${POINTS:-66,128}   # ~(1024,528) full-res at scale 0.5 -> 1/8 cell

python3 scripts/visdump.py --model "$MODEL" --craft --setrans --f2 full \
  --img1 "$IMG1" --img2 "$IMG2" --scale 0.5 --points "$POINTS" \
  --out vis_out/slowflow "$@"
