#!/usr/bin/env bash
# GMA baseline curriculum (reference train-gma.sh): CRAFT switches off —
# plain correlation + GMA attention (no --craft, no --setrans, --f2 none).
set -e
COMMON="--mixed_precision --f2 none --freeze_bn --print_freq 100 --val_freq 10000"

python3 -m craft_tpu.train --name gma-chairs --stage chairs --validation chairs \
  --output results/chairs/gma --num_steps 120000 --lr 0.00025 \
  --image_size 368 496 --wdecay 0.0001 --batch_size 8 $COMMON
python3 -m craft_tpu.train --name gma-things --stage things --validation sintel \
  --output results/things/gma --restore_ckpt results/chairs/gma/gma-chairs \
  --num_steps 120000 --lr 0.000125 --image_size 400 720 --wdecay 0.0001 --batch_size 6 $COMMON
python3 -m craft_tpu.train --name gma-sintel --stage sintel --validation sintel \
  --output results/sintel/gma --restore_ckpt results/things/gma/gma-things \
  --num_steps 120000 --lr 0.000125 --image_size 368 768 --wdecay 0.00001 --gamma 0.85 --batch_size 6 $COMMON
python3 -m craft_tpu.train --name gma-kitti --stage kitti --validation kitti \
  --output results/kitti/gma --restore_ckpt results/sintel/gma/gma-sintel \
  --num_steps 50000 --lr 0.000125 --image_size 288 960 --wdecay 0.00001 --gamma 0.85 --batch_size 6 $COMMON
