#!/usr/bin/env bash
# CRAFT f2full without GMA — the CRAFT_nogma ablation (reference
# train-craft-f2full-nogma.sh: same curriculum, --nogma).
set -e
COMMON="--mixed_precision --craft --f2 full --nogma --freeze_bn --print_freq 100 --val_freq 10000"

python3 -m craft_tpu.train --name craft-chairs --stage chairs --validation chairs \
  --output results/chairs/craft-f2full-nogma --num_steps 120000 --lr 0.00025 \
  --image_size 368 496 --wdecay 0.0001 --batch_size 8 $COMMON
python3 -m craft_tpu.train --name craft-things --stage things --validation sintel \
  --output results/things/craft-f2full-nogma --restore_ckpt results/chairs/craft-f2full-nogma/craft-chairs \
  --num_steps 120000 --lr 0.000125 --image_size 400 720 --wdecay 0.0001 --batch_size 6 $COMMON
python3 -m craft_tpu.train --name craft-sintel --stage sintel --validation sintel \
  --output results/sintel/craft-f2full-nogma --restore_ckpt results/things/craft-f2full-nogma/craft-things \
  --num_steps 120000 --lr 0.000125 --image_size 368 768 --wdecay 0.00001 --gamma 0.85 --batch_size 6 $COMMON
python3 -m craft_tpu.train --name craft-kitti --stage kitti --validation kitti \
  --output results/kitti/craft-f2full-nogma --restore_ckpt results/sintel/craft-f2full-nogma/craft-sintel \
  --num_steps 50000 --lr 0.000125 --image_size 288 960 --wdecay 0.00001 --gamma 0.85 --batch_size 6 $COMMON
python3 -m craft_tpu.train --name craft-viper --stage viper --validation viper \
  --output results/viper/craft-f2full-nogma --restore_ckpt results/sintel/craft-f2full-nogma/craft-sintel \
  --num_steps 50000 --lr 0.000125 --image_size 288 960 --wdecay 0.00001 --gamma 0.85 --batch_size 6 $COMMON
