#!/usr/bin/env bash
# The canonical 5-stage CRAFT curriculum (reference train-craft-f2full.sh),
# driven through the craft_tpu trainer.  Hyperparameters match the reference:
# chairs(120k, lr 2.5e-4, 368x496, bs8, wd1e-4) -> things(120k, 1.25e-4,
# 400x720, bs6) -> sintel(120k, gamma .85, 368x768, wd1e-5) -> kitti(50k,
# 288x960) -> viper(50k), plus the Autoflow pretraining variant.
set -e
COMMON="--mixed_precision --craft --setrans --f2 full --freeze_bn --print_freq 100 --val_freq 10000"

python3 -m craft_tpu.train --name craft-chairs --stage chairs --validation chairs \
  --output results/chairs/craft-f2full --num_steps 120000 --lr 0.00025 \
  --image_size 368 496 --wdecay 0.0001 --batch_size 8 $COMMON
python3 -m craft_tpu.train --name craft-things --stage things --validation sintel \
  --output results/things/craft-f2full --restore_ckpt results/chairs/craft-f2full/craft-chairs \
  --num_steps 120000 --lr 0.000125 --image_size 400 720 --wdecay 0.0001 --batch_size 6 $COMMON
python3 -m craft_tpu.train --name craft-sintel --stage sintel --validation sintel \
  --output results/sintel/craft-f2full --restore_ckpt results/things/craft-f2full/craft-things \
  --num_steps 120000 --lr 0.000125 --image_size 368 768 --wdecay 0.00001 --gamma 0.85 --batch_size 6 $COMMON
python3 -m craft_tpu.train --name craft-kitti --stage kitti --validation kitti \
  --output results/kitti/craft-f2full --restore_ckpt results/sintel/craft-f2full/craft-sintel \
  --num_steps 50000 --lr 0.000125 --image_size 288 960 --wdecay 0.00001 --gamma 0.85 --batch_size 6 $COMMON
python3 -m craft_tpu.train --name craft-viper --stage viper --validation viper \
  --output results/viper/craft-f2full --restore_ckpt results/sintel/craft-f2full/craft-sintel \
  --num_steps 50000 --lr 0.000125 --image_size 288 960 --wdecay 0.00001 --gamma 0.85 --batch_size 6 $COMMON
