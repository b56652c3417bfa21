#!/usr/bin/env bash
# Evaluate the four released reference checkpoints (reference
# evaluate-craft-f2full.sh): each .pth is converted on the fly.
set -e
COMMON="--craft --setrans --f2 full"

python3 -m craft_tpu.evaluate --model checkpoints/craft-chairs.pth --dataset chairs $COMMON
python3 -m craft_tpu.evaluate --model checkpoints/craft-things.pth --dataset sintel $COMMON
python3 -m craft_tpu.evaluate --model checkpoints/craft-sintel.pth --dataset sintel $COMMON
python3 -m craft_tpu.evaluate --model checkpoints/craft-kitti.pth --dataset kitti $COMMON
