#!/bin/bash
set -x
cd /root/repo
for NORM in group none; do
  python scripts/train_run.py --cpu --name brandubh_ab_norm_$NORM --preset brandubh \
    --iterations 200 --games 32 --selfplay-batch 32 --max-game-len 60 \
    --temp-threshold 6 --sims 32 --children 16 --scan-moves 8 \
    --train-steps 40 --batch 128 --min-replay 512 --replay-capacity 20000 \
    --lr 0.002 --channels 16 --blocks 2 --norm $NORM \
    --arena-every 0 --checkpoint-every 50 --checkpoint-keep 5 --seed 21
done
for NORM in group none; do
  python scripts/eval_run.py --cpu --ckpt runs/brandubh_ab_norm_$NORM/ckpt \
    --preset brandubh --games 32 --sims 32 --children 16 \
    --channels 16 --blocks 2 --norm $NORM --max-steps 2 --max-game-len 60 \
    --anchors uniform,material,random > runs/brandubh_ab_norm_$NORM/ladder_anchored.json
done
echo NORM_AB_DONE
