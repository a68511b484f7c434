#!/bin/bash
set -x
cd /root/repo
# Wait for the norm A/B to finish (single CPU core — serialize).
while ! grep -q NORM_AB_DONE /tmp/norm_ab.log 2>/dev/null; do sleep 60; done
COMMON="--cpu --preset brandubh --hours 0.6 --iterations 100000 --games 32
 --selfplay-batch 32 --max-game-len 60 --temp-threshold 6
 --resign 0.9 --resign-min-moves 10 --sims 32 --children 16 --scan-moves 8
 --train-steps 40 --batch 128 --min-replay 512 --replay-capacity 50000
 --lr 0.002 --channels 16 --blocks 2
 --arena-games 24 --arena-sims 16 --arena-max-len 60 --arena-every 1
 --gate 0.55 --gate-on decisive --gate-min-decisive 4
 --checkpoint-every 4 --checkpoint-keep 6 --seed 9"
python scripts/train_run.py --name brandubh_wc_puct $COMMON
python scripts/train_run.py --name brandubh_wc_gumbel $COMMON --gumbel --gumbel-sample-early
python scripts/cross_ladder.py --cpu --preset brandubh \
  --entry wc_puct=runs/brandubh_wc_puct/ckpt:latest \
  --entry wc_gumbel=runs/brandubh_wc_gumbel/ckpt:latest \
  --entry norm_group=runs/brandubh_ab_norm_group/ckpt:latest \
  --anchors uniform,material,random --games 32 --sims 32 --children 16 \
  --channels 16 --blocks 2 --max-game-len 60 \
  --out runs/brandubh_wc_cross_ladder.json
echo GUMBEL_AB_DONE
