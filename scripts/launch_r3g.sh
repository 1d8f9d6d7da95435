#!/bin/bash
# Stage III finishing leg (relaunch of r3f which died at local iter ~1290).
# Resumes from iteration_49017; 13000 iters lands at global 62017.
cd /root/repo
{ python train.py -s _runs/syn150_512/data -m _runs/syn150_512/model \
  --max_tiles_per_gaussian 8 --freeze_tile_budget --max_pairs_per_tile 1024 \
  --feat_bf16 --capacity_round 131072 --eval_frequency 10000 --save_frequency 1000 \
  --iterations 13000 --position_lr_max_steps 13000 --densify_until_iter 10700 \
  && echo "=== Evaluation ===" \
  && LAST=$(ls _runs/syn150_512/model/point_cloud | sed 's/iteration_//' | sort -n | tail -1) \
  && python eval.py -s _runs/syn150_512/data -p _runs/syn150_512/model/point_cloud/iteration_$LAST/point_cloud.ply -pt gs -m _runs/syn150_512/model \
  && echo "=== DONE ==="; } > _runs/stage3_r3g.log 2>&1
