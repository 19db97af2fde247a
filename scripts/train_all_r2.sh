#!/bin/bash
# Reference-scale training of the three nets on the packed 20k-scene nut
# dataset (config schedules; best-val checkpoints land in artifacts/).
# Run after pack_training_data finishes; each net is wall-clock bounded so
# a slow epoch rate still yields usable best-val/best-train checkpoints.
cd /root/repo
TRAIN=dataset/nut/packed_train
VAL=dataset/nut/packed_val

SEG_RESUME=""
[ -f artifacts/seg/best_train.ckpt ] && SEG_RESUME="--resume artifacts/seg/best_train.ckpt"
timeout 7200 python -m catgrasp_tpu.pipelines.train_seg \
  --data_root $TRAIN --batch_size 8 $SEG_RESUME \
  --ckpt_dir artifacts/seg > logs/train_seg_r2.log 2>&1
echo "SEG_DONE rc=$?" >> logs/train_chain.log

timeout 9000 python -m catgrasp_tpu.pipelines.train_nunocs \
  --data_root $TRAIN --val_root $VAL \
  --ckpt_dir artifacts/nunocs > logs/train_nunocs_r2.log 2>&1
echo "NUNOCS_DONE rc=$?" >> logs/train_chain.log

timeout 7200 python -m catgrasp_tpu.pipelines.train_grasp \
  --data_root $TRAIN --val_root $VAL \
  --ckpt_dir artifacts/grasp > logs/train_grasp_r2.log 2>&1
echo "GRASP_DONE rc=$?" >> logs/train_chain.log
echo ALL_TRAIN_DONE >> logs/train_chain.log
