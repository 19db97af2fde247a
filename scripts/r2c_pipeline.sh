#!/bin/bash
# Round-2 learned-perception pipeline: pack -> train x3 -> export -> eval.
# Assumes dataset/nut/train (and val) scene npz records already exist
# (generate_pile_data). Every stage is wall-clock bounded and appends to
# logs/r2c_chain.log so an interrupted run shows where it stopped.
# Trained eval weights are exported to the TRACKED artifacts_tracked/ (the
# VM is wiped between sessions; only git survives).
set -u
cd /root/repo
TRAIN=dataset/nut/packed_train
VAL=dataset/nut/packed_val
note() { echo "$(date +%H:%M:%S) $1" >> logs/r2c_chain.log; }

if [ ! -f $TRAIN/meta.json ]; then
  note "pack train start ($(ls dataset/nut/train | wc -l) scenes)"
  timeout 3600 python -m catgrasp_tpu.pipelines.pack_training_data \
    --class_name nut --split train --out_dir $TRAIN > logs/pack_train_r2c.log 2>&1
  note "pack train rc=$?"
fi
if [ -d dataset/nut/val ] && [ ! -f $VAL/meta.json ]; then
  note "pack val start ($(ls dataset/nut/val | wc -l) scenes)"
  timeout 900 python -m catgrasp_tpu.pipelines.pack_training_data \
    --class_name nut --split val --out_dir $VAL > logs/pack_val_r2c.log 2>&1
  note "pack val rc=$?"
fi

VALARG=""
[ -f $VAL/meta.json ] && VALARG="--val_root $VAL"

note "train seg start"
timeout 2400 python -m catgrasp_tpu.pipelines.train_seg \
  --data_root $TRAIN --batch_size 8 --max_seconds 1800 \
  --ckpt_dir artifacts/seg > logs/train_seg_r2c.log 2>&1
note "train seg rc=$?"

note "train nunocs start"
timeout 1800 python -m catgrasp_tpu.pipelines.train_nunocs \
  --data_root $TRAIN $VALARG --max_seconds 1300 \
  --ckpt_dir artifacts/nunocs > logs/train_nunocs_r2c.log 2>&1
note "train nunocs rc=$?"

note "train grasp start"
timeout 1500 python -m catgrasp_tpu.pipelines.train_grasp \
  --data_root $TRAIN $VALARG --max_seconds 1000 \
  --ckpt_dir artifacts/grasp > logs/train_grasp_r2c.log 2>&1
note "train grasp rc=$?"

python scripts/export_ckpts.py >> logs/r2c_chain.log 2>&1
note "export done"

note "learned eval start"
timeout 2400 python -m catgrasp_tpu.pipelines.run_grasp_simulation \
  --class_name nut --n_rounds 2 --n_objects 8 --oracle 0 \
  --artifacts artifacts_tracked --seed 0 \
  --metrics logs/learned_eval_r2c.jsonl > logs/learned_eval_r2c.log 2>&1
note "learned eval rc=$?"
note ALL_DONE
