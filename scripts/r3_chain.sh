#!/bin/bash
# Round-3 chain: affordance regen (drift-faithful, all 3 classes) ->
# canonicals -> wide-randomization scene gen (screw/hnm fresh + extra nut)
# -> pack -> per-class training x3 nets -> bandwidth calib -> export.
# Every stage is idempotent (skips when its output exists), wall-clock
# bounded, and notes progress to logs/r3_chain.log.
set -u
cd /root/repo
note() { echo "$(date +%H:%M:%S) $1" >> logs/r3_chain.log; }
note "=== r3 chain start ==="

# ---- stage 1: affordance labels (drift-faithful try_grasp) --------------
aff() { # class index
  local f=dataset/affordance/$1_train_$2_affordance.npz
  [ -f $f ] && [ $f -nt catgrasp_tpu/sim/env_semantic.py ] && return
  timeout 900 python -m catgrasp_tpu.pipelines.generate_affordance \
    --class_name $1 --index $2 --chunk 1024 \
    --grasp_db dataset/grasps/$1_train_$2_complete_grasp.npz \
    >> logs/aff_r3.log 2>&1
  note "aff $1/$2 rc=$?"
}
for i in 0 1 2 3 4 5 6 7 8 9 10 11; do aff nut $i; done
for i in 0 1 2 3 4 5 6 7 8; do aff screw $i; done
for i in 0 1 2 3 4 5 6 7; do aff hnm $i; done
note "stage1 affordance done"

# ---- stage 2: canonicals with affordance codebooks ----------------------
for c in nut screw hnm; do
  timeout 900 python -m catgrasp_tpu.pipelines.make_canonical \
    --class_name $c >> logs/canonical_r3.log 2>&1
  note "canonical $c rc=$?"
done
note "stage2 canonicals done"

# ---- stage 3: scene generation (wide scales 0.5-2.0 + cam rot jitter) ---
gen() { # class split n start
  timeout 7200 python -m catgrasp_tpu.pipelines.generate_pile_data \
    --class_name $1 --split $2 --n_scenes $3 --start $4 --seed $((42 + $4)) \
    >> logs/gen_r3_$1_$2.log 2>&1
  note "gen $1/$2 n=$3 start=$4 rc=$?"
}
[ -f dataset/screw/train/0004095.npz ] || gen screw train 4096 0
[ -f dataset/screw/val/0000511.npz ]   || gen screw val 512 0
[ -f dataset/hnm/train/0004095.npz ]   || gen hnm train 4096 0
[ -f dataset/hnm/val/0000511.npz ]     || gen hnm val 512 0
# extra nut scenes at the widened randomization, appended after the 10832
[ -f dataset/nut/train/0012879.npz ]   || gen nut train 2048 10832
note "stage3 scene gen done"

# ---- stage 4: pack ------------------------------------------------------
pack() { # class split
  local out=dataset/$1/packed_$2
  [ -f $out/meta.json ] && [ $out/meta.json -nt dataset/$1/$2 ] && return
  rm -rf $out
  timeout 5400 python -m catgrasp_tpu.pipelines.pack_training_data \
    --class_name $1 --split $2 --out_dir $out >> logs/pack_r3.log 2>&1
  note "pack $1/$2 rc=$?"
}
# nut train gained scenes: force repack by dir-mtime comparison above
for c in screw hnm nut; do pack $c train; pack $c val; done
note "stage4 pack done"

# ---- stage 5: training (per class; nut resumes round-2 weights) ---------
trainc() { # class seg_s nunocs_s grasp_s
  local c=$1
  local T=dataset/$c/packed_train V=dataset/$c/packed_val
  local VA=""; [ -f $V/meta.json ] && VA="--val_root $V"
  if [ ! -f artifacts/$c/.seg_done ]; then
    local R=""; [ -f artifacts/$c/seg/last.ckpt ] && R="--resume artifacts/$c/seg/last.ckpt"
    timeout $((400 + $2)) python -m catgrasp_tpu.pipelines.train_seg \
      --class_name $c --data_root $T --batch_size 8 --max_seconds $2 \
      --ckpt_dir artifacts/$c/seg $R > logs/train_seg_r3_$c.log 2>&1 \
      && touch artifacts/$c/.seg_done
    note "train seg $c rc=$?"
  fi
  if [ ! -f artifacts/$c/.nunocs_done ]; then
    local R=""; [ -f artifacts/$c/nunocs/last.ckpt ] && R="--resume artifacts/$c/nunocs/last.ckpt"
    timeout $((400 + $3)) python -m catgrasp_tpu.pipelines.train_nunocs \
      --class_name $c --data_root $T $VA --max_seconds $3 \
      --ckpt_dir artifacts/$c/nunocs $R > logs/train_nunocs_r3_$c.log 2>&1 \
      && touch artifacts/$c/.nunocs_done
    note "train nunocs $c rc=$?"
  fi
  if [ ! -f artifacts/$c/.grasp_done ]; then
    local R=""; [ -f artifacts/$c/grasp/last.ckpt ] && R="--resume artifacts/$c/grasp/last.ckpt"
    timeout $((400 + $4)) python -m catgrasp_tpu.pipelines.train_grasp \
      --class_name $c --data_root $T $VA --max_seconds $4 \
      --ckpt_dir artifacts/$c/grasp $R > logs/train_grasp_r3_$c.log 2>&1 \
      && touch artifacts/$c/.grasp_done
    note "train grasp $c rc=$?"
  fi
}
trainc nut 1000 500 1200
trainc screw 1200 600 1200
trainc hnm 1200 600 1200
note "stage5 training done"

# ---- stage 6: bandwidth calibration + export ----------------------------
for c in nut screw hnm; do
  [ -f scripts/calibrate_bandwidth.py ] && timeout 1200 python \
    scripts/calibrate_bandwidth.py --class_name $c \
    >> logs/calib_r3.log 2>&1
  note "calib $c rc=$?"
  timeout 600 python scripts/export_ckpts.py \
    --src artifacts/$c --dst artifacts_tracked/$c >> logs/r3_chain.log 2>&1
  note "export $c rc=$?"
done
note "ALL_R3_CHAIN_DONE"
