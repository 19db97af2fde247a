#!/bin/bash
# Round-3b chain (run AFTER r3_chain.sh + r3_finish.sh): kernel trials ->
# nut wide-randomization scenes (the r3 stage that silently no-oped on the
# --n_scenes END-index gotcha) -> longer training for all 3 classes
# (--resume; "more epochs is pure win") -> calib + export -> 3x3 eval
# matrix with the engagement-fixed quality + viability gate -> arm-gated
# arbitrary-mesh demo -> full-res probe.
# Single TPU client: every stage runs alone (the axon tunnel breaks under
# concurrent processes).  Each stage is idempotent + wall-clock bounded.
set -u
cd /root/repo
note() { echo "$(date +%H:%M:%S) $1" >> logs/r3b_chain.log; }
note "=== r3b chain start ==="

# ---- stage 0: one-shot Pallas kernel trials (fresh processes) -----------
if [ ! -f logs/fused_trial.json ]; then
  timeout 900 python scripts/fused_tpu_trial.py > logs/fused_trial.json 2> logs/fused_trial.err
  note "fused trial rc=$? $(tail -c 300 logs/fused_trial.json)"
fi
if [ ! -f logs/render_trial.json ]; then
  timeout 900 python scripts/render_tpu_trial.py > logs/render_trial.json 2> logs/render_trial.err
  note "render trial rc=$? $(tail -c 300 logs/render_trial.json)"
fi

# ---- stage 1: nut scenes at the wide randomization (append 2048) --------
# retry loop: the axon tunnel throws transient remote_compile INTERNAL
# errors (one killed this stage on 8/17); resume from the last written id
for attempt in 1 2 3; do
  [ -f dataset/nut/train/0012879.npz ] && break
  last=$(ls dataset/nut/train/ 2>/dev/null | tail -1 | sed 's/\.npz//;s/^0*//')
  start=$(( ( (${last:-10831} + 1) / 16 ) * 16 ))
  [ $start -lt 10832 ] && start=10832
  timeout 7200 python -m catgrasp_tpu.pipelines.generate_pile_data \
    --class_name nut --split train --n_scenes 12880 --start $start \
    --seed $((42 + 10832)) >> logs/gen_r3b_nut.log 2>&1
  note "gen nut wide attempt $attempt (start=$start) rc=$?"
done
if [ -f dataset/nut/train/0012879.npz ] && \
   [ ! dataset/nut/packed_train/meta.json -nt dataset/nut/train/0012879.npz ]; then
  rm -rf dataset/nut/packed_train
  timeout 5400 python -m catgrasp_tpu.pipelines.pack_training_data \
    --class_name nut --split train --out_dir dataset/nut/packed_train \
    >> logs/pack_r3b.log 2>&1
  note "pack nut rc=$?"
fi

# ---- stage 2: longer training, all classes (resume round-3 weights) -----
trainc() { # class seg_s nunocs_s grasp_s
  local c=$1
  local T=dataset/$c/packed_train V=dataset/$c/packed_val
  local VA=""; [ -f $V/meta.json ] && VA="--val_root $V"
  for net in seg nunocs grasp; do
    local S
    case $net in seg) S=$2;; nunocs) S=$3;; grasp) S=$4;; esac
    [ -f artifacts/$c/.${net}_done_r3b ] && continue
    local R=""; [ -f artifacts/$c/$net/last.ckpt ] && R="--resume artifacts/$c/$net/last.ckpt"
    local EXTRA=""
    [ $net = seg ] && EXTRA="--batch_size 8"
    timeout $((600 + S)) python -m catgrasp_tpu.pipelines.train_$net \
      --class_name $c --data_root $T $VA $EXTRA --max_seconds $S \
      --ckpt_dir artifacts/$c/$net $R > logs/train_${net}_r3b_$c.log 2>&1 \
      && touch artifacts/$c/.${net}_done_r3b
    note "train $net $c rc=$?"
  done
}
trainc nut 1800 900 2400
trainc screw 1200 600 1800
trainc hnm 1200 600 1800
note "stage2 training done"

# ---- stage 3: bandwidth calib + export + grasp-net rank diagnostic ------
for c in nut screw hnm; do
  timeout 1200 python scripts/calibrate_bandwidth.py --class_name $c \
    >> logs/calib_r3b.log 2>&1
  note "calib $c rc=$?"
  timeout 600 python scripts/export_ckpts.py \
    --src artifacts/$c --dst artifacts_tracked/$c >> logs/r3b_chain.log 2>&1
  note "export $c rc=$?"
done
timeout 1800 python scripts/graspnet_diag.py > logs/graspnet_diag_r3b.log 2>&1
note "graspdiag rc=$? $(tail -c 200 logs/graspnet_diag_r3b.log)"
note "STAGE3_EXPORT_DONE (commit artifacts_tracked now)"

# ---- stage 4: eval matrix, learned first (fresh jsonl, post-fix) --------
for c in nut screw hnm; do
  [ -f logs/evalm_r3b_learned_$c.done ] && continue
  timeout 6000 python scripts/eval_matrix.py --class_name $c --oracle 0 \
    --artifacts artifacts_tracked/$c --seeds 0 1 2 \
    --out logs/eval_matrix_r3b.jsonl > logs/evalm_r3b_learned_$c.log 2>&1 \
    && touch logs/evalm_r3b_learned_$c.done
  note "learned $c rc=$?"
done

# ---- stage 5: arm-gated arbitrary-mesh demo (viability-gate fix) --------
if [ ! -f logs/obj_demo_arm_nut.log ]; then
  timeout 3600 python -m catgrasp_tpu.pipelines.run_grasp_simulation \
    --class_name nut --obj_path assets/nut_demo.obj --n_rounds 1 \
    --n_objects 4 --seed 0 --canonical dataset/nut_canonical.npz --oracle 1 \
    > logs/obj_demo_arm_nut.log 2>&1
  note "obj_demo_arm nut rc=$?"
fi

# ---- stage 6: oracle eval matrix ----------------------------------------
for c in nut screw hnm; do
  [ -f logs/evalm_r3b_oracle_$c.done ] && continue
  timeout 4500 python scripts/eval_matrix.py --class_name $c --oracle 1 \
    --seeds 0 1 2 --out logs/eval_matrix_r3b.jsonl \
    > logs/evalm_r3b_oracle_$c.log 2>&1 \
    && touch logs/evalm_r3b_oracle_$c.done
  note "oracle $c rc=$?"
done

# ---- stage 7: full-res render probe -------------------------------------
timeout 900 python scripts/fullres_render.py --n 8 > logs/fullres_r3b.log 2>&1
note "fullres rc=$?"
note "ALL_R3B_CHAIN_DONE"
