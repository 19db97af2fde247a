#!/bin/bash
# Round-4e chain (fresh session after a VM wipe), ordered by value/minute
# for ~3h of wall clock.  Single TPU client: stages run strictly alone.
#   1. oracle-nut pick-regression debug dumps (r4c stage 2) — the dumps are
#      analyzed on CPU while the later stages own the TPU.
#   2. learned hnm with the FIXED place-fallback ladder (r4d semantics:
#      floor-free relaxed RRT, rows tagged learned+placefb2).  The r4c rows
#      showed zero delta because the fallback's own floor test vetoed every
#      IK branch (relax_goal 12/12).
#   3. oracle screw with the fallback ladder (r4 matrix lost 53-72/72
#      symmetry candidates to the strict RRT).
#   4. nut wide-distribution data (6k/600 — bounded to the session; partial
#      wide still beats round 3's narrow 10.8k) + pack + grasp-net training
#      warm-started from r3b + TRACKED diag jsonl (VERDICT r3 #3) + export.
#   5. leftover wall clock: per-instance-committed affordance stamps.
# Every stage is idempotent, wall-clock bounded, and commits its evidence
# immediately (scene npz / opt state cannot survive a wipe; params + diag
# jsonl + eval rows can, so they are committed the moment they exist).
set -u
cd /root/repo
note() { echo "$(date +%H:%M:%S) $1" >> logs/r4e_chain.log; }
gcommit() { # msg file...
  local msg=$1; shift
  local rc
  flock /tmp/catgrasp_git.lock bash -c '
    cd /root/repo || exit 1
    msg=$1; shift
    git add -- "$@" && git commit -m "$msg

No-Verification-Needed: chain evidence logs/data artifacts only" -- "$@"
  ' gcommit "$msg" "$@"
  rc=$?
  [ $rc -ne 0 ] && note "gcommit FAILED rc=$rc: $msg"
}
note "=== r4e chain start ==="

# ---- 1: oracle-nut pick-regression debug dumps -----------------------------
if [ ! -f logs/pickdbg_r4/.done ]; then
  mkdir -p logs/pickdbg_r4
  rm -f /tmp/pickdbg_*.npz
  CATGRASP_PICK_DEBUG=1 timeout 1800 python -u -m \
    catgrasp_tpu.pipelines.run_grasp_simulation --class_name nut --oracle 1 \
    --n_rounds 2 --n_objects 8 --seed 1 > logs/pickdbg_r4/run.log 2>&1
  rc=$?
  cp /tmp/pickdbg_*.npz logs/pickdbg_r4/ 2>/dev/null
  [ $rc -eq 0 ] && touch logs/pickdbg_r4/.done
  note "pickdbg oracle nut seed 1 rc=$rc ($(ls logs/pickdbg_r4/*.npz 2>/dev/null | wc -l) dumps)"
  gcommit "r4: oracle-nut pick-regression debug run (per-attempt candidate dumps)" \
    logs/pickdbg_r4/run.log logs/r4e_chain.log
fi

# ---- 2: learned hnm with the fixed fallback ladder (placefb2) --------------
if [ ! -f logs/evalm_r4d_hnm_placefb2.done ]; then
  CATGRASP_PLACE_FALLBACKS=1 timeout 4800 python -u scripts/eval_matrix.py \
    --class_name hnm --oracle 0 --artifacts artifacts_tracked/hnm \
    --seeds 0 1 2 --variant placefb2 --out logs/eval_matrix_r4c.jsonl \
    > logs/evalm_r4d_hnm_placefb2.log 2>&1 \
    && touch logs/evalm_r4d_hnm_placefb2.done
  note "learned hnm placefb2 rc=$?"
  gcommit "r4d: learned hnm with fixed place fallback (floor-free relaxed RRT)" \
    logs/eval_matrix_r4c.jsonl logs/evalm_r4d_hnm_placefb2.log logs/r4e_chain.log
fi

# ---- 3: oracle screw with the fallback ladder ------------------------------
if [ ! -f logs/evalm_r4c_screw_placefb.done ]; then
  CATGRASP_PLACE_FALLBACKS=1 timeout 3600 python -u scripts/eval_matrix.py \
    --class_name screw --oracle 1 --seeds 0 1 2 --variant placefb \
    --out logs/eval_matrix_r4c.jsonl \
    > logs/evalm_r4c_screw_placefb.log 2>&1 \
    && touch logs/evalm_r4c_screw_placefb.done
  note "oracle screw placefb rc=$?"
  gcommit "r4c: oracle screw with place fallback ladder" \
    logs/eval_matrix_r4c.jsonl logs/evalm_r4c_screw_placefb.log logs/r4e_chain.log
fi

# ---- 4: nut wide data (bounded) + pack + grasp train + tracked diag --------
for attempt in 1 2 3; do
  [ -f dataset/nut/train/0005999.npz ] && break
  last=$(ls dataset/nut/train/ 2>/dev/null | tail -1 | sed 's/\.npz//;s/^0*//')
  start=$(( ( (${last:--1} + 1) / 16 ) * 16 ))
  timeout 2700 python -m catgrasp_tpu.pipelines.generate_pile_data \
    --class_name nut --split train --n_scenes 6000 --start $start \
    --seed 4242 >> logs/gen_r4e_nut.log 2>&1
  note "gen nut train attempt $attempt (start=$start) rc=$? ($(ls dataset/nut/train 2>/dev/null | wc -l) scenes)"
done
for attempt in 1 2; do
  [ -f dataset/nut/val/0000599.npz ] && break
  last=$(ls dataset/nut/val/ 2>/dev/null | tail -1 | sed 's/\.npz//;s/^0*//')
  start=$(( ( (${last:--1} + 1) / 16 ) * 16 ))
  timeout 900 python -m catgrasp_tpu.pipelines.generate_pile_data \
    --class_name nut --split val --n_scenes 600 --start $start \
    --seed 9191 >> logs/gen_r4e_nut.log 2>&1
  note "gen nut val attempt $attempt rc=$?"
done
if [ ! -f dataset/nut/packed_train/meta.json ]; then
  timeout 2400 python -m catgrasp_tpu.pipelines.pack_training_data \
    --class_name nut --split train --out_dir dataset/nut/packed_train \
    >> logs/pack_r4e.log 2>&1
  note "pack nut train rc=$?"
fi
if [ ! -f dataset/nut/packed_val/meta.json ]; then
  timeout 1200 python -m catgrasp_tpu.pipelines.pack_training_data \
    --class_name nut --split val --out_dir dataset/nut/packed_val \
    >> logs/pack_r4e.log 2>&1
  note "pack nut val rc=$?"
fi
gcommit "r4e: nut wide-distribution data generated + packed (gen/pack logs)" \
  logs/gen_r4e_nut.log logs/pack_r4e.log logs/r4e_chain.log

T=dataset/nut/packed_train V=dataset/nut/packed_val
if [ ! -f artifacts/nut/.grasp_done_r4e ]; then
  W=""
  if [ -f artifacts/nut/grasp/last.ckpt ]; then
    W="--resume artifacts/nut/grasp/last.ckpt"
  elif [ -f artifacts_tracked/nut/grasp/best_val.ckpt ]; then
    W="--init_params artifacts_tracked/nut/grasp/best_val.ckpt"
  fi
  timeout 2900 python -m catgrasp_tpu.pipelines.train_grasp \
    --class_name nut --data_root $T --val_root $V $W --max_seconds 2400 \
    --ckpt_dir artifacts/nut/grasp > logs/train_grasp_r4e_nut.log 2>&1 \
    && touch artifacts/nut/.grasp_done_r4e
  note "train grasp rc=$? $(tail -c 200 logs/train_grasp_r4e_nut.log | tr '\n' ' ')"
fi
timeout 600 python scripts/export_ckpts.py \
  --src artifacts/nut --dst artifacts_tracked/nut >> logs/r4e_chain.log 2>&1
note "export rc=$?"
timeout 1800 python scripts/graspnet_diag.py --class_name nut \
  --artifacts artifacts_tracked/nut --val_root $V \
  --out logs/graspnet_diag.jsonl > logs/graspnet_diag_r4e.log 2>&1
note "graspdiag rc=$? $(tail -c 250 logs/graspnet_diag_r4e.log | tr '\n' ' ')"
gcommit "r4e: grasp net retrained on wide nut data (warm start from r3b); tracked diag jsonl" \
  artifacts_tracked/nut logs/train_grasp_r4e_nut.log \
  logs/graspnet_diag.jsonl logs/graspnet_diag_r4e.log logs/r4e_chain.log

# ---- 5: leftover wall clock — per-instance-committed affordance stamps -----
bash scripts/r4b2_affordance.sh
note "ALL_R4E_CHAIN_DONE"
