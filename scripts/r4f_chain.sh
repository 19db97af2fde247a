#!/bin/bash
# Round-4f chain (fresh session, ~3h wall clock), single TPU client, strictly
# serial.  Reorders r4e by diagnosis value + wipe risk:
#   1. pickdbg WITH the canonical loaded: the r4e pickdbg ran the CLI without
#      --canonical, so the combined sampler degenerated to cone-only (all
#      prov=0) and picked 15/15 — it never reproduced the matrix's 10/8/13.
#      The regression is hypothesized to live in the NOCS-transfer codebook
#      candidates (prov=1) that only the matrix runs sample.
#   2. nut wide-distribution data + pack + warm-started grasp training +
#      TRACKED diag (VERDICT r3 #3) — the longest pole, must not be cut off
#      by the session end again (r4e lost it to the wipe).
#   3. learned hnm placefb2 + oracle screw placefb evals (fallback-ladder
#      delta; these also pick up any pick fix landed while stage 2 ran).
#   4. leftover: per-instance-committed affordance stamps.
# Shares .done markers with r4e so nothing re-runs.
set -u
cd /root/repo
note() { echo "$(date +%H:%M:%S) $1" >> logs/r4f_chain.log; }
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
note "=== r4f chain start ==="

# ---- 1: pickdbg with the canonical (reproduce the codebook-grasp failures) -
if [ ! -f logs/pickdbg_r4f/.done ]; then
  mkdir -p logs/pickdbg_r4f
  rm -f /tmp/pickdbg_*.npz
  CATGRASP_PICK_DEBUG=1 timeout 1800 python -u -m \
    catgrasp_tpu.pipelines.run_grasp_simulation --class_name nut --oracle 1 \
    --canonical dataset/nut_canonical.npz \
    --n_rounds 2 --n_objects 8 --seed 1 > logs/pickdbg_r4f/run.log 2>&1
  rc=$?
  cp /tmp/pickdbg_*.npz logs/pickdbg_r4f/ 2>/dev/null
  [ $rc -eq 0 ] && touch logs/pickdbg_r4f/.done
  note "pickdbg+canonical oracle nut seed 1 rc=$rc ($(ls logs/pickdbg_r4f/*.npz 2>/dev/null | wc -l) dumps)"
  gcommit "r4f: oracle-nut pickdbg rerun with canonical codebook loaded" \
    logs/pickdbg_r4f logs/r4f_chain.log
fi

# ---- 2: nut wide data (bounded) + pack + grasp train + tracked diag --------
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
gcommit "r4f: nut wide-distribution data generated + packed (gen/pack logs)" \
  logs/gen_r4e_nut.log logs/pack_r4e.log logs/r4f_chain.log

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
  --src artifacts/nut --dst artifacts_tracked/nut >> logs/r4f_chain.log 2>&1
note "export rc=$?"
timeout 1800 python scripts/graspnet_diag.py --class_name nut \
  --artifacts artifacts_tracked/nut --val_root $V \
  --out logs/graspnet_diag.jsonl > logs/graspnet_diag_r4e.log 2>&1
note "graspdiag rc=$? $(tail -c 250 logs/graspnet_diag_r4e.log | tr '\n' ' ')"
gcommit "r4f: grasp net retrained on wide nut data (warm start from r3b); tracked diag jsonl" \
  artifacts_tracked/nut logs/train_grasp_r4e_nut.log \
  logs/graspnet_diag.jsonl logs/graspnet_diag_r4e.log logs/r4f_chain.log

# ---- 3: fallback-ladder evals (pick up any pick fix landed during stage 2) -
if [ ! -f logs/evalm_r4d_hnm_placefb2.done ]; then
  CATGRASP_PLACE_FALLBACKS=1 timeout 4800 python -u scripts/eval_matrix.py \
    --class_name hnm --oracle 0 --artifacts artifacts_tracked/hnm \
    --seeds 0 1 2 --variant placefb2 --out logs/eval_matrix_r4c.jsonl \
    > logs/evalm_r4d_hnm_placefb2.log 2>&1 \
    && touch logs/evalm_r4d_hnm_placefb2.done
  note "learned hnm placefb2 rc=$?"
  gcommit "r4d: learned hnm with fixed place fallback (floor-free relaxed RRT)" \
    logs/eval_matrix_r4c.jsonl logs/evalm_r4d_hnm_placefb2.log logs/r4f_chain.log
fi
if [ ! -f logs/evalm_r4c_screw_placefb.done ]; then
  CATGRASP_PLACE_FALLBACKS=1 timeout 3600 python -u scripts/eval_matrix.py \
    --class_name screw --oracle 1 --seeds 0 1 2 --variant placefb \
    --out logs/eval_matrix_r4c.jsonl \
    > logs/evalm_r4c_screw_placefb.log 2>&1 \
    && touch logs/evalm_r4c_screw_placefb.done
  note "oracle screw placefb rc=$?"
  gcommit "r4c: oracle screw with place fallback ladder" \
    logs/eval_matrix_r4c.jsonl logs/evalm_r4c_screw_placefb.log logs/r4f_chain.log
fi

# ---- 4: leftover wall clock — per-instance-committed affordance stamps -----
bash scripts/r4b2_affordance.sh
note "ALL_R4F_CHAIN_DONE"
