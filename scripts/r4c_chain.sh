#!/bin/bash
# Round-4c chain (run AFTER r4_master.sh): measurement of this session's two
# new leads from the r4 matrix post-mortem:
#   1. place fallback ladder (CATGRASP_PLACE_FALLBACKS=1): learned hnm lost
#      ~15 placements to "no IK-feasible/plannable orientation among 2
#      symmetries"; rows tagged mode=learned+placefb isolate the delta
#      against the r4 matrix (same weights, same canonical, same seeds).
#   2. oracle-nut pick regression (16/16 in r2 -> 10/8/13 in r4): dump every
#      attempt with CATGRASP_PICK_DEBUG=1 for offline post-mortem (was the
#      target between the fingers at the commanded pose, or shoved away
#      during approach/close under the r4 force-bounded gripper?).
# Single TPU client: stages run alone.  Idempotent; commits evidence.
set -u
cd /root/repo
note() { echo "$(date +%H:%M:%S) $1" >> logs/r4c_chain.log; }
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
note "=== r4c chain start ==="

# ---- 1: learned hnm with the place fallback ladder ------------------------
if [ ! -f logs/evalm_r4c_hnm_placefb.done ]; then
  CATGRASP_PLACE_FALLBACKS=1 timeout 6000 python -u scripts/eval_matrix.py \
    --class_name hnm --oracle 0 --artifacts artifacts_tracked/hnm \
    --seeds 0 1 2 --variant placefb --out logs/eval_matrix_r4c.jsonl \
    > logs/evalm_r4c_hnm_placefb.log 2>&1 \
    && touch logs/evalm_r4c_hnm_placefb.done
  note "learned hnm placefb rc=$?"
  gcommit "r4c: learned hnm with place fallback ladder (IK branches + relaxed RRT)" \
    logs/eval_matrix_r4c.jsonl logs/evalm_r4c_hnm_placefb.log \
    logs/evalm_r4c_hnm_placefb.done logs/r4c_chain.log
fi

# ---- 1b: oracle screw with the place fallback ladder -----------------------
# r4 oracle screw placed only 5/1/6: the per-gate counters show the strict
# RRT rejecting 53-72 of 72 symmetry candidates — the fixture points in the
# obstacle cloud make every pre-place config read as colliding (the
# reference plans place transport with obstacles=[]).
if [ ! -f logs/evalm_r4c_screw_placefb.done ]; then
  CATGRASP_PLACE_FALLBACKS=1 timeout 6000 python -u scripts/eval_matrix.py \
    --class_name screw --oracle 1 --seeds 0 1 2 --variant placefb \
    --out logs/eval_matrix_r4c.jsonl \
    > logs/evalm_r4c_screw_placefb.log 2>&1 \
    && touch logs/evalm_r4c_screw_placefb.done
  note "oracle screw placefb rc=$?"
  gcommit "r4c: oracle screw with place fallback ladder" \
    logs/eval_matrix_r4c.jsonl logs/evalm_r4c_screw_placefb.log \
    logs/evalm_r4c_screw_placefb.done logs/r4c_chain.log
fi

# ---- 2: oracle-nut pick-regression debug dumps -----------------------------
if [ ! -f logs/pickdbg_r4/.done ]; then
  mkdir -p logs/pickdbg_r4
  rm -f /tmp/pickdbg_*.npz
  CATGRASP_PICK_DEBUG=1 timeout 3000 python -u -m \
    catgrasp_tpu.pipelines.run_grasp_simulation --class_name nut --oracle 1 \
    --n_rounds 2 --n_objects 8 --seed 1 > logs/pickdbg_r4/run.log 2>&1
  rc=$?
  cp /tmp/pickdbg_*.npz logs/pickdbg_r4/ 2>/dev/null
  [ $rc -eq 0 ] && touch logs/pickdbg_r4/.done
  note "pickdbg oracle nut seed 1 rc=$rc ($(ls logs/pickdbg_r4/*.npz 2>/dev/null | wc -l) dumps)"
  gcommit "r4c: oracle-nut pick-regression debug run (per-attempt candidate dumps)" \
    logs/pickdbg_r4/run.log logs/r4c_chain.log
fi
note "ALL_R4C_CHAIN_DONE"
