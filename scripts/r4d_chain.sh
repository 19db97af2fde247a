#!/bin/bash
# Round-4d: re-measure learned hnm with the FIXED fallback ladder (the r4c
# hnm rows ran before the relaxed planner's floor test was disabled, and the
# per-gate counters showed that test vetoing every branch: relax_goal 12/12;
# the reference place transport checks nothing, obstacles=[]).  Rows tagged
# mode=learned+placefb2.
set -u
cd /root/repo
note() { echo "$(date +%H:%M:%S) $1" >> logs/r4d_chain.log; }
gcommit() { # msg file...
  local msg=$1; shift
  local rc
  flock /tmp/catgrasp_git.lock bash -c '
    cd /root/repo || exit 1
    msg=$1; shift
    git add -- "$@" && git commit -m "$msg

No-Verification-Needed: chain evidence logs only" -- "$@"
  ' gcommit "$msg" "$@"
  rc=$?
  [ $rc -ne 0 ] && note "gcommit FAILED rc=$rc: $msg"
}
note "=== r4d chain start ==="
if [ ! -f logs/evalm_r4d_hnm_placefb2.done ]; then
  CATGRASP_PLACE_FALLBACKS=1 timeout 6000 python -u scripts/eval_matrix.py \
    --class_name hnm --oracle 0 --artifacts artifacts_tracked/hnm \
    --seeds 0 1 2 --variant placefb2 --out logs/eval_matrix_r4c.jsonl \
    > logs/evalm_r4d_hnm_placefb2.log 2>&1 \
    && touch logs/evalm_r4d_hnm_placefb2.done
  note "learned hnm placefb2 rc=$?"
  gcommit "r4d: learned hnm with fixed place fallback (floor-free relaxed RRT)" \
    logs/eval_matrix_r4c.jsonl logs/evalm_r4d_hnm_placefb2.log \
    logs/evalm_r4d_hnm_placefb2.done logs/r4d_chain.log
fi
note "ALL_R4D_CHAIN_DONE"
