#!/bin/bash
# Round-3b finish chain (replaces the tail of r3_finish.sh, taken over so the
# eval matrix runs against the FULL 12-instance nut canonical):
#   1. wait for the in-flight fullres probe to exit
#   2. repair nut/2 affordance (lost to a transient axon FailedPrecondition
#      race; retry up to 3x)
#   3. rebuild the nut canonical with all 12 instances
#   4. 3-class x 3-seed eval matrix: learned first, then oracle
#   5. fused-rollout TPU trial (fresh process, bounded)
# All stages strictly sequential: the axon tunnel is single-client.
set -u
cd /root/repo
note() { echo "$(date +%H:%M:%S) $1" >> logs/r3b_chain.log; }
note "=== r3b chain start ==="

# ---- 1. wait for fullres probe (PID passed as $1, optional) -------------
if [ $# -ge 1 ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 10; done
  note "fullres probe (pid $1) exited"
fi

# ---- 2. repair nut/2 with retries ---------------------------------------
for attempt in 1 2 3; do
  timeout 1200 python -m catgrasp_tpu.pipelines.generate_affordance \
    --class_name nut --index 2 --chunk 1024 \
    --grasp_db dataset/grasps/nut_train_2_complete_grasp.npz \
    >> logs/aff_r3.log 2>&1
  rc=$?
  note "repair aff nut/2 attempt $attempt rc=$rc"
  [ $rc -eq 0 ] && break
  sleep 30
done

# ---- 3. rebuild nut canonical -------------------------------------------
timeout 900 python -m catgrasp_tpu.pipelines.make_canonical \
  --class_name nut >> logs/canonical_r3.log 2>&1
note "canonical nut rc=$?"

# ---- 4. eval matrix: learned FIRST (the round-3 headline), then oracle ---
for c in nut screw hnm; do
  ART=artifacts_tracked/$c
  [ -d $ART/seg ] || { note "learned $c SKIP (no artifacts)"; continue; }
  timeout 6000 python scripts/eval_matrix.py --class_name $c --oracle 0 \
    --artifacts $ART --seeds 0 1 2 > logs/evalm_learned_$c.log 2>&1
  note "learned $c rc=$?"
done
for c in nut screw hnm; do
  timeout 4500 python scripts/eval_matrix.py --class_name $c --oracle 1 \
    --seeds 0 1 2 > logs/evalm_oracle_$c.log 2>&1
  note "oracle $c rc=$?"
done

# ---- 5. fused-rollout TPU trial (fresh process; may wedge -> bounded) ----
timeout 900 python scripts/fused_tpu_trial.py > logs/fused_tpu_trial.log 2>&1
note "fused trial rc=$?"

note "ALL_R3B_DONE"
