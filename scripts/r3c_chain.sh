#!/bin/bash
# Round-3c chain: the r3b stages that never ran (VM wiped mid-chain).
# Weights are the committed r3b artifacts_tracked/<class>; this chain only
# EVALUATES: 3-class x 3-seed learned matrix -> arm-gated obj_path demo ->
# 3-class x 3-seed oracle matrix.  Each stage commits its result logs so a
# session wipe cannot lose them.  Single TPU client: stages run alone.
set -u
cd /root/repo
note() { echo "$(date +%H:%M:%S) $1" >> logs/r3c_chain.log; }
gcommit() { # msg file...
  local msg=$1; shift
  flock /tmp/catgrasp_git.lock bash -c \
    "cd /root/repo && git add $* && git commit -m \"$msg

No-Verification-Needed: eval result logs only, no source change\" || true"
}
note "=== r3c chain start ==="

# ---- learned eval matrix (the headline: r3b weights, all classes) -------
for c in nut screw hnm; do
  [ -f logs/evalm_r3b_learned_$c.done ] && continue
  timeout 6600 python scripts/eval_matrix.py --class_name $c --oracle 0 \
    --artifacts artifacts_tracked/$c --seeds 0 1 2 \
    --out logs/eval_matrix_r3b.jsonl > logs/evalm_r3b_learned_$c.log 2>&1 \
    && touch logs/evalm_r3b_learned_$c.done
  note "learned $c rc=$?"
  gcommit "r3b eval matrix: learned $c seeds 0-2" \
    logs/eval_matrix_r3b.jsonl logs/evalm_r3b_learned_$c.log logs/r3c_chain.log
done

# ---- arm-gated arbitrary-mesh demo (hold-gate ordering fix validation) ---
if [ ! -f logs/obj_demo_arm_nut.done ]; then
  timeout 3600 python -m catgrasp_tpu.pipelines.run_grasp_simulation \
    --class_name nut --obj_path assets/nut_demo.obj --n_rounds 1 \
    --n_objects 4 --seed 0 --canonical dataset/nut_canonical.npz --oracle 1 \
    > logs/obj_demo_arm_nut.log 2>&1 && touch logs/obj_demo_arm_nut.done
  note "obj_demo_arm nut rc=$?"
  gcommit "Arm-gated arbitrary-mesh (--obj_path) demo tally" \
    logs/obj_demo_arm_nut.log logs/r3c_chain.log
fi

# ---- oracle eval matrix --------------------------------------------------
for c in nut screw hnm; do
  [ -f logs/evalm_r3b_oracle_$c.done ] && continue
  timeout 5400 python scripts/eval_matrix.py --class_name $c --oracle 1 \
    --seeds 0 1 2 --out logs/eval_matrix_r3b.jsonl \
    > logs/evalm_r3b_oracle_$c.log 2>&1 \
    && touch logs/evalm_r3b_oracle_$c.done
  note "oracle $c rc=$?"
  gcommit "r3b eval matrix: oracle $c seeds 0-2" \
    logs/eval_matrix_r3b.jsonl logs/evalm_r3b_oracle_$c.log logs/r3c_chain.log
done
note "ALL_R3C_CHAIN_DONE"
