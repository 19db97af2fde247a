#!/bin/bash
# Round-4 evidence chain (VERDICT r3 #1): the eval matrices that round 3
# authored but never ran.  3-class x 3-seed LEARNED matrix first (the
# headline), then the arm-gated arbitrary-mesh demo, then the 3-class x
# 3-seed ORACLE matrix.  Weights are the committed r3b artifacts_tracked/;
# the code now carries the engagement/rebind fixes from the round-3 final
# snapshot plus the eval-startup compile fix (predict/artifacts.py
# eval_shape templates).  Each stage commits its result logs immediately so
# a session wipe cannot lose them.  Single TPU client: stages run alone.
set -u
cd /root/repo
note() { echo "$(date +%H:%M:%S) $1" >> logs/r4_chain.log; }
gcommit() { # msg file...
  local msg=$1; shift
  local rc
  flock /tmp/catgrasp_git.lock bash -c '
    cd /root/repo || exit 1
    msg=$1; shift
    git add -- "$@" && git commit -m "$msg

No-Verification-Needed: eval result logs only, no source change" -- "$@"
  ' gcommit "$msg" "$@"
  rc=$?
  [ $rc -ne 0 ] && note "gcommit FAILED rc=$rc: $msg"
}
note "=== r4 eval chain start ==="

# ---- learned eval matrix (the headline: r3b weights, all classes) -------
for c in nut screw hnm; do
  [ -f logs/evalm_r4_learned_$c.done ] && continue
  timeout 9000 python -u scripts/eval_matrix.py --class_name $c --oracle 0 \
    --artifacts artifacts_tracked/$c --seeds 0 1 2 \
    --out logs/eval_matrix_r4.jsonl > logs/evalm_r4_learned_$c.log 2>&1 \
    && touch logs/evalm_r4_learned_$c.done
  note "learned $c rc=$?"
  gcommit "r4 eval matrix: learned $c seeds 0-2" \
    logs/eval_matrix_r4.jsonl logs/evalm_r4_learned_$c.log logs/r4_chain.log \
    logs/evalm_r4_learned_$c.done
done

# ---- arm-gated arbitrary-mesh demo (hold-gate ordering fix validation) ---
if [ ! -f logs/obj_demo_arm_nut.done ]; then
  timeout 5400 python -u -m catgrasp_tpu.pipelines.run_grasp_simulation \
    --class_name nut --obj_path assets/nut_demo.obj --n_rounds 1 \
    --n_objects 4 --seed 0 --canonical dataset/nut_canonical.npz --oracle 1 \
    > logs/obj_demo_arm_nut.log 2>&1 && touch logs/obj_demo_arm_nut.done
  note "obj_demo_arm nut rc=$?"
  gcommit "r4: arm-gated arbitrary-mesh (--obj_path) demo tally" \
    logs/obj_demo_arm_nut.log logs/r4_chain.log
fi

# ---- oracle eval matrix --------------------------------------------------
for c in nut screw hnm; do
  [ -f logs/evalm_r4_oracle_$c.done ] && continue
  timeout 7200 python -u scripts/eval_matrix.py --class_name $c --oracle 1 \
    --seeds 0 1 2 --out logs/eval_matrix_r4.jsonl \
    > logs/evalm_r4_oracle_$c.log 2>&1 \
    && touch logs/evalm_r4_oracle_$c.done
  note "oracle $c rc=$?"
  gcommit "r4 eval matrix: oracle $c seeds 0-2" \
    logs/eval_matrix_r4.jsonl logs/evalm_r4_oracle_$c.log logs/r4_chain.log \
    logs/evalm_r4_oracle_$c.done
done
note "ALL_R4_EVAL_CHAIN_DONE"
