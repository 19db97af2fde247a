#!/bin/bash
# Round-5 stage-4 chain: repair the one affordance instance the r5 chain
# lost to a tunnel stall (nut/5 rc=124, still TRY_GRASP_VERSION=2 — it made
# test_affordance_provenance FAIL and the nut canonical carry v2), rebuild
# the nut canonical, re-earn the nut matrix cells on it, regenerate
# RESULTS.md (results_table is last-row-per-cell, so the re-run rows
# supersede), and commit grasp-DB score-drift probes under v3 physics.
# Gates on the r5c chain pid.  Wipe-hardened: every stage commits.
set -u
cd /root/repo
note() { echo "$(date +%H:%M:%S) $1" >> logs/r5d_chain.log; }
gcommit() { # msg file...
  local msg=$1; shift
  local rc
  flock /tmp/catgrasp_git.lock bash -c '
    cd /root/repo || exit 1
    msg=$1; shift
    git add -- "$@" && git commit -m "$msg

No-Verification-Needed: generated data / eval evidence only, no source change" -- "$@"
  ' gcommit "$msg" "$@"
  rc=$?
  [ $rc -ne 0 ] && note "gcommit FAILED rc=$rc: $msg"
}

while [ -f /tmp/r5c_chain.pid ] && kill -0 "$(cat /tmp/r5c_chain.pid)" 2>/dev/null; do
  sleep 60
done
note "=== r5d chain start (r5c chain done) ==="

stamped_nut5() {
  python - <<'EOF'
import sys
import numpy as np
try:
    d = np.load("dataset/affordance/nut_train_5_affordance.npz")
    sys.exit(0 if int(d.get("try_grasp_version", -1)) >= 3 else 1)
except Exception:
    sys.exit(1)
EOF
}

# ---- stage A: regenerate affordance nut/5 (2 retries, longer bound) ------
for attempt in 1 2; do
  stamped_nut5 && break
  timeout 2400 python -m catgrasp_tpu.pipelines.generate_affordance \
    --class_name nut --index 5 \
    --grasp_db dataset/grasps/nut_train_5_complete_grasp.npz \
    >> logs/aff_r5.log 2>&1
  note "affordance nut/5 attempt $attempt rc=$?"
done
if stamped_nut5; then
  gcommit "r5: affordance nut/5 regenerated under TRY_GRASP_VERSION=3 (tunnel-stall retry)" \
    dataset/affordance/nut_train_5_affordance.npz logs/aff_r5.log \
    logs/r5d_chain.log
else
  note "FATAL: nut/5 still stale after retries"
fi

# ---- stage B: rebuild nut canonical from fully-v3 labels ------------------
if stamped_nut5 && [ ! -f logs/canonical_r5d_nut.done ]; then
  timeout 1800 python -m catgrasp_tpu.pipelines.make_canonical \
    --class_name nut >> logs/canonical_r5.log 2>&1 \
    && touch logs/canonical_r5d_nut.done
  note "canonical nut rebuild rc=$?"
  gcommit "r5: nut canonical rebuilt (all 12 instances at v3)" \
    dataset/nut_canonical.npz logs/canonical_r5.log \
    logs/canonical_r5d_nut.done logs/r5d_chain.log
fi

# ---- stage C: re-earn the nut matrix cells on the repaired canonical ------
if [ -f logs/canonical_r5d_nut.done ]; then
  for mode in oracle learned; do
    [ -f logs/evalm_r5d_${mode}_nut.done ] && continue
    if [ "$mode" = oracle ]; then extra="--oracle 1";
    else extra="--oracle 0 --artifacts artifacts_tracked/nut"; fi
    timeout 9000 python -u scripts/eval_matrix.py --class_name nut $extra \
      --seeds 0 1 2 --out logs/eval_matrix_r5.jsonl \
      > logs/evalm_r5d_${mode}_nut.log 2>&1 \
      && touch logs/evalm_r5d_${mode}_nut.done
    note "$mode nut rerun rc=$?"
    gcommit "r5 eval matrix: $mode nut re-run on the fully-v3 canonical" \
      logs/eval_matrix_r5.jsonl logs/evalm_r5d_${mode}_nut.log \
      logs/evalm_r5d_${mode}_nut.done logs/r5d_chain.log
  done
fi

# ---- stage D: RESULTS.md regen (last row per cell wins) -------------------
if [ -f logs/evalm_r5d_learned_nut.done ] && [ ! -f logs/results_r5d.done ]; then
  python scripts/results_table.py logs/eval_matrix_r5.jsonl \
    > /tmp/r5d_table.md 2>> logs/r5d_chain.log
  python - <<'EOF'
table = open("/tmp/r5d_table.md").read()
import datetime
stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d %H:%MZ")
body = f"""# Closed-loop results (r5 matrix, at-HEAD physics)

Protocol: `run_grasp_simulation` tallies (reference
`run_grasp_simulation.py:719`) — objects / attempts / stable grasps / task
successes per seed; 2 rounds x 8 objects per cell; place-fallback ladder ON
(default since r5, see MIGRATION.md).  Physics: r5 engine (latched
per-finger close, motor-backed grip friction, exact tangential mass,
split-impulse Baumgarte) — every row was measured at the same HEAD physics
as the committed green suite.  Affordance labels: TRY_GRASP_VERSION=3 for
all 29 instances; canonicals rebuilt from them (nut re-run after the
nut/5 tunnel-stall repair, scripts/r5d_chain.sh).  Generated {stamp} from
logs/eval_matrix_r5.jsonl (last row per cell wins).

{table}

Historical matrices: r4 in `logs/eval_matrix_r4.jsonl` (pre-r5 physics),
r4c/r4d fallback-ladder measurements in `logs/eval_matrix_r4c.jsonl`.
"""
open("RESULTS.md", "w").write(body)
EOF
  touch logs/results_r5d.done
  gcommit "r5: RESULTS.md regenerated (nut cells superseded by v3-canonical re-run)" \
    RESULTS.md logs/results_r5d.done logs/r5d_chain.log
fi

# ---- stage E: grasp-DB score-drift probes under v3 physics ----------------
for db in nut_train_0 screw_train_0 hnm_train_0; do
  [ -f logs/db_drift_${db}.done ] && continue
  timeout 1800 python -u scripts/rescore_grasp_db.py \
    --db dataset/grasps/${db}_complete_grasp.npz \
    --n 256 --trials 50 --noise_floor --out logs/db_drift.jsonl \
    >> logs/db_drift_probe.log 2>&1 && touch logs/db_drift_${db}.done
  note "db drift $db rc=$?"
done
gcommit "r5: grasp-DB v2-score drift probes under v3 physics (3 classes)" \
  logs/db_drift.jsonl logs/db_drift_probe.log logs/db_drift_*.done \
  logs/r5d_chain.log

note "=== r5d chain done ==="
