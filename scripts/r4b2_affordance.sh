#!/bin/bash
# Stage B of the r4b chain, wipe-hardened: affordance regeneration with
# try_grasp_version stamps, committing PER INSTANCE so a session wipe can
# never lose a finished instance (the original stage committed only at the
# end).  nut first (nut/1 is the un-repaired rc=1 suspect from r3, VERDICT
# r3 #8), then screw/hnm; nut canonical rebuilt after the nut instances.
set -u
cd /root/repo
note() { echo "$(date +%H:%M:%S) $1" >> logs/r4b_chain.log; }
gcommit() { # msg file...
  local msg=$1; shift
  local rc
  flock /tmp/catgrasp_git.lock bash -c '
    cd /root/repo || exit 1
    msg=$1; shift
    git add -- "$@" && git commit -m "$msg

No-Verification-Needed: regenerated affordance data artifacts only" -- "$@"
  ' gcommit "$msg" "$@"
  rc=$?
  [ $rc -ne 0 ] && note "gcommit FAILED rc=$rc: $msg"
}
note "=== r4b2 affordance stage start ==="
stamped() { # class index -> rc 0 if already current
  python - "$1" "$2" <<'EOF'
import sys
import numpy as np
c, i = sys.argv[1], sys.argv[2]
try:
    d = np.load(f"dataset/affordance/{c}_train_{i}_affordance.npz")
    sys.exit(0 if int(d.get("try_grasp_version", -1)) >= 2 else 1)
except Exception:
    sys.exit(1)
EOF
}
for spec in nut:12 screw:9 hnm:8; do
  c=${spec%%:*}; n=${spec##*:}
  for i in $(seq 0 $((n - 1))); do
    stamped "$c" "$i" && continue
    timeout 900 python -m catgrasp_tpu.pipelines.generate_affordance \
      --class_name $c --index $i \
      --grasp_db dataset/grasps/${c}_train_${i}_complete_grasp.npz \
      >> logs/aff_r4.log 2>&1
    rc=$?
    note "affordance $c/$i rc=$rc"
    if stamped "$c" "$i"; then
      gcommit "r4: affordance $c/$i regenerated (try_grasp_version stamp)" \
        dataset/affordance/${c}_train_${i}_affordance.npz logs/aff_r4.log \
        logs/r4b_chain.log
    fi
  done
  if [ "$c" = nut ]; then
    timeout 1200 python -m catgrasp_tpu.pipelines.make_canonical \
      --class_name nut >> logs/canonical_r4.log 2>&1 \
      && touch logs/canonical_r4.done
    note "canonical nut rc=$?"
    gcommit "r4: nut canonical rebuilt from stamped affordance labels" \
      dataset/nut_canonical.npz logs/canonical_r4.done logs/canonical_r4.log \
      logs/r4b_chain.log
  fi
done
note "R4B2_AFFORDANCE_DONE"
