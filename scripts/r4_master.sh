#!/bin/bash
# Round-4 master runner: finish the eval matrices (oracle screw/hnm are the
# only stages left), then the r4b improvement chain (kernel/parity evidence
# first, then wide data + warm-started training + spot eval + affordance
# stamps).  Both chains are idempotent (.done markers / stamped outputs) and
# commit evidence stage-by-stage, so a session wipe resumes cleanly.
set -u
cd /root/repo
bash scripts/r4_eval_chain.sh
bash scripts/r4b_chain.sh
echo "$(date +%H:%M:%S) R4_MASTER_DONE" >> logs/r4_chain.log
