#!/bin/bash
# Round-5 stage-3 chain: on-chip validation of the r5 kernel changes
# (render step-cap removal + winning-body normals, fused split-impulse
# mirror), then the end-of-round discipline items (VERDICT r4 #10):
# full test suite at HEAD with a committed log, full bench.  Gates on the
# r5b chain pid.  Wipe-hardened: every stage commits its own outputs.
set -u
cd /root/repo
note() { echo "$(date +%H:%M:%S) $1" >> logs/r5c_chain.log; }
gcommit() { # msg file...
  local msg=$1; shift
  local rc
  flock /tmp/catgrasp_git.lock bash -c '
    cd /root/repo || exit 1
    msg=$1; shift
    git add -- "$@" && git commit -m "$msg

No-Verification-Needed: on-chip trial / suite evidence logs only, no source change" -- "$@"
  ' gcommit "$msg" "$@"
  rc=$?
  [ $rc -ne 0 ] && note "gcommit FAILED rc=$rc: $msg"
}

# gate: wait for the r5b chain to finish (poll its pid)
while [ -f /tmp/r5b_chain.pid ] && kill -0 "$(cat /tmp/r5b_chain.pid)" 2>/dev/null; do
  sleep 60
done
note "=== r5c chain start (r5b chain done) ==="

# ---- stage A: fused-kernel on-chip trial (split-impulse mirror) ----------
if [ ! -f logs/fused_trial_r5.done ]; then
  timeout 1800 python -u scripts/fused_tpu_trial.py \
    > logs/fused_trial_r5.json 2> logs/fused_trial_r5.err \
    && touch logs/fused_trial_r5.done
  note "fused trial rc=$? $(tail -c 300 logs/fused_trial_r5.json)"
  gcommit "r5: fused split-impulse kernel on-chip trial" \
    logs/fused_trial_r5.json logs/fused_trial_r5.err \
    logs/r5c_chain.log
fi

# ---- stage B: render kernel on-chip trial (uncapped march + win-normals) -
if [ ! -f logs/render_trial_r5.done ]; then
  timeout 1800 python -u scripts/render_tpu_trial.py \
    > logs/render_trial_r5.json 2> logs/render_trial_r5.err \
    && touch logs/render_trial_r5.done
  note "render trial rc=$? $(tail -c 400 logs/render_trial_r5.json)"
  gcommit "r5: render kernel on-chip trial (uncapped march, win-body normals)" \
    logs/render_trial_r5.json logs/render_trial_r5.err \
    logs/r5c_chain.log
fi

# ---- stage C: full bench on the chip --------------------------------------
if [ ! -f logs/bench_r5.done ]; then
  timeout 2400 python -u bench.py > logs/bench_r5.json 2> logs/bench_r5.err \
    && touch logs/bench_r5.done
  note "bench rc=$? $(tail -c 400 logs/bench_r5.json)"
  gcommit "r5: full bench at HEAD" \
    logs/bench_r5.json logs/bench_r5.err logs/r5c_chain.log
fi

# ---- stage D: full test suite at HEAD, committed log (VERDICT r4 #10) ----
if [ ! -f logs/pytest_r5.done ]; then
  timeout 5400 python -m pytest tests/ -q > logs/pytest_r5.log 2>&1
  rc=$?
  note "pytest rc=$rc: $(tail -1 logs/pytest_r5.log)"
  [ $rc -eq 0 ] && touch logs/pytest_r5.done
  gcommit "r5: full test suite at HEAD ($(tail -1 logs/pytest_r5.log | tr -d '\n' | cut -c1-60))" \
    logs/pytest_r5.log logs/r5c_chain.log
fi

note "=== r5c chain done ==="
