#!/bin/bash
# Fresh oracle closed-loop tallies on the current code: 3 seeds nut +
# single seeds screw/hnm (per-category coverage). Appends one tally line
# per run to logs/oracle_tally_r2.log.
set -u
cd /root/repo
out=logs/oracle_tally_r2.log
for s in 0 1 2; do
  echo "=== nut seed $s ===" >> $out
  timeout 1200 python -m catgrasp_tpu.pipelines.run_grasp_simulation \
    --class_name nut --n_rounds 2 --n_objects 8 --oracle 1 --seed $s 2>/dev/null \
    | grep -E "num_objects=|attempt" | tail -20 >> $out
done
for c in screw hnm; do
  echo "=== $c seed 0 ===" >> $out
  timeout 1200 python -m catgrasp_tpu.pipelines.run_grasp_simulation \
    --class_name $c --n_rounds 1 --n_objects 4 --oracle 1 --seed 0 2>/dev/null \
    | grep -E "num_objects=|attempt" | tail -12 >> $out
done
echo DONE >> $out
