#!/bin/bash
# Regenerate/complete affordance labels under the captured-release task
# poses (nut labels predated the TASK_POSES change; hnm never generated).
cd /root/repo
for i in 0 1 2 3 4 5 6 7 8 9 10 11; do
  timeout 1800 python -m catgrasp_tpu.pipelines.generate_affordance \
    --class_name nut --index $i \
    --grasp_db dataset/grasps/nut_train_${i}_complete_grasp.npz \
    >> logs/aff_nut_r2b.log 2>&1
done
for i in 7 8; do
  timeout 1800 python -m catgrasp_tpu.pipelines.generate_affordance \
    --class_name screw --index $i \
    --grasp_db dataset/grasps/screw_train_${i}_complete_grasp.npz \
    >> logs/aff_screw_r2b.log 2>&1
done
for i in 0 1 2 3 4 5 6 7; do
  timeout 1800 python -m catgrasp_tpu.pipelines.generate_affordance \
    --class_name hnm --index $i \
    --grasp_db dataset/grasps/hnm_train_${i}_complete_grasp.npz \
    >> logs/aff_hnm_r2b.log 2>&1
done
echo ALL_AFFORDANCE_DONE >> logs/aff_hnm_r2b.log
