"""Multi-seed / multi-class closed-loop eval matrix (VERDICT r2 #4).

Runs ``simulate_grasp_rounds`` for several seeds IN ONE PROCESS so the
engine/renderer compiles amortize (a fresh process pays ~3 min of compile
per run; seeds 1+ reuse the jit cache).  Appends one JSON line per run to
``logs/eval_matrix_r3.jsonl`` and prints a table at the end.

    python scripts/eval_matrix.py --class_name nut --oracle 1 --seeds 0 1 2
    python scripts/eval_matrix.py --class_name nut --oracle 0 \
        --artifacts artifacts_tracked/nut --seeds 0 1 2
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--class_name", default="nut")
    ap.add_argument("--oracle", type=int, default=1)
    ap.add_argument("--artifacts", default=None)
    ap.add_argument("--canonical", default=None)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--n_rounds", type=int, default=2)
    ap.add_argument("--n_objects", type=int, default=8)
    ap.add_argument("--out", default="logs/eval_matrix_r3.jsonl")
    ap.add_argument("--variant", default=None,
                    help="tag appended to the mode field (e.g. 'placefb' "
                         "when run with CATGRASP_PLACE_FALLBACKS=1)")
    args = ap.parse_args()

    from catgrasp_tpu.config.loader import load_config
    from catgrasp_tpu.pipelines.run_grasp_simulation import simulate_grasp_rounds

    cfg_run = load_config("config_run.yml")
    canonical_path = args.canonical or f"dataset/{args.class_name}_canonical.npz"
    canonical = (dict(np.load(canonical_path))
                 if os.path.exists(canonical_path) else None)
    predicters = None
    if args.artifacts:
        from catgrasp_tpu.predict.artifacts import load_predicters
        predicters = load_predicters(args.artifacts, args.class_name)
        print(f"loaded predicters: {sorted(predicters)}")

    rows = []
    for seed in args.seeds:
        t0 = time.time()
        c = simulate_grasp_rounds(
            args.class_name, args.n_rounds, args.n_objects, cfg_run,
            oracle=bool(args.oracle), canonical=canonical,
            predicters=predicters, seed=seed,
            metrics_path=None, verbose=True)
        mode = "oracle" if args.oracle else "learned"
        if args.variant:
            mode = f"{mode}+{args.variant}"
        row = {"class": args.class_name, "mode": mode,
               "seed": seed, "num_objects": c.num_objects,
               "num_attempts": c.num_attempts,
               "num_stable_grasp": c.num_stable_grasp,
               "num_task_grasp_succ": c.num_task_grasp_succ,
               "wall_s": round(time.time() - t0, 1)}
        rows.append(row)
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    print(f"\n{args.class_name} {'oracle' if args.oracle else 'learned'}:")
    for r in rows:
        print(f"  seed {r['seed']}: {r['num_objects']} objects, "
              f"{r['num_attempts']} attempts, {r['num_stable_grasp']} picked, "
              f"{r['num_task_grasp_succ']} task-placed  ({r['wall_s']}s)")


if __name__ == "__main__":
    main()
