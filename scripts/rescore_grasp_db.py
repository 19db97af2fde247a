"""Re-score a grasp DB's perturbation scores under CURRENT physics.

The grasp-quality net trains on the DB ``scores`` field
(``data/labels.py:dense_clutter_grasp_labels`` -> ``data/packed.py``), so a
physics overhaul (TRY_GRASP_VERSION bump) leaves the training labels scored
by superseded physics even after the affordances are regenerated.  This tool
either QUANTIFIES that drift on a subsample (default) or rewrites the DB
with fresh scores (--write).

Drift probe:
    python scripts/rescore_grasp_db.py --db dataset/grasps/nut_train_0_complete_grasp.npz \
        --n 256 --trials 50 --out logs/db_drift.jsonl
Full re-score (poses unchanged, scores + score_version updated in place):
    python scripts/rescore_grasp_db.py --db ... --write

Interpretation caveat: scores are ``trials``-sample Monte Carlo estimates,
so even under IDENTICAL physics two independent seeds agree only up to
sampling noise (se ~= sqrt(p(1-p)/trials) ~= 0.07 at trials=50).  The probe
therefore also reports a same-physics reseed correlation as the noise floor
when --noise_floor is set.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def rescore(db_path, n=None, trials=50, seed=1234, score_chunk=256):
    from catgrasp_tpu.geom import primitives as prim
    from catgrasp_tpu.geom import csg as csglib
    from catgrasp_tpu.grasp.gripper import Gripper
    from catgrasp_tpu.sim import env_grasp as eg
    from catgrasp_tpu.sim.types import build_shape_lib

    d = dict(np.load(db_path, allow_pickle=True))
    cls = str(d["class_name"])
    split = str(d.get("split", "train"))
    index = int(d.get("index", re.search(r"_(\d+)_complete", db_path).group(1)))
    poses = np.asarray(d["grasp_poses"], np.float32)
    stored = np.asarray(d["scores"], np.float32)

    ids = np.arange(len(poses))
    if n is not None and n < len(poses):
        ids = np.random.default_rng(0).choice(len(poses), n, replace=False)
    sel = poses[ids]

    mesh = prim.make_instance(cls, split, index)
    csg = csglib.make_csg_instance(cls, split, index)
    lib = build_shape_lib([mesh], [csg], n_surf=64, seed=0)
    gripper = Gripper.default()

    key = jax.random.PRNGKey(seed)
    fresh = []
    t0 = time.perf_counter()
    for i in range(0, len(sel), score_chunk):
        key, sub = jax.random.split(key)
        s = eg.perturbation_scores(sub, lib, jnp.int32(0), jnp.float32(1.0),
                                   jnp.asarray(sel[i:i + score_chunk]),
                                   trials=trials, spec=gripper.spec)
        fresh.append(np.asarray(s))
    fresh = np.concatenate(fresh)
    return d, ids, stored[ids], fresh, time.perf_counter() - t0


def spearman_np(a, b):
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean(); rb -= rb.mean()
    den = np.sqrt((ra * ra).sum() * (rb * rb).sum())
    return float((ra * rb).sum() / den) if den > 0 else 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", required=True, nargs="+",
                    help="one or more DBs; same-shape instances share the "
                         "jit cache, so batching them in one process "
                         "amortizes the ~90s scorer compile")
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--trials", type=int, default=50)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--out", default="logs/db_drift.jsonl")
    ap.add_argument("--write", action="store_true",
                    help="re-score ALL poses and rewrite the DB in place "
                         "(adds score_version from env_semantic.TRY_GRASP_VERSION)")
    ap.add_argument("--rebalance", action="store_true",
                    help="with --write: also rebuild the sibling "
                         "*_balanced_grasp.npz (bin membership follows the "
                         "scores, pipelines/generate_grasp.balance_score_bins)")
    ap.add_argument("--noise_floor", action="store_true",
                    help="also re-score the subsample a second time with a "
                         "different seed: same-physics MC correlation")
    args = ap.parse_args()

    from catgrasp_tpu.sim.env_semantic import TRY_GRASP_VERSION

    n = None if args.write else args.n
    for db_path in args.db:
        run_one(args, db_path, n, TRY_GRASP_VERSION)


def run_one(args, db_path, n, TRY_GRASP_VERSION):
    d, ids, stored, fresh, dt = rescore(db_path, n=n, trials=args.trials,
                                        seed=args.seed)
    row = {
        "db": db_path, "n": int(len(ids)), "trials": args.trials,
        "score_version_new": int(TRY_GRASP_VERSION),
        "stored_mean": round(float(stored.mean()), 4),
        "fresh_mean": round(float(fresh.mean()), 4),
        "spearman": round(spearman_np(stored, fresh), 4),
        "pearson": round(float(np.corrcoef(stored, fresh)[0, 1]), 4),
        "mean_abs_diff": round(float(np.abs(stored - fresh).mean()), 4),
        "top_quartile_overlap": round(float(np.isin(
            np.argsort(fresh)[-len(fresh) // 4:],
            np.argsort(stored)[-len(stored) // 4:]).mean()), 4),
        "wall_s": round(dt, 1),
    }
    if args.noise_floor:
        _, _, _, fresh2, _ = rescore(db_path, n=n, trials=args.trials,
                                     seed=args.seed + 777)
        row["noise_floor_spearman"] = round(spearman_np(fresh, fresh2), 4)
        row["noise_floor_mean_abs_diff"] = round(
            float(np.abs(fresh - fresh2).mean()), 4)

    if args.write:
        d["scores"] = fresh.astype(np.float32)
        d["score_version"] = np.int32(TRY_GRASP_VERSION)
        tmp = db_path[:-len(".npz")] + ".tmp.npz"  # np.savez appends .npz
        np.savez_compressed(tmp, **d)
        os.replace(tmp, db_path)
        row["written"] = True
        if args.rebalance:
            from catgrasp_tpu.config.loader import load_config
            from catgrasp_tpu.pipelines.generate_grasp import balance_score_bins
            cfg = load_config("config_grasp.yml")
            bins = np.array(cfg["classes"])
            bal = balance_score_bins(d, bins,
                                     int(cfg.get("max_per_score_bin", 1000)))
            bal_path = db_path.replace("_complete_grasp", "_balanced_grasp")
            tmp_b = bal_path[:-len(".npz")] + ".tmp.npz"
            np.savez_compressed(tmp_b, **bal)
            os.replace(tmp_b, bal_path)
            row["rebalanced"] = os.path.basename(bal_path)
            row["n_balanced"] = int(len(bal["grasp_poses"]))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
