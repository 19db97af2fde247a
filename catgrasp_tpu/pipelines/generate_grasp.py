"""Offline grasp database generation — the TPU ``generate_grasp.py``.

Per object instance (reference ``generate_grasp.py:81-122``):
  1. sample surface points on the mesh,
  2. cone-sample + augment grasp candidates (no IK / camera gates for the
     complete-space DB; collision only against the object itself),
  3. physics-score every surviving candidate: perturbation-robustness via
     (trials x rollout) vmapped simulation — the reference fans this across
     CPU processes (``:104-119``); here it is one device program, sharded
     over chips when a mesh is available,
  4. balance into score bins, ≤ max_per_bin each
     (``generate_grasp_one_object_balanced_score_from_complete_grasp``,
     ``:50-78``),
  5. save an .npz grasp DB (the ``*_complete_grasp.pkl`` /
     ``*_grasp_balanced_score.pkl`` analogs).
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config.loader import load_config
from ..core import transforms as tf
from ..geom import csg as csglib
from ..geom import primitives as prim
from ..grasp.gripper import Gripper
from ..grasp.sampler import PointConeGraspSampler, center_object_between_fingers
from ..sim import env_grasp as eg
from ..sim.types import build_shape_lib


def generate_complete_grasps(class_name: str, split: str, index: int,
                             gripper: Gripper, cfg: dict, seed: int = 0,
                             max_candidates: int = 4096,
                             score_chunk: int = 256,
                             trials: int | None = None,
                             obj_path: str | None = None):
    """Full pipeline for one object; returns dict (poses, scores, meta).

    ``obj_path``: an external watertight .obj (the reference's
    ``data/object_models/*.obj`` ingestion path, ``generate_grasp.py:127``);
    the engine then scores through the baked-grid-SDF narrowphase instead
    of the procedural CSG tree."""
    if obj_path:
        from ..geom.mesh import TriMesh
        mesh, csg, narrowphase = TriMesh.load_obj(obj_path), None, "grid"
    else:
        mesh = prim.make_instance(class_name, split, index)
        csg = csglib.make_csg_instance(class_name, split, index)
        narrowphase = "csg"
    rng = np.random.default_rng(seed)
    n_pts = int(cfg.get("n_surface_points_db", 200))
    points, normals = mesh.sample_surface(n_pts, rng, return_normals=True)

    key = jax.random.PRNGKey(seed)
    k_sample, k_score = jax.random.split(key)

    sampler = PointConeGraspSampler(
        gripper,
        max_num_samples=int(cfg.get("max_num_surface_points", 100)),
        n_sphere_dir=int(cfg.get("n_sphere_dir", 10)),
        approach_step=float(cfg.get("approach_step", 0.006)),
    )
    # complete-space: no camera/IK gates; collision vs object cloud only
    # (generate_grasp.py:97: background = a point at infinity)
    far = np.full((1, 3), 999.0, np.float32)
    poses, valid, stats = sampler.sample_grasps(
        k_sample, points, normals, background_cloud=far,
        background_mask=np.ones(1, bool), filter_ik=False,
        filter_approach=False,
    )
    poses = np.asarray(poses)[np.asarray(valid)]
    if len(poses) > max_candidates:
        poses = poses[rng.choice(len(poses), max_candidates, replace=False)]
    print(f"{class_name}/{split}/{index}: {len(poses)} collision-free candidates "
          f"(stats={jax.tree.map(int, stats)})")

    # --- physics scoring, chunked over grasps ------------------------------
    lib = build_shape_lib([mesh], [csg] if csg is not None else None,
                          n_surf=64, seed=seed,
                          bake_grids=narrowphase == "grid")
    trials = trials if trials is not None else int(cfg.get("perturbation_trials", 50))
    scores = []
    for i in range(0, len(poses), score_chunk):
        chunk = jnp.asarray(poses[i:i + score_chunk])
        k_score, sub = jax.random.split(k_score)
        s = eg.perturbation_scores(sub, lib, jnp.int32(0), jnp.float32(1.0),
                                   chunk, trials=trials, spec=gripper.spec,
                                   narrowphase=narrowphase)
        scores.append(np.asarray(s))
    scores = np.concatenate(scores) if scores else np.zeros(0, np.float32)
    return {
        "grasp_poses": poses.astype(np.float32),
        "scores": scores.astype(np.float32),
        "class_name": class_name,
        "split": split,
        "index": index,
    }


def balance_score_bins(db: dict, bins: np.ndarray, max_per_bin: int = 1000,
                       seed: int = 0) -> dict:
    """≤ max_per_bin grasps per score bin (``generate_grasp.py:50-78``)."""
    rng = np.random.default_rng(seed)
    which = np.digitize(db["scores"], bins) - 1
    keep = []
    for b in range(len(bins) - 1):
        ids = np.where(which == b)[0]
        if len(ids) > max_per_bin:
            ids = rng.choice(ids, max_per_bin, replace=False)
        keep.append(ids)
    keep = np.concatenate(keep) if keep else np.zeros(0, int)
    out = dict(db)
    out["grasp_poses"] = db["grasp_poses"][keep]
    out["scores"] = db["scores"][keep]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--class_name", default="nut")
    ap.add_argument("--split", default="train")
    ap.add_argument("--index", type=int, default=-1, help="-1 = all instances")
    ap.add_argument("--out_dir", default="dataset/grasps")
    ap.add_argument("--trials", type=int, default=None)
    ap.add_argument("--obj", default=None,
                    help="external watertight .obj instead of a procedural "
                         "instance (scored via grid-SDF narrowphase)")
    args = ap.parse_args()

    cfg = load_config("config_grasp.yml")
    gripper = Gripper.default()
    os.makedirs(args.out_dir, exist_ok=True)
    if args.obj:
        indices = [max(args.index, 0)]
    else:
        indices = (range(prim.num_instances(args.class_name, args.split))
                   if args.index < 0 else [args.index])
    bins = np.array(cfg["classes"])
    for i in indices:
        db = generate_complete_grasps(args.class_name, args.split, i, gripper, cfg,
                                      trials=args.trials, obj_path=args.obj)
        if args.obj:
            stem = os.path.splitext(os.path.basename(args.obj))[0]
            path = f"{args.out_dir}/{stem}_complete_grasp.npz"
        else:
            path = f"{args.out_dir}/{args.class_name}_{args.split}_{i}_complete_grasp.npz"
        np.savez_compressed(path, **db)
        bal = balance_score_bins(db, bins, int(cfg.get("max_per_score_bin", 1000)))
        np.savez_compressed(path.replace("_complete_", "_balanced_"), **bal)
        print(f"saved {path}: {len(db['scores'])} grasps, "
              f"score mean {db['scores'].mean() if len(db['scores']) else 0:.3f}")


if __name__ == "__main__":
    main()
