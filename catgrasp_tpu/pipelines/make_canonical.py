"""Category-level NUNOCS canonical model — TPU ``make_canonical.py``.

``compute_canonical_model`` (reference ``make_canonical.py:39-164``):
  1. per training instance: surface cloud -> NUNOCS (per-axis bbox
     normalization to [0,1]),
  2. medoid instance by mutual chamfer distance,
  3. grasp codebook: all DB grasps with perturbation score >= threshold
     mapped into the NUNOCS frame (anisotropic similarity),
  4. affordance codebook: per-canonical-point affordance averaged across
     instances via nearest neighbor in NUNOCS space.

Output .npz is the ``{class}_canonical.pkl`` analog consumed by
``NocsTransferGraspSampler`` and ``compute_grasp_affordance``.
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from ..geom import primitives as prim


def to_nunocs_transform(points: np.ndarray) -> np.ndarray:
    """4x4 anisotropic similarity mapping object coords -> CENTERED NUNOCS
    [-0.5, 0.5]^3.  The canonical frame is centered so category symmetry
    transforms apply about the origin (the reference's ``target - 0.5``
    convention, ``loss.py:31``)."""
    lo = points.min(axis=0)
    hi = points.max(axis=0)
    ext = np.maximum(hi - lo, 1e-9)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.diag(1.0 / ext)
    T[:3, 3] = -lo / ext - 0.5
    return T


def mutual_chamfer(a: np.ndarray, b: np.ndarray) -> float:
    d2 = ((a[:, None] - b[None]) ** 2).sum(-1)
    return float(np.sqrt(d2.min(1)).mean() + np.sqrt(d2.min(0)).mean())


def compute_canonical(class_name: str, grasp_dbs: list[dict],
                      affordances: list[dict] | None = None,
                      n_pts: int = 1024, score_thresh: float = 0.8,
                      seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    n_inst = prim.num_instances(class_name, "train")
    clouds, tfs = [], []
    for i in range(n_inst):
        mesh = prim.make_instance(class_name, "train", i)
        pts = mesh.sample_surface(n_pts, rng)
        T = to_nunocs_transform(mesh.vertices)
        nocs = pts @ T[:3, :3].T + T[:3, 3]
        clouds.append(nocs.astype(np.float32))
        tfs.append(T)

    # medoid by mutual chamfer (make_canonical.py:78-95)
    sub = [c[rng.choice(len(c), min(256, len(c)), replace=False)] for c in clouds]
    D = np.zeros((n_inst, n_inst))
    for i in range(n_inst):
        for j in range(i + 1, n_inst):
            D[i, j] = D[j, i] = mutual_chamfer(sub[i], sub[j])
    medoid = int(D.sum(1).argmin())

    # grasp codebook (make_canonical.py:103-126)
    canon_grasps, canon_scores = [], []
    for i, db in enumerate(grasp_dbs):
        if db is None:
            continue
        keep = db["scores"] >= score_thresh
        g = db["grasp_poses"][keep].copy()
        T = tfs[int(db.get("index", i))]
        g = np.einsum("ij,njk->nik", T, g)
        canon_grasps.append(g)
        canon_scores.append(db["scores"][keep])
    canon_grasps = (np.concatenate(canon_grasps) if canon_grasps
                    else np.zeros((0, 4, 4), np.float32))
    canon_scores = (np.concatenate(canon_scores) if canon_scores
                    else np.zeros((0,), np.float32))

    # affordance codebook (make_canonical.py:129-144)
    canon_cloud = clouds[medoid]
    canon_aff = np.zeros(len(canon_cloud), np.float32)
    if affordances:
        acc = np.zeros(len(canon_cloud))
        cnt = np.zeros(len(canon_cloud))
        for a in affordances:
            if a is None:
                continue
            idx = int(a.get("index", 0))
            T = tfs[idx]
            pts_nocs = a["points"] @ T[:3, :3].T + T[:3, 3]
            d2 = ((canon_cloud[:, None] - pts_nocs[None]) ** 2).sum(-1)
            nn = d2.argmin(1)
            ok = d2[np.arange(len(canon_cloud)), nn] < 0.05 ** 2
            acc[ok] += a["affordance"][nn[ok]]
            cnt[ok] += 1
        canon_aff = (acc / np.maximum(cnt, 1)).astype(np.float32)

    return {
        "canonical_cloud": canon_cloud,
        "canonical_affordance": canon_aff,
        "canonical_grasps": canon_grasps.astype(np.float32),
        "canonical_grasp_scores": canon_scores.astype(np.float32),
        "transforms_to_nocs": np.stack(tfs),
        "medoid_index": medoid,
        "class_name": class_name,
        # provenance: oldest try_grasp semantics among the affordance inputs
        # (files predating the stamp count as version 2 — every committed
        # label postdates the drift-faithful rewrite, see env_semantic)
        "affordance_version": np.int32(min(
            (int(a.get("try_grasp_version", 2)) for a in (affordances or [])
             if a is not None), default=0)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--class_name", default="nut")
    ap.add_argument("--grasp_dir", default="dataset/grasps")
    ap.add_argument("--affordance_dir", default="dataset/affordance")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    n = prim.num_instances(args.class_name, "train")
    dbs, affs = [], []
    for i in range(n):
        p = f"{args.grasp_dir}/{args.class_name}_train_{i}_complete_grasp.npz"
        dbs.append(dict(np.load(p)) if os.path.exists(p) else None)
        p = f"{args.affordance_dir}/{args.class_name}_train_{i}_affordance.npz"
        affs.append(dict(np.load(p)) if os.path.exists(p) else None)
    out = compute_canonical(args.class_name, dbs, affs)
    path = args.out or f"dataset/{args.class_name}_canonical.npz"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"saved {path}: {len(out['canonical_grasps'])} codebook grasps, "
          f"medoid instance {out['medoid_index']}")


if __name__ == "__main__":
    main()
