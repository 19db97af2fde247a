"""Auto-calibrate the seg MeanShift bandwidth from the net's offset noise.

The clustering bandwidth must track the CURRENT seg net's offset residual
(round 2 showed the reference's 0.007 oversegments 2-3x once our net's
noise floor is higher — logs/segdiag_bandwidth_sweep.log), so a hand-tuned
constant goes stale every time the net retrains.  This script measures the
within-instance spread of shifted points (xyz + predicted offset) against
ground-truth instances on val scenes and writes
``artifacts/<class>/seg/calib.json`` that ``predict.artifacts`` loads.

Formula: bandwidth = clip(0.9 x p50(residual), 0.006, 0.02) — chosen so the
round-2 nut net reproduces its sweep-validated 0.012 (see r3 logs).

    python scripts/calibrate_bandwidth.py --class_name nut
"""
import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # tiny job; keep the TPU free

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--class_name", default="nut")
    ap.add_argument("--artifacts", default=None)
    ap.add_argument("--val_dir", default=None)
    ap.add_argument("--n_scenes", type=int, default=6)
    ap.add_argument("--dry", action="store_true", help="print stats, don't write")
    args = ap.parse_args()

    art = args.artifacts or f"artifacts/{args.class_name}"
    val_dir = args.val_dir or f"dataset/{args.class_name}/val"
    from catgrasp_tpu.predict.artifacts import load_predicters

    pred = load_predicters(art, args.class_name, roles=("seg",)).get("seg")
    if pred is None:
        print(f"no seg checkpoint under {art}; nothing to calibrate")
        return
    files = sorted(glob.glob(f"{val_dir}/*.npz"))[: args.n_scenes]
    if not files:
        print(f"no val scenes under {val_dir}")
        return

    from catgrasp_tpu.data.labels import load_scene

    rng = np.random.default_rng(0)
    residuals = []
    for f in files:
        d = load_scene(f)
        seg = d["seg"].reshape(-1)
        xyz = d["xyz"].reshape(-1, 3)
        nrm = d["normal"].reshape(-1, 3)
        vm = seg >= 0
        if vm.sum() < 500:
            continue
        ids = np.where(vm)[0]
        ids = rng.choice(ids, min(len(ids), pred.n_pts), replace=False)
        x = jnp.asarray(xyz[ids])
        n = jnp.asarray(nrm[ids])
        origin = jnp.min(x, axis=0) - 0.01
        offsets, _ = jax.jit(pred.model.apply)({"params": pred.params}, x, n, origin)
        shifted = np.asarray(x + offsets)
        inst = seg[ids]
        for i in np.unique(inst):
            m = inst == i
            if m.sum() < 30:
                continue
            c = shifted[m].mean(0)
            residuals.append(np.linalg.norm(shifted[m] - c, axis=1))
    if not residuals:
        print("no instances found; aborting")
        return
    r = np.concatenate(residuals)
    stats = {f"p{p}": float(np.percentile(r, p)) for p in (50, 75, 90)}
    bandwidth = float(np.clip(0.9 * stats["p50"], 0.006, 0.02))
    print(f"{args.class_name}: residual stats {stats} -> bandwidth {bandwidth:.4f}")
    if not args.dry:
        out = {"bandwidth": round(bandwidth, 4), "stats": stats,
               "n_scenes": len(files), "formula": "clip(0.9*p50, 0.006, 0.02)"}
        with open(os.path.join(art, "seg", "calib.json"), "w") as fo:
            json.dump(out, fo, indent=1)
        print(f"wrote {art}/seg/calib.json")


if __name__ == "__main__":
    main()
