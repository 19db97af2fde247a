"""Physics self-parity harness (VERDICT r3 #9 / SURVEY §4 statistical parity).

The north star asks for "grasp-success parity" with the reference's PyBullet
protocol; with no PyBullet in this image the measurable stand-in is
SELF-consistency: the perturbation-score distribution
(``env_grasp.py:111-119`` protocol) must be stable under solver knobs that a
correct contact model should be insensitive to —

  * narrowphase: analytic CSG vs baked-grid SDF,
  * timestep:    1/240 s (PyBullet default) vs 1/480 s,
  * iterations:  4 vs 8 Jacobi sweeps.

Scores a fixed batch of side grasps spanning engagement depths on nut/0
under every config; writes one JSON line per config to
``logs/physics_selfparity.jsonl`` (tracked evidence) with the score vector
and the Kolmogorov–Smirnov distance to the baseline config.  A test
(``tests/test_selfparity.py``) asserts the committed KS bounds on a reduced
grid so regressions are caught in CI.

    python scripts/physics_selfparity.py --trials 50 --n_grasps 24
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def ks_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Two-sample Kolmogorov–Smirnov statistic (no scipy dependency)."""
    xs = np.sort(np.concatenate([a, b]))
    ca = np.searchsorted(np.sort(a), xs, side="right") / len(a)
    cb = np.searchsorted(np.sort(b), xs, side="right") / len(b)
    return float(np.max(np.abs(ca - cb)))


def grasp_batch(n_grasps: int, spec) -> np.ndarray:
    """Side grasps spanning engagement depth and in-plane angle — the same
    family the parity tests rank (deep > tip > air)."""
    gs = []
    for i in range(n_grasps):
        frac = 0.05 + 0.9 * (i % 8) / 7.0
        ang = 2 * np.pi * (i // 8) / max(1, n_grasps // 8)
        c, s = np.cos(ang), np.sin(ang)
        g = np.eye(4, dtype=np.float32)
        g[:3, :3] = np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
        g[:3, 3] = [-spec.finger_len * frac, 0.0, 0.0]
        gs.append(g)
    return np.stack(gs)


def run(trials: int, n_grasps: int, out: str | None):
    import jax
    import jax.numpy as jnp

    from catgrasp_tpu.geom import primitives as prim
    from catgrasp_tpu.geom.csg import make_csg_instance
    from catgrasp_tpu.sim.env_grasp import GripperSpec, perturbation_scores
    from catgrasp_tpu.sim.types import build_shape_lib

    spec = GripperSpec()
    lib = build_shape_lib([prim.make_instance("nut", "train", 0)],
                          [make_csg_instance("nut", "train", 0)],
                          n_surf=64, bake_grids=True)
    grasps = jnp.asarray(grasp_batch(n_grasps, spec))

    configs = [
        # (name, narrowphase, dt, n_iter) — first entry is the baseline
        ("csg_240_4", "csg", 1 / 240.0, 4),
        ("grid_240_4", "grid", 1 / 240.0, 4),
        ("csg_480_4", "csg", 1 / 480.0, 4),
        ("csg_240_8", "csg", 1 / 240.0, 8),
    ]
    rows, base = [], None
    for name, narrow, dt, n_iter in configs:
        s = np.asarray(perturbation_scores(
            jax.random.PRNGKey(7), lib, jnp.int32(0), jnp.float32(1.0),
            grasps, trials=trials, spec=spec, narrowphase=narrow,
            dt=dt, n_iter=n_iter))
        if base is None:
            base = s
        row = {"config": name, "narrowphase": narrow, "dt": round(dt, 6),
               "n_iter": n_iter, "trials": trials, "n_grasps": n_grasps,
               "scores": [round(float(x), 3) for x in s],
               "mean": round(float(s.mean()), 4),
               "ks_vs_baseline": round(ks_distance(base, s), 4),
               "max_abs_diff": round(float(np.max(np.abs(s - base))), 4)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    if out:
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        with open(out, "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=50)
    ap.add_argument("--n_grasps", type=int, default=24)
    ap.add_argument("--out", default="logs/physics_selfparity.jsonl")
    args = ap.parse_args()
    run(args.trials, args.n_grasps, args.out)


if __name__ == "__main__":
    main()
