#!/usr/bin/env python
"""Headline benchmarks on one TPU chip.  Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline", "extra": {...}}.

Primary (BASELINE.md north star #1): batched pile-drop env steps/second,
target >= 10,000 — the reference steps one PyBullet world per CPU process at
O(1k) steps/sec.  An env step is one full physics step of one scene
(10 bodies, SDF narrowphase + 4 Jacobi impulse iterations), the unit of
``p.stepSimulation()`` in the reference hot loop (``env.py:299-344``).

extra.grasp_collision_checks_per_sec (north star #2, target >= 1M): grasp
SDF collision-gate checks/second through the fused Pallas kernel
(`ops/collision.py`).  One check = one (pose x lateral-offset) gripper-vs-
scene-cloud query, the unit of the reference's per-offset FCL query in
``adjust_collision_pose`` (``my_cpp/common.cpp:253-287``), on a 2048-point
scene cloud.

extra.ik_gate_poses_per_sec: IK-feasibility gate throughput (branch-free
S-R-S gate, `kin/iiwa.py:ik_feasible`), the reference's per-pose ikfast call
inside ``filterGraspPose`` (``common.cpp:214-226``).
"""
import json
import os
import time

import jax
import jax.numpy as jnp

from catgrasp_tpu.geom import primitives as prim
from catgrasp_tpu.sim import engine, env_pile
from catgrasp_tpu.sim.types import build_shape_lib

BASELINE_STEPS_PER_SEC = 10_000.0
BASELINE_CHECKS_PER_SEC = 1_000_000.0


def _readback(x):
    # force a real device->host readback: on tunneled/async PJRT runtimes
    # block_until_ready can return before execution finishes, which would
    # inflate the number
    return float(jnp.sum(x))


def bench_env_steps():
    batch = 1024
    steps_per_call = 50
    cfg = env_pile.PileConfig(max_bodies=10)

    from catgrasp_tpu.geom.csg import make_csg_instance

    specs = [("nut", 0), ("screw", 0), ("hnm", 0), ("nut", 3)]
    meshes = [prim.make_instance(c, "train", i) for c, i in specs]
    csgs = [make_csg_instance(c, "train", i) for c, i in specs]
    lib = build_shape_lib(meshes, csgs, n_surf=32)

    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    env = engine.StaticEnv.open_bin(cfg.bin_inner)
    states, params = jax.vmap(lambda k: env_pile.reset(k, lib, cfg))(keys)

    import os
    fused_default = "1" if jax.default_backend() == "tpu" else "0"
    runs = []
    if os.environ.get("CATGRASP_BENCH_FUSED", fused_default) == "1":
        # fused Pallas rollout (ops/fused_rollout.py): whole step pipeline
        # VMEM-resident.  Default on TPU since the on-chip trial passed
        # (logs/fused_trial.json: 220k fused vs 44k unfused steps/s, 5.0x);
        # CPU keeps the XLA engine (interpret-mode Pallas is not a bench).
        from catgrasp_tpu.ops.fused_rollout import rollout_fused

        @jax.jit
        def run_fused(st):
            return rollout_fused(st, params, lib, env, steps_per_call, dt=cfg.dt)

        runs.append(run_fused)

    @jax.jit
    def run_xla(st):
        return jax.vmap(lambda s, p: engine.rollout(
            s, p, lib, env, steps_per_call, dt=cfg.dt))(st, params)

    runs.append(run_xla)

    run = None
    last_err = None
    for cand in runs:  # ladder: fused kernel first, XLA engine fallback
        try:
            states = cand(states)
            jax.block_until_ready(states)
            run = cand
            break
        except Exception as e:  # noqa: BLE001 — Mosaic compile/VMEM risk
            last_err = e
    if run is None:
        raise last_err
    _readback(states.pos)

    n_calls = 4
    t0 = time.perf_counter()
    for _ in range(n_calls):
        states = run(states)
    jax.block_until_ready(states)
    _readback(states.pos)
    dt_wall = time.perf_counter() - t0
    return batch * steps_per_call * n_calls / dt_wall


def bench_collision_gate():
    from catgrasp_tpu.grasp.filter import _static_open_boxes, ADJUST_OFFSETS
    from catgrasp_tpu.ops import collision as pc
    from catgrasp_tpu.sim.env_grasp import GripperSpec

    spec = GripperSpec()
    boxes = _static_open_boxes(spec)
    offsets = tuple(float(o) for o in ADJUST_OFFSETS)
    P, C = 131072, 2048
    key = jax.random.PRNGKey(1)
    t_inv = jnp.tile(jnp.eye(4), (P, 1, 1)).at[:, :3, 3].set(
        jax.random.uniform(key, (P, 3), minval=-0.2, maxval=0.2))
    cloud = jax.random.uniform(jax.random.PRNGKey(2), (C, 3),
                               minval=-0.15, maxval=0.15)
    mask = jnp.ones((C,), bool)

    run = jax.jit(lambda t: pc.box_hits(t, cloud, mask, boxes, offsets, 0.0))
    hits = run(t_inv)
    _readback(hits)
    n_calls = 8
    t0 = time.perf_counter()
    for _ in range(n_calls):
        hits = run(t_inv)
    _readback(hits)
    dt_wall = time.perf_counter() - t0
    return P * len(offsets) * n_calls / dt_wall


def bench_render():
    """Labeled-frame renderer throughput at the eval-protocol resolution.

    One frame = the full label stack (depth/seg/NUNOCS/normal/xyz) of one
    settled 10-body pile at 384x512 — the unit of work of the reference's
    per-scene pyrender offscreen pass + label projection
    (``pybullet_env/camera.py:35-45``, ``generate_data.py``).
    """
    from catgrasp_tpu.geom.csg import make_csg_instance
    from catgrasp_tpu.render import raymarch

    B, H, W = 8, 384, 512
    cfg = env_pile.PileConfig(max_bodies=10)
    specs = [("nut", 0), ("screw", 0), ("hnm", 0)]
    meshes = [prim.make_instance(c, "train", i) for c, i in specs]
    csgs = [make_csg_instance(c, "train", i) for c, i in specs]
    lib = build_shape_lib(meshes, csgs, n_surf=32)
    env = engine.StaticEnv.open_bin(cfg.bin_inner)
    keys = jax.random.split(jax.random.PRNGKey(4), B)
    states, params = jax.vmap(lambda k: env_pile.reset(k, lib, cfg))(keys)

    fx = 2257.75 * (W / 2064.0)
    K = jnp.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1.0]])
    cam = jnp.eye(4).at[:3, :3].set(
        jnp.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])).at[2, 3].set(0.7)

    # config ladder: since the r4 kernel-internal batch chunking, full-vmap
    # batch-8 Pallas no longer OOMs and is the fastest config by far
    # (19.7 fps vs 1.2 chunked / 6.5 xla, logs/render_trial_r4.json) — try
    # it first; lax.map scene chunking and plain XLA remain the fallbacks.
    # CATGRASP_BENCH_RENDER_MODE=pallas0|pallas2|pallas1|xla pins one
    # config; default tries the ladder and falls back.
    modes = {"pallas0": ("1", None), "pallas2": ("1", 2), "pallas1": ("1", 1),
             "xla": ("0", None)}
    pin = os.environ.get("CATGRASP_BENCH_RENDER_MODE")
    ladder = ([modes[pin]] if pin
              else [modes["pallas0"], modes["pallas2"], modes["xla"]])
    last_err = None
    for flag, chunk in ladder:
        try:
            os.environ["CATGRASP_PALLAS_RENDER"] = flag
            run = jax.jit(lambda st, p: raymarch.render_batch(
                lib, st, p, K, cam, H, W, env=env, scene_chunk=chunk))
            out = run(states, params)
            jax.block_until_ready(out)
            _readback(out["depth"])
            n_calls = 8
            t0 = time.perf_counter()
            for _ in range(n_calls):
                out = run(states, params)
            _readback(out["depth"])
            dt_wall = time.perf_counter() - t0
            return B * n_calls / dt_wall
        except Exception as e:  # noqa: BLE001 — fall down the ladder
            last_err = e
    raise last_err


def bench_ik_gate():
    from catgrasp_tpu.kin import iiwa

    B = 65536
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    T = jnp.tile(jnp.eye(4), (B, 1, 1))
    T = T.at[:, :3, 3].set(jax.random.uniform(k1, (B, 3), minval=-0.8, maxval=0.8))
    ax = jax.random.normal(k2, (B, 3))
    ax = ax / jnp.linalg.norm(ax, axis=1, keepdims=True)
    from catgrasp_tpu.core import transforms as tf
    ang = jax.random.uniform(key, (B,), maxval=3.1)
    R = jax.vmap(tf.axis_angle_to_matrix)(ax, ang)
    T = T.at[:, :3, :3].set(R)

    run = jax.jit(lambda t: iiwa.ik_feasible(t))
    ok = run(T)
    _readback(ok)
    n_calls = 8
    t0 = time.perf_counter()
    for _ in range(n_calls):
        ok = run(T)
    _readback(ok)
    dt_wall = time.perf_counter() - t0
    return B * n_calls / dt_wall


def main():
    sps = bench_env_steps()
    cps = bench_collision_gate()
    ips = bench_ik_gate()
    rps = bench_render()
    print(json.dumps({
        "metric": "pile_env_steps_per_sec",
        "value": round(sps, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(sps / BASELINE_STEPS_PER_SEC, 3),
        "extra": {
            "grasp_collision_checks_per_sec": round(cps, 1),
            "grasp_collision_vs_baseline": round(cps / BASELINE_CHECKS_PER_SEC, 3),
            "ik_gate_poses_per_sec": round(ips, 1),
            "labeled_render_frames_per_sec": round(rps, 1),
        },
    }))


if __name__ == "__main__":
    main()
