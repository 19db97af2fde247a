#!/usr/bin/env python
"""Headline benchmark: batched pile-drop env steps/second on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md north star): >= 10,000 env steps/sec on TPU — the
reference steps one PyBullet world per CPU process at O(1k) steps/sec.

An env step here is one full physics step of one scene (10 bodies, SDF
narrowphase + 4 Jacobi impulse iterations), matching the unit of
``p.stepSimulation()`` in the reference hot loop
(``env.py:299-344``, ``env_grasp.py:94-99``).
"""
import json
import time

import jax
import jax.numpy as jnp

from catgrasp_tpu.geom import primitives as prim
from catgrasp_tpu.sim import engine, env_pile
from catgrasp_tpu.sim.types import build_shape_lib

BASELINE_STEPS_PER_SEC = 10_000.0


def main():
    batch = 1024
    steps_per_call = 50
    cfg = env_pile.PileConfig(max_bodies=10)

    from catgrasp_tpu.geom.csg import make_csg_instance

    specs = [("nut", 0), ("screw", 0), ("hnm", 0), ("nut", 3)]
    meshes = [prim.make_instance(c, "train", i) for c, i in specs]
    csgs = [make_csg_instance(c, "train", i) for c, i in specs]
    lib = build_shape_lib(meshes, csgs, n_surf=32)

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, batch)
    env = engine.StaticEnv.open_bin(cfg.bin_inner)
    states, params = jax.vmap(lambda k: env_pile.reset(k, lib, cfg))(keys)

    @jax.jit
    def run(st):
        return jax.vmap(lambda s, p: engine.rollout(s, p, lib, env, steps_per_call, dt=cfg.dt))(st, params)

    # warmup / compile
    states = run(states)
    jax.block_until_ready(states)

    n_calls = 4
    t0 = time.perf_counter()
    for _ in range(n_calls):
        states = run(states)
    jax.block_until_ready(states)
    # force a real device->host readback: on tunneled/async PJRT runtimes
    # block_until_ready can return before execution finishes, which would
    # inflate the number
    float(jnp.sum(states.pos))
    dt_wall = time.perf_counter() - t0

    env_steps = batch * steps_per_call * n_calls
    sps = env_steps / dt_wall
    print(json.dumps({
        "metric": "pile_env_steps_per_sec",
        "value": round(sps, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(sps / BASELINE_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
