"""One-shot TPU trial of the fused Pallas rollout (ops/fused_rollout.py).

Compiles + runs the fused whole-physics-step kernel on the real chip and
compares wall-clock against the unfused engine path on the same batch.
Run INSIDE `timeout` from a fresh process — the Mosaic compile of the big
kernel is the risky part (see memory: may need vmem headroom), so nothing
else should share the process.

    timeout 900 python scripts/fused_tpu_trial.py
Prints one JSON line: {"ok": bool, "fused_steps_per_sec": ..,
"engine_steps_per_sec": .., "max_pos_err": ..}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from catgrasp_tpu.geom import primitives as prim
    from catgrasp_tpu.geom.csg import make_csg_instance
    from catgrasp_tpu.sim import engine, env_pile
    from catgrasp_tpu.sim.types import build_shape_lib

    batch = int(os.environ.get("TRIAL_BATCH", "1024"))
    n_steps = 50
    cfg = env_pile.PileConfig(max_bodies=10)
    specs = [("nut", 0), ("screw", 0), ("hnm", 0), ("nut", 3)]
    meshes = [prim.make_instance(c, "train", i) for c, i in specs]
    csgs = [make_csg_instance(c, "train", i) for c, i in specs]
    lib = build_shape_lib(meshes, csgs, n_surf=32)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    env = engine.StaticEnv.open_bin(cfg.bin_inner)
    states, params = jax.vmap(lambda k: env_pile.reset(k, lib, cfg))(keys)

    # unfused engine rollout (the current bench path, bench.py:71-73)
    eng_j = jax.jit(lambda st: jax.vmap(lambda s, p: engine.rollout(
        s, p, lib, env, n_steps, dt=cfg.dt))(st, params))
    e0 = eng_j(states)
    jax.block_until_ready(e0)
    t = time.perf_counter()
    e0 = eng_j(states)
    _ = float(jnp.sum(e0.pos))
    t_eng = time.perf_counter() - t

    from catgrasp_tpu.ops.fused_rollout import rollout_fused
    fus_j = jax.jit(lambda st: rollout_fused(st, params, lib, env, n_steps,
                                             dt=cfg.dt))
    t = time.perf_counter()
    f0 = fus_j(states)
    jax.block_until_ready(f0)
    t_compile = time.perf_counter() - t
    t = time.perf_counter()
    f0 = fus_j(states)
    _ = float(jnp.sum(f0.pos))
    t_fus = time.perf_counter() - t

    err = float(jnp.max(jnp.abs(f0.pos - e0.pos)))
    out = {"ok": True, "compile_s": round(t_compile, 1),
           "fused_steps_per_sec": round(batch * n_steps / t_fus, 1),
           "engine_steps_per_sec": round(batch * n_steps / t_eng, 1),
           "max_pos_err": err}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
