"""One-shot TPU trial of the Pallas sphere-trace kernel (ops/render_march.py).

Compiles + runs the tiled march on the real chip and compares wall-clock and
output depth against the XLA ``lax.scan`` march on the same settled pile, at
both the eval resolution (384x512) and the reference full resolution
(1544x2064, ``config.yml`` camera).  Run from a FRESH process inside
``timeout`` — the Mosaic compile is the risky part on the axon tunnel.

    timeout 900 python scripts/render_tpu_trial.py
Prints one JSON line per resolution:
{"H":..,"W":..,"ok":..,"pallas_frames_per_sec":..,"xla_frames_per_sec":..,
 "max_t_err":..}
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="single,full,batch",
                    help="comma subset of single(384x512)/full(1544x2064)/"
                         "batch — lets the TILE_ROWS sweep (env "
                         "CATGRASP_RENDER_TILE_ROWS, read at import) rerun "
                         "only the resolutions it needs per process")
    modes = set(ap.parse_args().modes.split(","))
    from catgrasp_tpu.geom import primitives as prim
    from catgrasp_tpu.geom.csg import make_csg_instance
    from catgrasp_tpu.render import raymarch
    from catgrasp_tpu.sim import engine, env_pile
    from catgrasp_tpu.sim.types import build_shape_lib

    cfg = env_pile.PileConfig(max_bodies=10)
    specs = [("nut", 0), ("screw", 0), ("hnm", 0)]
    meshes = [prim.make_instance(c, "train", i) for c, i in specs]
    csgs = [make_csg_instance(c, "train", i) for c, i in specs]
    lib = build_shape_lib(meshes, csgs, n_surf=32)
    env = engine.StaticEnv.open_bin(cfg.bin_inner)
    state, params = env_pile.reset(jax.random.PRNGKey(4), lib, cfg)
    state = engine.rollout(state, params, lib, env, 200, dt=cfg.dt)
    jax.block_until_ready(state)

    cam = jnp.eye(4).at[:3, :3].set(
        jnp.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])).at[2, 3].set(0.7)

    res = ([(384, 512)] if "single" in modes else []) + \
          ([(1544, 2064)] if "full" in modes else [])
    for H, W in res:
        fx = 2257.75 * (W / 2064.0)
        K = jnp.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1.0]])
        out = {"H": H, "W": W, "ok": False}
        frames = {}
        # per-path isolation: the XLA march materializes (P, N)-shaped
        # per-step buffers and OOMs at full res; the VMEM-tiled kernel must
        # still get its shot
        # full res goes through render_chunked: a single dispatch OOMs on
        # the (P, N, 3) label-pass intermediates at 3.2M pixels whichever
        # way the march runs (logs/render_trial.json 8/17)
        rend = (raymarch.render if H * W <= 1 << 20
                else lambda *a, **k: raymarch.render_chunked(
                    *a, rows_per_chunk=193, **k))
        for name, flag in [("xla", "0"), ("pallas", "1")]:
            try:
                os.environ["CATGRASP_PALLAS_RENDER"] = flag
                t0 = time.perf_counter()
                r = rend(lib, state, params, K, cam, H, W, env=env)
                d = r["depth"]
                jax.block_until_ready(d)
                _ = float(jnp.sum(d))
                compile_s = time.perf_counter() - t0
                n_calls = 4
                t0 = time.perf_counter()
                for _i in range(n_calls):
                    # time the SAME path as the warmup: full res must go
                    # through render_chunked (the 8/17 trial timed the
                    # monolithic render here and mis-reported full-res as
                    # OOM for both paths)
                    r = rend(lib, state, params, K, cam, H, W, env=env)
                _ = float(jnp.sum(r["depth"]))
                dt = time.perf_counter() - t0
                frames[name] = n_calls / dt
                out[f"{name}_compile_s"] = round(compile_s, 1)
                frames[name + "_depth"] = r["depth"]
                out[f"{name}_frames_per_sec"] = round(frames[name], 3)
            except Exception as e:  # noqa: BLE001 — report, don't crash
                out[f"{name}_error"] = f"{type(e).__name__}: {e}"[:300]
        if "pallas_depth" in frames and "xla_depth" in frames:
            err = float(jnp.max(jnp.abs(
                jnp.nan_to_num(frames["pallas_depth"], nan=0.0, posinf=0.0)
                - jnp.nan_to_num(frames["xla_depth"], nan=0.0, posinf=0.0))))
            out["max_t_err"] = err
        out["ok"] = "pallas_frames_per_sec" in out
        print(json.dumps(out), flush=True)

    # batched path at the bench's resolution — full vmap OOMs (8/17 trial),
    # so also trial lax.map chunking (scene_chunk 1 and 2) per march path;
    # the fastest passing config becomes the bench default
    if "batch" not in modes:
        return
    B, H, W = 8, 384, 512
    fx = 2257.75 * (W / 2064.0)
    K = jnp.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1.0]])
    keys = jax.random.split(jax.random.PRNGKey(4), B)
    states, paramsb = jax.vmap(
        lambda k: env_pile.reset(k, lib, cfg))(keys)
    for chunk in [None, 2, 1]:
        out = {"mode": "batch", "B": B, "H": H, "W": W,
               "scene_chunk": chunk, "ok": False}
        rates = {}
        for name, flag in [("xla", "0"), ("pallas", "1")]:
            try:
                os.environ["CATGRASP_PALLAS_RENDER"] = flag
                t0 = time.perf_counter()
                r = raymarch.render_batch(lib, states, paramsb, K, cam, H, W,
                                          env=env, scene_chunk=chunk)
                _ = float(jnp.sum(r["depth"]))
                out[f"{name}_compile_s"] = round(time.perf_counter() - t0, 1)
                n_calls = 4
                t0 = time.perf_counter()
                for _i in range(n_calls):
                    r = raymarch.render_batch(lib, states, paramsb, K, cam,
                                              H, W, env=env, scene_chunk=chunk)
                _ = float(jnp.sum(r["depth"]))
                rates[name] = B * n_calls / (time.perf_counter() - t0)
                out[f"{name}_frames_per_sec"] = round(rates[name], 3)
            except Exception as e:  # noqa: BLE001
                out[f"{name}_error"] = f"{type(e).__name__}: {e}"[:300]
        out["ok"] = bool(rates)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
