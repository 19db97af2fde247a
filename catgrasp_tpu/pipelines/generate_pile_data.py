"""Synthetic pile dataset generation — TPU ``generate_pile_data.py`` +
the label passes of ``tool.py`` folded into the same device program.

Per scene (reference flow, ``generate_pile_data.py:17-50`` +
``env.generate_one``, ``env.py:391-436``): drop a random pile, settle,
jitter the camera keeping the bin in frame, render, save.  The reference
then runs six sequential label passes over the images (``tool.py:421-439``);
our renderer already emits NUNOCS / normals / xyz / visibility in the same
pass, so one program produces fully-labeled samples.

Output: one .npz per scene with
  depth (H,W) f32 m     seg (H,W) i32 (body idx, -2 env, -1 bg)
  nocs (H,W,3) f32      normal (H,W,3) f32       xyz (H,W,3) f32 cam frame
  ob_in_world (N,4,4)   scales (N,)   shape_id (N,)   active (N,)
  vis_ratio (N,)        K (3,3)       cam_in_world (4,4)   class_name
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
from ..render import raymarch
from ..sim import engine, env_pile
from ..sim.types import build_shape_lib


def category_lib(class_name: str, split: str, n_surf: int = 48):
    # train AND val scenes render the training objects (the reference's
    # train/val are SCENE counts over the same models, config.yml:11-14);
    # only the test split uses held-out instances
    inst_split = "test" if split == "test" else "train"
    n = prim.num_instances(class_name, inst_split)
    meshes = [prim.make_instance(class_name, inst_split, i) for i in range(n)]
    csgs = [csglib.make_csg_instance(class_name, inst_split, i) for i in range(n)]
    return build_shape_lib(meshes, csgs, n_surf=n_surf)


def random_camera(key, base_height: float = 0.6, jitter: float = 0.05,
                  max_rot_deg: float = 10.0):
    """Top-down camera with reference-magnitude pose jitter — ±5 cm
    translation AND up to 10° rotation (``random_uniform_magnitude(max_T=
    0.05, max_R=10)``, ``generate_pile_data.py:34``) — keeping the bin in
    frame.  The reference rejection-resamples until all bin verts project
    inside the image; here the same is a vectorized first-valid pick over a
    fixed candidate batch (XLA-friendly), falling back to straight-down."""
    look_down = jnp.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
    NC = 8  # rejection-sampling candidates
    k1, k2, k3, k4 = jax.random.split(key, 4)
    dxy = jax.random.uniform(k1, (NC, 2), minval=-jitter, maxval=jitter)
    dz = jax.random.uniform(k2, (NC,), minval=-jitter, maxval=jitter)
    axis = tf.random_direction(k3, (NC,))
    ang = jax.random.uniform(k4, (NC,), minval=-1.0, maxval=1.0) * jnp.deg2rad(max_rot_deg)
    R = jax.vmap(tf.axis_angle_to_matrix)(axis, ang)  # (NC,3,3)

    def build(i):
        cam = jnp.eye(4)
        cam = cam.at[:3, :3].set(look_down @ R[i])
        cam = cam.at[:2, 3].set(dxy[i])
        cam = cam.at[2, 3].set(base_height + dz[i])
        return cam

    cams = jax.vmap(build)(jnp.arange(NC))
    # bin-in-frame test: project the 8 bin-top corners (inner 0.3 box)
    corners = jnp.array([[sx * 0.15, sy * 0.15, z]
                         for sx in (-1, 1) for sy in (-1, 1)
                         for z in (0.0, 0.12)], jnp.float32)
    K = jnp.asarray(_CAM_K_FOR_JITTER)
    H, W = _CAM_HW_FOR_JITTER

    def in_frame(cam):
        pc = tf.transform_points(tf.pose_inverse(cam), corners)
        z = jnp.maximum(pc[:, 2], 1e-6)
        u = K[0, 0] * pc[:, 0] / z + K[0, 2]
        v = K[1, 1] * pc[:, 1] / z + K[1, 2]
        return jnp.all((u >= 0) & (u < W) & (v >= 0) & (v < H) & (pc[:, 2] > 0))

    ok = jax.vmap(in_frame)(cams)
    fallback = jnp.eye(4).at[:3, :3].set(look_down).at[2, 3].set(base_height)
    idx = jnp.argmax(ok)  # first valid candidate
    return jnp.where(ok.any(), cams[idx], fallback)


# module-level camera intrinsics for the in-frame test; set by
# generate_scenes before tracing (static per run)
_CAM_K_FOR_JITTER = np.array([[564.0, 0, 258.0], [0, 564.0, 193.0], [0, 0, 1.0]])
_CAM_HW_FOR_JITTER = (386, 516)


def generate_scenes(class_name: str, split: str, n_scenes: int, out_dir: str,
                    cfg: dict | None = None, seed: int = 0,
                    settle_steps: int = 400, batch: int = 16,
                    start: int = 0):
    cfg = cfg or load_config("config.yml")
    H = int(cfg["H"] * cfg.get("render_downscale", 0.25))
    W = int(cfg["W"] * cfg.get("render_downscale", 0.25))
    K = np.array(cfg["K"], np.float32).reshape(3, 3).copy()
    K[:2] *= cfg.get("render_downscale", 0.25)
    Kj = jnp.asarray(K)
    global _CAM_K_FOR_JITTER, _CAM_HW_FOR_JITTER
    _CAM_K_FOR_JITTER = K
    _CAM_HW_FOR_JITTER = (H, W)

    lib = category_lib(class_name, split)
    pile_cfg = env_pile.PileConfig(
        max_bodies=int(cfg["dataset"]["num_pile_objects"][1]),
        scale_range=tuple(cfg["dataset"]["object_scales"]),
    )
    env = engine.StaticEnv.open_bin(pile_cfg.bin_inner)
    os.makedirs(out_dir, exist_ok=True)

    key = jax.random.PRNGKey(seed)

    # visibility is a pixel-count RATIO (visible-in-scene / visible-alone),
    # so resolution cancels: compute it at 1/4 res — the solo renders are
    # the dominant cost (N+1 full ray marches otherwise)
    vd = 4
    Kv = Kj.at[:2].multiply(1.0 / vd)
    Hv, Wv = H // vd, W // vd

    @jax.jit
    def make_batch(k):
        ks = jax.random.split(k, batch + 1)
        states, params = jax.vmap(lambda kk: env_pile.reset(kk, lib, pile_cfg))(ks[:batch])
        states = jax.vmap(lambda s, p: env_pile.settle_fixed(s, p, lib, env, pile_cfg, settle_steps))(states, params)
        cams = jax.vmap(random_camera)(jax.random.split(ks[batch], batch))
        outs = jax.vmap(lambda s, p, c: raymarch.render(lib, s, p, Kj, c, H, W, env=env))(states, params, cams)
        vis = jax.vmap(lambda s, p, c: raymarch.visibility_ratio(lib, s, p, Kv, c, Hv, Wv))(states, params, cams)
        poses = jax.vmap(tf.pose_from_qt)(
            states.quat.reshape(-1, 4), states.pos.reshape(-1, 3)
        ).reshape(batch, -1, 4, 4)
        # compact on-device so the host fetch moves ~4 MB/scene -> ~1 MB
        # (the axon tunnel is bandwidth-bound); xyz is derivable from depth
        # and is reconstructed by data.labels.load_scene
        enc = {
            "rgb": (outs["rgb"] * 255).astype(jnp.uint8),
            "depth": jnp.round(outs["depth"] * 1e4).astype(jnp.uint16),
            "seg": outs["seg"].astype(jnp.int16),
            "nocs": outs["nocs"].astype(jnp.float16),
            "normal": outs["normal"].astype(jnp.float16),
        }
        return states, params, cams, enc, vis, poses

    def fetch(k):
        return jax.tree.map(np.asarray, make_batch(k))

    # resume: burn the key splits of the already-written batches so the
    # remainder continues the exact key stream of an uninterrupted run
    if start % batch != 0:
        raise ValueError(f"--start must be a multiple of batch={batch}")
    if start >= n_scenes:
        # n_scenes is the END id, not a count: --start 10832 --n_scenes 2048
        # would otherwise silently generate nothing (it no-oped a round-3
        # data stage exactly this way)
        raise ValueError(
            f"--n_scenes ({n_scenes}) is the exclusive END scene id, which "
            f"must exceed --start ({start}); to append K scenes pass "
            f"--n_scenes {start}+K")
    for _ in range(start // batch):
        key, _ = jax.random.split(key)
    scene_id = start
    pending = None
    # round-3 data gen was npz-bound at ~190 scenes/min with the chip idle
    # (this is a 1-CPU host): np.savez_compressed hardcodes zlib's default
    # level 6.  A level-1 deflate writer is ~4x cheaper for ~25% bigger
    # files (np.load reads the zip-of-npy identically), and the writer
    # thread overlaps compression with the TPU's next batch (zlib releases
    # the GIL while the main thread waits on device fetches).
    import zipfile
    from concurrent.futures import ThreadPoolExecutor

    from numpy.lib import format as npformat

    futures = []

    def _write(path, payload):
        with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED,
                             compresslevel=1) as zf:
            for k, v in payload.items():
                with zf.open(k + ".npy", "w") as f:
                    npformat.write_array(f, np.asarray(v),
                                         allow_pickle=False)

    with ThreadPoolExecutor(max_workers=2) as pool:
        while scene_id < n_scenes:
            key, sub = jax.random.split(key)
            nxt = make_batch(sub)  # dispatch (async) before draining the previous
            if pending is None:
                pending = nxt
                continue
            states, params, cams, enc, vis, poses = jax.tree.map(np.asarray, pending)
            pending = nxt
            for b in range(min(batch, n_scenes - scene_id)):
                payload = dict(
                    rgb=enc["rgb"][b], depth=enc["depth"][b], seg=enc["seg"][b],
                    nocs=enc["nocs"][b], normal=enc["normal"][b],
                    ob_in_world=poses[b].astype(np.float32),
                    scales=params.scale[b], shape_id=params.shape_id[b],
                    active=states.active[b], vis_ratio=vis[b],
                    K=K, cam_in_world=cams[b], class_name=class_name,
                )
                futures.append(pool.submit(
                    _write, f"{out_dir}/{scene_id:07d}.npz", payload))
                scene_id += 1
            # bound the in-flight queue (each payload is ~1 MB of host copies)
            while len(futures) > 64:
                futures.pop(0).result()
            print(f"{scene_id}/{n_scenes} scenes", flush=True)
        for f in futures:
            f.result()  # surface any writer exception before returning
    return out_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--class_name", default="nut")
    ap.add_argument("--split", default="train")
    ap.add_argument("--n_scenes", type=int, default=64,
                    help="exclusive END scene id (NOT a count): generates "
                         "ids [start, n_scenes)")
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--start", type=int, default=0,
                    help="resume: first scene id to generate (multiple of 16)")
    args = ap.parse_args()
    out = args.out_dir or f"dataset/{args.class_name}/{args.split}"
    generate_scenes(args.class_name, args.split, args.n_scenes, out,
                    seed=args.seed, start=args.start)


if __name__ == "__main__":
    main()
