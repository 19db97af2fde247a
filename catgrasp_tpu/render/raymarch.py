"""Batched SDF-raymarch renderer: depth + instance seg + NUNOCS + normals.

One TPU pass replaces three reference components:
  * PyBullet's TinyRenderer camera (``pybullet_env/camera.py:35-45``) — depth
    and per-body segmentation,
  * the pyrender offscreen renderer used for per-object visibility masks
    (``renderer.py:14-58``),
  * the NUNOCS label pass that back-projects gt poses per pixel
    (``tool.py:30-84``) — here NUNOCS coordinates fall out of the hit point
    directly (hit position in the winning body's normalized bbox frame),
  * the normal-map pass (``tool.py:96-122``) — normals are the CSG gradient.

Sphere tracing with a fixed step count (static shapes; converged rays
freeze), vmapped over a scene batch.  All geometry is analytic CSG — no
gathers, so the inner loop is pure VPU arithmetic.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import transforms as tf
from ..geom import csg as csglib
from ..geom import sdf as sdflib
from ..sim.engine import StaticEnv, box_sdf_and_normal
from ..sim.types import SceneParams, SceneState, ShapeLib

HIT_EPS = 2e-4


def _scene_sdf(lib: ShapeLib, state: SceneState, params: SceneParams,
               x: jnp.ndarray):
    """φ per body at world points x (..., 3): (..., N)."""
    R = tf.quat_to_matrix(state.quat)  # (N,3,3)
    rel = x[..., None, :] - state.pos  # (...,N,3)
    loc = jnp.einsum("bji,...bj->...bi", R, rel) / params.scale[:, None]

    def per_body(shape_id, scale, pts):
        shape = csglib.select_shape(lib.csg, shape_id)
        return csglib.csg_sdf(shape, pts) * scale

    phi = jax.vmap(per_body, in_axes=(0, 0, -2), out_axes=-1)(
        params.shape_id, params.scale, loc
    )
    return jnp.where(state.active, phi, 1e9), loc


def _scene_sdf_grid(lib: ShapeLib, state: SceneState, params: SceneParams,
                    x: jnp.ndarray):
    """Baked-grid variant of :func:`_scene_sdf` — trilinear lookups into
    ``lib.sdf_values`` instead of analytic CSG, so arbitrary watertight
    meshes (``TriMesh.load_obj`` + ``bake_sdf``) render without a CSG tree.
    The reference renders scanned meshes through TinyRenderer
    (``camera.py:35-45``); this is the closed-loop path for external
    ``.obj`` assets (``--obj_path``)."""
    R = tf.quat_to_matrix(state.quat)
    rel = x[..., None, :] - state.pos
    loc = jnp.einsum("bji,...bj->...bi", R, rel) / params.scale[:, None]

    def per_body(shape_id, scale, pts):
        phi = sdflib.query(lib.sdf_values[shape_id], lib.sdf_lower[shape_id],
                           lib.sdf_spacing[shape_id], pts)
        return phi * scale

    phi = jax.vmap(per_body, in_axes=(0, 0, -2), out_axes=-1)(
        params.shape_id, params.scale, loc
    )
    return jnp.where(state.active, phi, 1e9), loc


def _env_sdf(env: StaticEnv, x: jnp.ndarray) -> jnp.ndarray:
    Rm = tf.quat_to_matrix(env.quat)
    rel = x[..., None, :] - env.center
    loc = jnp.einsum("mji,...mj->...mi", Rm, rel)
    d, _ = box_sdf_and_normal(loc, env.half)
    d = jnp.where(env.enabled, d, 1e9)
    return jnp.min(d, axis=-1)


def render(lib: ShapeLib, state: SceneState, params: SceneParams,
           K: jnp.ndarray, cam_in_world: jnp.ndarray, H: int, W: int,
           env: StaticEnv | None = None, zfar: float = 3.0,
           n_steps: int = 64, with_env: bool = True, geometry: str = "csg"):
    """Render one scene -> dict of (H, W[, C]) images:
    depth (z in cam frame, 0 = invalid), seg (int32: body index, -2 env,
    -1 background), nocs (NUNOCS coords in [0,1], 0 outside objects),
    normal (cam frame, oriented toward the camera), xyz (cam frame).
    vmap over scenes for batches.

    ``geometry="grid"`` marches the baked SDF grids (``lib.sdf_values``;
    build the lib with ``bake_grids=True``) instead of analytic CSG — the
    arbitrary-mesh path for external ``.obj`` assets.

    The march runs as a Pallas tile kernel on TPU for the CSG path
    (:mod:`catgrasp_tpu.ops.render_march`); grid geometry and other
    backends use the XLA ``lax.scan`` march.
    """
    from ..ops import render_march as rm
    use_pallas = geometry == "csg" and rm.pallas_render_enabled()
    return _render_impl(lib, state, params, K, cam_in_world, H, W, env=env,
                        zfar=zfar, n_steps=n_steps, with_env=with_env,
                        geometry=geometry, use_pallas=use_pallas)


@partial(jax.jit, static_argnames=("H", "W", "n_steps", "with_env", "geometry",
                                   "use_pallas"))
def _render_impl(lib: ShapeLib, state: SceneState, params: SceneParams,
                 K: jnp.ndarray, cam_in_world: jnp.ndarray, H: int, W: int,
                 env: StaticEnv | None = None, zfar: float = 3.0,
                 n_steps: int = 64, with_env: bool = True,
                 geometry: str = "csg", use_pallas: bool = False):
    scene_sdf = _scene_sdf_grid if geometry == "grid" else _scene_sdf
    # pixel rays in world frame
    vs = jnp.arange(H, dtype=jnp.float32)[:, None]
    us = jnp.arange(W, dtype=jnp.float32)[None, :]
    xs = (us - K[0, 2]) / K[0, 0]
    ys = (vs - K[1, 2]) / K[1, 1]
    d_cam = jnp.stack([xs * jnp.ones_like(ys), ys * jnp.ones_like(xs), jnp.ones_like(xs * ys)], axis=-1)
    inv_norm = 1.0 / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)
    d_cam = d_cam * inv_norm  # unit dirs; z component = inv_norm
    R_wc = cam_in_world[:3, :3]
    o_w = cam_in_world[:3, 3]
    d_w = jnp.einsum("ij,hwj->hwi", R_wc, d_cam).reshape(-1, 3)
    P = d_w.shape[0]

    t0 = 0.05
    tmax = zfar / jnp.maximum(d_cam.reshape(-1, 3)[:, 2], 1e-3)  # cap by z-depth

    if use_pallas:
        from ..ops import render_march as rm
        t = rm.march_csg(lib, state, params, o_w, d_w, tmax,
                         env=env if (with_env and env is not None) else None,
                         n_steps=n_steps, hit_eps=HIT_EPS,
                         interpret=jax.default_backend() != "tpu")
    else:
        # Analytic CSG distances are exact-or-conservative lower bounds
        # (union = min is exact; subtraction max(d,-d) underestimates), so
        # an uncapped sphere-trace step can never cross a surface — and
        # background rays reach tmax in a handful of steps instead of
        # tmax/cap.  Baked grids carry trilinear interpolation error, so
        # the grid path keeps a step cap.
        step_cap = 0.05 if geometry == "grid" else jnp.float32(jnp.inf)

        def march(carry, _):
            t, done = carry
            x = o_w + t[:, None] * d_w
            phi_b, _ = scene_sdf(lib, state, params, x)
            phi = jnp.min(phi_b, axis=-1)
            if with_env and env is not None:
                phi = jnp.minimum(phi, _env_sdf(env, x))
            step = jnp.clip(phi, HIT_EPS * 0.5, step_cap)
            newly_done = phi < HIT_EPS
            t = jnp.where(done | newly_done, t, jnp.minimum(t + step, tmax))
            return (t, done | newly_done | (t >= tmax)), None

        (t, _), _ = jax.lax.scan(
            march, (jnp.full((P,), t0), jnp.zeros((P,), bool)), None,
            length=n_steps)

    x = o_w + t[:, None] * d_w
    phi_b, loc = scene_sdf(lib, state, params, x)
    phi_min = jnp.min(phi_b, axis=-1)
    body = jnp.argmin(phi_b, axis=-1)
    phi_env = _env_sdf(env, x) if (with_env and env is not None) else jnp.full((P,), 1e9)

    hit_body = (phi_min < HIT_EPS * 4) & (t < tmax)
    hit_env = (phi_env < HIT_EPS * 4) & (phi_env < phi_min) & (t < tmax)
    seg = jnp.where(hit_body & ~hit_env, body, jnp.where(hit_env, -2, -1)).astype(jnp.int32)

    # depth = z in camera frame
    z_cam = t * d_cam.reshape(-1, 3)[:, 2]
    depth = jnp.where(seg != -1, z_cam, 0.0)

    # NUNOCS: hit point in winning body's normalized unit-scale bbox
    loc_win = jnp.take_along_axis(loc, body[:, None, None].repeat(3, -1), axis=1)[:, 0]
    b = lib.bounds[params.shape_id[body]]  # (P,2,3)
    nocs = (loc_win - b[:, 0]) / jnp.maximum(b[:, 1] - b[:, 0], 1e-9)
    nocs = jnp.where((seg >= 0)[:, None], jnp.clip(nocs, 0.0, 1.0), 0.0)

    # world normal from the winning body's CSG gradient
    if geometry == "grid":
        # a per-pixel gather of the winning body's whole SDF grid would
        # materialize (P, D^3): keep the all-bodies pass and select
        def per_body_normal(shape_id, pts_loc):
            _, n = sdflib.query_and_grad(
                lib.sdf_values[shape_id], lib.sdf_lower[shape_id],
                lib.sdf_spacing[shape_id], pts_loc)
            return n  # body-local frame

        n_loc = jax.vmap(per_body_normal, in_axes=(0, -2), out_axes=-2)(
            params.shape_id, loc)  # (P, N, 3)
        Rall = tf.quat_to_matrix(state.quat)  # (N,3,3)
        n_w = jnp.einsum("bij,pbj->pbi", Rall, n_loc)
        normal = jnp.take_along_axis(
            n_w, body[:, None, None].repeat(3, -1), axis=1)[:, 0]
    else:
        # only the seg-winning body's normal survives selection, so gather
        # its (tiny) CSG parameter rows per pixel and evaluate ONE primitive
        # stack — (P, 3) gradient work instead of the (P, N, 3) all-bodies
        # pass, which dominated the full-res label cost
        def norm_one(sid, pt):
            shape = csglib.select_shape(lib.csg, sid)
            _, n = csglib.csg_sdf_and_normal(shape, pt)
            return n  # body-local frame

        n_loc_win = jax.vmap(norm_one)(params.shape_id[body], loc_win)
        R_win = tf.quat_to_matrix(state.quat)[body]  # (P,3,3)
        normal = jnp.einsum("pij,pj->pi", R_win, n_loc_win)
    # camera frame, oriented toward the camera — matching the reference's
    # o3d normal maps (``tool.py:96-122`` orients at the camera origin) and
    # consistent with the cam-frame ``xyz`` cloud below.
    normal = jnp.einsum("ij,nj->ni", tf.pose_inverse(cam_in_world)[:3, :3], normal)
    flip = jnp.sign(-jnp.sum(normal * d_cam.reshape(-1, 3), axis=-1, keepdims=True))
    normal = normal * jnp.where(flip == 0, 1.0, flip)
    normal = jnp.where((seg >= 0)[:, None], normal, 0.0)

    # xyz in cam frame (organized cloud, Utils.py:239 analog)
    T_cw = tf.pose_inverse(cam_in_world)
    xyz_cam = tf.transform_points(T_cw, x)
    xyz_cam = jnp.where((seg != -1)[:, None], xyz_cam, 0.0)

    # rgb: headlight Lambertian over a per-body albedo palette (the
    # reference saves TinyRenderer rgb.png per scene; no net consumes color,
    # so flat shading is sufficient and costs one dot product)
    palette = jnp.array([[0.85, 0.55, 0.35], [0.40, 0.65, 0.85],
                         [0.55, 0.80, 0.45], [0.85, 0.75, 0.35],
                         [0.70, 0.45, 0.75], [0.50, 0.50, 0.50]])
    albedo = palette[jnp.abs(body) % len(palette)]
    albedo = jnp.where((seg == -2)[:, None], 0.35, albedo)  # env gray
    lambert = jnp.clip(-jnp.sum(normal * d_cam.reshape(-1, 3), axis=-1), 0.0, 1.0)
    rgb = albedo * (0.25 + 0.75 * lambert[:, None])
    rgb = jnp.where((seg != -1)[:, None], rgb, 0.0)

    shp = (H, W)
    return {
        "rgb": rgb.reshape(shp + (3,)),
        "depth": depth.reshape(shp),
        "seg": seg.reshape(shp),
        "nocs": nocs.reshape(shp + (3,)),
        "normal": normal.reshape(shp + (3,)),
        "xyz": xyz_cam.reshape(shp + (3,)),
    }


def render_batch(lib, states, params, K, cam_in_world, H, W, env=None,
                 scene_chunk: int | None = None, **kw):
    """Render a scene batch (leading axis of states/params).

    ``scene_chunk=None`` vmaps the whole batch — peak memory scales with B
    (the label passes materialize (B, P, N, 3) intermediates; batch-8 at
    384x512 OOMs a v5e, ``logs/render_trial.json``).  A small ``scene_chunk``
    runs the batch as a sequential ``lax.map`` of vmapped sub-batches: one
    compiled program, peak memory bounded by the chunk, throughput ~= the
    single-frame rate (the march saturates the chip per frame already)."""
    fn = lambda s, p: render(lib, s, p, K, cam_in_world, H, W, env=env, **kw)
    B = states.pos.shape[0]
    if scene_chunk is None or scene_chunk >= B:
        return jax.vmap(fn)(states, params)
    if B % scene_chunk:
        raise ValueError(f"scene_chunk {scene_chunk} must divide batch {B}")
    resh = lambda x: x.reshape((B // scene_chunk, scene_chunk) + x.shape[1:])
    sc = jax.tree.map(resh, (states, params))
    out = jax.lax.map(lambda sp: jax.vmap(fn)(*sp), sc)
    return jax.tree.map(lambda x: x.reshape((B,) + x.shape[2:]), out)


# Full-resolution frames (the reference camera is 2064x1544,
# ``config.yml:1-3``) OOM a single dispatch: the march itself is tiled, but
# the label passes materialize (P, N, 3) CSG intermediates over all ~3.2M
# pixels.  Rendering row strips bounds that to (rows*W, N, 3); a strip is
# exactly the full image's rows because shifting the principal point cy by
# the strip offset reproduces the same pixel rays (rays depend on v only
# through (v - cy)/fy).  Every strip shares one compiled executable.
def render_chunked(lib, state, params, K, cam_in_world, H, W,
                   env=None, rows_per_chunk: int = 256, **kw):
    """:func:`render` in row strips of ``rows_per_chunk`` — identical output,
    peak memory bounded by the strip size.  Use for full-resolution frames
    (e.g. the reference's 2064x1544)."""
    rows = min(rows_per_chunk, H)
    outs = []
    for r0 in range(0, H, rows):
        hs = min(rows, H - r0)
        if hs != rows:  # keep one executable: pad the last strip, crop after
            r0 = H - rows
            hs = rows
            crop = rows - (H - len(outs) * rows)
        else:
            crop = 0
        Ks = jnp.asarray(K).at[1, 2].add(-float(r0))
        o = render(lib, state, params, Ks, cam_in_world, rows, W,
                   env=env, **kw)
        if crop:
            o = {k: v[crop:] for k, v in o.items()}
        outs.append(o)
    return {k: jnp.concatenate([o[k] for o in outs], axis=0) for k in outs[0]}


def visibility_ratio(lib, state, params, K, cam_in_world, H, W, env=None, **kw):
    """Per-body visibility: pixels visible in the full scene / pixels visible
    alone — the occlusion-ratio label of ``tool.py:229-275``.  Returns (N,)."""
    full = render(lib, state, params, K, cam_in_world, H, W, env=env, **kw)
    N = state.pos.shape[0]

    def solo(i):
        mask = jnp.zeros((N,), bool).at[i].set(True)
        st = state.replace(active=state.active & mask)
        out = render(lib, st, params, K, cam_in_world, H, W, env=None,
                     with_env=False, **kw)
        return jnp.sum(out["seg"] == i)

    solo_counts = jax.lax.map(solo, jnp.arange(N))
    full_counts = jnp.sum(full["seg"][None] == jnp.arange(N)[:, None, None], axis=(1, 2))
    return full_counts / jnp.maximum(solo_counts, 1)
