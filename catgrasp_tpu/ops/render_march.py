"""Pallas sphere-trace march kernel — the renderer's hot loop on the VPU.

The XLA renderer (:mod:`catgrasp_tpu.render.raymarch`) evaluates every body's
CSG at every pixel for all 64 march steps: at 2064x1544 that is ~250 prim
evals/pixel/step and ~1.9 s/frame on one chip, with each scan iteration
round-tripping the ray state through HBM.  This kernel restructures the march
TPU-first (reference renderer analog: PyBullet TinyRenderer,
``pybullet_env/camera.py:35-45``):

* pixels are tiled (8, 128) = 1024 rays per grid program; ray state (t) lives
  in VMEM/registers for the whole march — zero HBM traffic between steps;
* per-tile body culling: a conservative cone-vs-bounding-sphere test (done
  once in XLA, tiny) compacts the per-tile body list, so a tile marches only
  the 1-4 bodies its rays can actually hit instead of all N; the body loop is
  ``fori_loop(0, n_visible)`` over SMEM-prefetched shape constants — no
  per-body branching;
* early tile exit: once every ray in the tile has converged (hit or left the
  frustum) the remaining steps skip all vector work via one scalar
  ``lax.cond`` per step.

Culling is exact for hit results: a body whose bounding sphere misses the
tile's ray cone can neither be hit by nor occlude any ray in the tile; its
only effect in the XLA version is shrinking step sizes near misses, which
sphere tracing tolerates (other bodies' distances still bound the step).

The kernel marches analytic CSG only (the grid-SDF path needs per-lane
gathers, which the TPU VPU does not do — that path stays in XLA).  SDF
formulas are copied verbatim from :mod:`catgrasp_tpu.geom.csg` so results
match the XLA march to float tolerance.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import transforms as tf
from ..geom.csg import BOX, CYLINDER, COS30, NONE

# (TILE_ROWS, 128) f32 tile = rays per grid program.  8 is the validated
# default; CATGRASP_RENDER_TILE_ROWS lets an on-chip trial sweep larger
# tiles (fewer grid programs, better step pipelining) without a code edit.
TILE_ROWS = int(os.environ.get("CATGRASP_RENDER_TILE_ROWS", "8"))
LANES = 128
TILE = TILE_ROWS * LANES
_KZ = 0.57735  # hex-prism fold constant (geom.csg._sd_hexprism)


def pallas_render_enabled() -> bool:
    """Kernel on/off policy: CATGRASP_PALLAS_RENDER=1/0 overrides; default
    OFF until scripts/render_tpu_trial.py validates the kernel on the real
    chip (the axon remote-compile helper is fragile with large Mosaic
    kernels — an opt-in default keeps long eval chains off the risk), and
    the XLA scan beats interpret mode on CPU anyway."""
    env = os.environ.get("CATGRASP_PALLAS_RENDER")
    if env is not None:
        return env not in ("0", "")
    return False


# ---------------------------------------------------------------------------
# In-kernel scalar-component SDFs (identical math to geom.csg)
# ---------------------------------------------------------------------------


def _box_d(px, py, pz, hx, hy, hz):
    qx, qy, qz = jnp.abs(px) - hx, jnp.abs(py) - hy, jnp.abs(pz) - hz
    ox, oy, oz = jnp.maximum(qx, 0.0), jnp.maximum(qy, 0.0), jnp.maximum(qz, 0.0)
    outn = jnp.sqrt(ox * ox + oy * oy + oz * oz + 1e-18)
    return outn + jnp.minimum(jnp.maximum(qx, jnp.maximum(qy, qz)), 0.0)


def _cyl_d(px, py, pz, r, hh):
    dxy = jnp.sqrt(px * px + py * py + 1e-18) - r
    dz = jnp.abs(pz) - hh
    ox, oz = jnp.maximum(dxy, 0.0), jnp.maximum(dz, 0.0)
    return (jnp.sqrt(ox * ox + oz * oz + 1e-18)
            + jnp.minimum(jnp.maximum(dxy, dz), 0.0))


def _hex_d(px, py, pz, apothem, hh):
    kx, ky = -COS30, 0.5
    ax, ay, az = jnp.abs(px), jnp.abs(py), jnp.abs(pz)
    dot2 = jnp.minimum(kx * ax + ky * ay, 0.0)
    ax = ax - 2.0 * dot2 * kx
    ay = ay - 2.0 * dot2 * ky
    lx = ax - jnp.clip(ax, -_KZ * apothem, _KZ * apothem)
    ly = ay - apothem
    dx = jnp.sqrt(lx * lx + ly * ly + 1e-18) * jnp.sign(ay - apothem)
    dz = az - hh
    ox, oz = jnp.maximum(dx, 0.0), jnp.maximum(dz, 0.0)
    return (jnp.sqrt(ox * ox + oz * oz + 1e-18)
            + jnp.minimum(jnp.maximum(dx, dz), 0.0))


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _march_kernel(n_bodies, n_env, n_steps, hit_eps,
                  # scalar-prefetch / SMEM refs
                  visidx_ref, visn_ref, o_ref,
                  pos_ref, rt_ref, scl_ref, typ_ref, ops_ref, par_ref, off_ref,
                  ecen_ref, ert_ref, ehalf_ref, een_ref,
                  # VMEM tiles
                  dx_ref, dy_ref, dz_ref, tmax_ref,
                  # out
                  t_ref):
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmax = tmax_ref[:]
    ox, oy, oz = o_ref[0, 0], o_ref[0, 1], o_ref[0, 2]
    n_vis = visn_ref[0, 0, 0]

    def phi_at(t):
        x = ox + t * dx
        y = oy + t * dy
        z = oz + t * dz

        def body_fn(k, phi):
            b = visidx_ref[0, 0, k]
            rx, ry, rz = x - pos_ref[b, 0], y - pos_ref[b, 1], z - pos_ref[b, 2]
            inv_s = scl_ref[b, 1]
            # local = R^T (x - pos) / scale  (rt holds R^T row-major)
            px = (rt_ref[b, 0] * rx + rt_ref[b, 1] * ry + rt_ref[b, 2] * rz) * inv_s
            py = (rt_ref[b, 3] * rx + rt_ref[b, 4] * ry + rt_ref[b, 5] * rz) * inv_s
            pz = (rt_ref[b, 6] * rx + rt_ref[b, 7] * ry + rt_ref[b, 8] * rz) * inv_s
            d = jnp.full_like(t, 1e9)
            for s in range(4):  # MAX_SLOTS, static
                qx = px - off_ref[b, 3 * s + 0]
                qy = py - off_ref[b, 3 * s + 1]
                qz = pz - off_ref[b, 3 * s + 2]
                p0 = par_ref[b, 3 * s + 0]
                p1 = par_ref[b, 3 * s + 1]
                p2 = par_ref[b, 3 * s + 2]
                tcode = typ_ref[b, s]
                db = _box_d(qx, qy, qz, p0, p1, p2)
                dc = _cyl_d(qx, qy, qz, p0, p1)
                dh = _hex_d(qx, qy, qz, p0, p1)
                ds = jnp.where(tcode == BOX, db,
                               jnp.where(tcode == CYLINDER, dc, dh))
                dn = jnp.where(ops_ref[b, s] > 0, jnp.minimum(d, ds),
                               jnp.maximum(d, -ds))
                d = jnp.where(tcode == NONE, d, dn)
            return jnp.minimum(phi, d * scl_ref[b, 0])

        phi = jax.lax.fori_loop(0, n_vis, body_fn, jnp.full_like(t, 1e9))

        def env_fn(m, phi):
            rx, ry, rz = x - ecen_ref[m, 0], y - ecen_ref[m, 1], z - ecen_ref[m, 2]
            px = ert_ref[m, 0] * rx + ert_ref[m, 1] * ry + ert_ref[m, 2] * rz
            py = ert_ref[m, 3] * rx + ert_ref[m, 4] * ry + ert_ref[m, 5] * rz
            pz = ert_ref[m, 6] * rx + ert_ref[m, 7] * ry + ert_ref[m, 8] * rz
            d = _box_d(px, py, pz, ehalf_ref[m, 0], ehalf_ref[m, 1],
                       ehalf_ref[m, 2])
            return jnp.minimum(phi, jnp.where(een_ref[m, 0] > 0, d, 1e9))

        if n_env:
            phi = jax.lax.fori_loop(0, n_env, env_fn, phi)
        return phi

    def step_fn(_, carry):
        t, n_act = carry

        def do(carry):
            t, _ = carry
            phi = phi_at(t)
            # no step cap: the analytic CSG phi is an exact-or-conservative
            # lower bound, so stepping the full distance never crosses a
            # surface; background rays hit tmax in a few steps, which lets
            # the all-converged tile exit fire much earlier
            step = jnp.maximum(phi, hit_eps * 0.5)
            done = (phi < hit_eps) | (t >= tmax)
            t2 = jnp.where(done, t, jnp.minimum(t + step, tmax))
            still = (phi >= hit_eps) & (t2 < tmax)
            return t2, jnp.sum(still.astype(jnp.float32))

        return jax.lax.cond(n_act > 0.5, do, lambda c: c, carry)

    t0 = jnp.full_like(dx, 0.05)
    t, _ = jax.lax.fori_loop(0, n_steps, step_fn,
                             (t0, jnp.float32(TILE)))
    t_ref[:] = t


# ---------------------------------------------------------------------------
# Host-side wrapper: culling, packing, padding
# ---------------------------------------------------------------------------


def _tile_visibility(o_w, d_w, pos, radius_w, active, n_tiles):
    """Conservative per-tile cone vs body bounding-sphere test.
    Returns (visidx (NT, N) i32 compacted indices, visn (NT, 1) i32)."""
    N = pos.shape[0]
    dirs = d_w.reshape(n_tiles, TILE, 3)
    mean = dirs.mean(axis=1)
    mean = mean / jnp.linalg.norm(mean, axis=-1, keepdims=True)
    cos_t = jnp.min(jnp.einsum("tpk,tk->tp", dirs, mean), axis=1)
    cos_t = jnp.clip(cos_t, -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    c = pos - o_w  # (N, 3)
    dist = jnp.linalg.norm(c, axis=-1)
    r = radius_w + 1e-3
    inside = dist <= r
    safe = jnp.maximum(dist, 1e-9)
    sin_b = jnp.clip(r / safe, 0.0, 1.0)
    cos_b = jnp.sqrt(jnp.maximum(1.0 - sin_b * sin_b, 0.0))
    cos_u = (mean @ (c / safe[:, None]).T)  # (NT, N)
    thresh = cos_t[:, None] * cos_b[None] - sin_t[:, None] * sin_b[None]
    vis = ((cos_u >= thresh - 1e-4) | inside[None]) & active[None]
    # compact: visible indices first (stable), padded with 0
    key = jnp.where(vis, 0, 1) * N + jnp.arange(N)[None]
    order = jnp.argsort(key, axis=1)
    visn = jnp.sum(vis, axis=1).astype(jnp.int32)
    return order.astype(jnp.int32), visn[:, None]


@functools.partial(jax.jit, static_argnames=("n_steps", "hit_eps", "interpret"))
def march_csg(lib, state, params, o_w, d_w, tmax, env=None,
              n_steps: int = 64, hit_eps: float = 2e-4,
              interpret: bool = False):
    """Sphere-trace all P rays through the CSG scene; returns t (P,).

    Drop-in replacement for the ``lax.scan`` march in
    :func:`catgrasp_tpu.render.raymarch.render` (geometry="csg").
    """
    P = d_w.shape[0]
    P_pad = -(-P // TILE) * TILE
    n_tiles = P_pad // TILE
    pad = P_pad - P
    if pad:
        d_w = jnp.concatenate(
            [d_w, jnp.tile(jnp.array([[0.0, 0.0, 1.0]], d_w.dtype), (pad, 1))])
        tmax = jnp.concatenate([tmax, jnp.zeros((pad,), tmax.dtype)])

    N = state.pos.shape[0]
    R = tf.quat_to_matrix(state.quat)  # (N,3,3) local->world
    rt = jnp.swapaxes(R, 1, 2).reshape(N, 9)  # R^T rows
    scl = jnp.stack([params.scale, 1.0 / params.scale], axis=1)
    sid = params.shape_id
    typ = lib.csg.types[sid].astype(jnp.int32)  # (N,4)
    ops = lib.csg.ops[sid].astype(jnp.int32)
    par = lib.csg.params[sid].reshape(N, 12)
    off = lib.csg.offsets[sid].reshape(N, 12)
    radius_w = lib.radius[sid] * params.scale

    visidx, visn = _tile_visibility(o_w, d_w, state.pos, radius_w,
                                    state.active, n_tiles)

    if env is not None:
        M = env.center.shape[0]
        ert = jnp.swapaxes(tf.quat_to_matrix(env.quat), 1, 2).reshape(M, 9)
        ecen, ehalf = env.center, env.half
        een = env.enabled.astype(jnp.int32)[:, None]
    else:
        M = 1  # dummy disabled box (static shapes; n_env=0 skips the loop)
        ert = jnp.eye(3).reshape(1, 9)
        ecen = jnp.zeros((1, 3))
        ehalf = jnp.ones((1, 3))
        een = jnp.zeros((1, 1), jnp.int32)
    n_env = M if env is not None else 0

    NR = P_pad // LANES
    comp = d_w.reshape(NR, LANES, 3)
    dx, dy, dz = comp[..., 0], comp[..., 1], comp[..., 2]
    tmax2 = tmax.reshape(NR, LANES)

    smem = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.SMEM)
    tile = pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    kern = functools.partial(_march_kernel, N, n_env, n_steps, hit_eps)
    t = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            # per-tile rows; the trailing (1, N) / (1, 1) dims match the
            # array's last two dims, satisfying Mosaic's block constraint
            pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            smem((1, 3)),
            smem((N, 3)), smem((N, 9)), smem((N, 2)), smem((N, 4)),
            smem((N, 4)), smem((N, 12)), smem((N, 12)),
            smem((M, 3)), smem((M, 9)), smem((M, 3)), smem((M, 1)),
            tile, tile, tile, tile,
        ],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((NR, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=8 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=P_pad * n_steps * (N * 220 + n_env * 30),
            bytes_accessed=P_pad * 5 * 4, transcendentals=0),
        interpret=interpret,
    )(visidx.reshape(n_tiles, 1, N), visn.reshape(n_tiles, 1, 1),
      jnp.asarray(o_w, jnp.float32).reshape(1, 3),
      state.pos.astype(jnp.float32), rt.astype(jnp.float32),
      scl.astype(jnp.float32), typ, ops,
      par.astype(jnp.float32), off.astype(jnp.float32),
      ecen.astype(jnp.float32), ert.astype(jnp.float32),
      ehalf.astype(jnp.float32), een,
      dx.astype(jnp.float32), dy.astype(jnp.float32), dz.astype(jnp.float32),
      tmax2.astype(jnp.float32))
    return t.reshape(P_pad)[:P]
