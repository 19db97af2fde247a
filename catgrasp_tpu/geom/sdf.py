"""Signed-distance-field engine — the framework's core geometric primitive.

One design replaces four reference components at once (see SURVEY.md §7):

* ``SDFGen`` external voxelizer (``make_sdf.py:30-36``)        -> :func:`bake_sdf`
* ``meshpy.Sdf3D`` trilinear lookups (``sdf.py:292-361``)      -> :func:`query`
* FCL mesh/octomap collision (``my_cpp/collision_manager.cpp``)-> batched :func:`query` of
  one body's sample points against another body's grid
* PyBullet narrowphase (``pybullet_env/*``)                    -> :mod:`catgrasp_tpu.sim.contact`

The bake computes exact point-triangle distances and signs them with
generalized winding numbers, which stays correct for unions of overlapping
watertight parts (our procedural screws/connectors) where ray-parity breaks.

Everything is jax.numpy: the bake itself runs on TPU, chunked to bound
memory, and ``jit``s cleanly.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class SdfGrid:
    """Uniform signed-distance grid.  ``values[i,j,k]`` is the signed
    distance at ``lower + (i,j,k)*spacing`` (negative inside)."""

    values: jnp.ndarray  # (N, N, N) float32
    lower: jnp.ndarray  # (3,) float32 world coords of voxel (0,0,0)
    spacing: jnp.ndarray  # () float32

    @property
    def dims(self):
        return self.values.shape


# ---------------------------------------------------------------------------
# Bake
# ---------------------------------------------------------------------------


def _point_tri_dist_sq(p: jnp.ndarray, a, b, c) -> jnp.ndarray:
    """Squared distance from points p (M,3) to triangles (F,3) — returns
    (M, F).  Branch-free Ericson region test."""
    ab = b - a  # (F,3)
    ac = c - a
    ap = p[:, None, :] - a[None]  # (M,F,3)

    d1 = jnp.einsum("fk,mfk->mf", ab, ap)
    d2 = jnp.einsum("fk,mfk->mf", ac, ap)
    bp = p[:, None, :] - b[None]
    d3 = jnp.einsum("fk,mfk->mf", ab, bp)
    d4 = jnp.einsum("fk,mfk->mf", ac, bp)
    cp = p[:, None, :] - c[None]
    d5 = jnp.einsum("fk,mfk->mf", ab, cp)
    d6 = jnp.einsum("fk,mfk->mf", ac, cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom_vbvc = vb + vc
    # region masks
    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)

    eps = 1e-20
    v_ab = d1 / jnp.where(jnp.abs(d1 - d3) < eps, eps, d1 - d3)
    w_ac = d2 / jnp.where(jnp.abs(d2 - d6) < eps, eps, d2 - d6)
    w_bc = (d4 - d3) / jnp.where(jnp.abs((d4 - d3) + (d5 - d6)) < eps, eps, (d4 - d3) + (d5 - d6))

    sum_v = va + vb + vc
    denom = jnp.where(jnp.abs(sum_v) < eps, eps, sum_v)
    v_in = vb / denom
    w_in = vc / denom

    # candidate closest points
    def clamp01(x):
        return jnp.clip(x, 0.0, 1.0)

    cp_a = jnp.broadcast_to(a[None], ap.shape)
    cp_b = jnp.broadcast_to(b[None], ap.shape)
    cp_c = jnp.broadcast_to(c[None], ap.shape)
    cp_ab = a[None] + clamp01(v_ab)[..., None] * ab[None]
    cp_ac = a[None] + clamp01(w_ac)[..., None] * ac[None]
    cp_bc = b[None] + clamp01(w_bc)[..., None] * (c - b)[None]
    cp_in = a[None] + v_in[..., None] * ab[None] + w_in[..., None] * ac[None]

    closest = cp_in
    closest = jnp.where(on_bc[..., None], cp_bc, closest)
    closest = jnp.where(on_ac[..., None], cp_ac, closest)
    closest = jnp.where(on_ab[..., None], cp_ab, closest)
    closest = jnp.where(in_c[..., None], cp_c, closest)
    closest = jnp.where(in_b[..., None], cp_b, closest)
    closest = jnp.where(in_a[..., None], cp_a, closest)

    d = p[:, None, :] - closest
    return jnp.sum(d * d, axis=-1)


def _winding_number(p: jnp.ndarray, a, b, c) -> jnp.ndarray:
    """Generalized winding number of points p (M,3) w.r.t. the closed surface
    given by triangles (F,3,3).  (van Oosterom & Strackee solid angle.)"""
    av = a[None] - p[:, None, :]
    bv = b[None] - p[:, None, :]
    cv = c[None] - p[:, None, :]
    la = jnp.linalg.norm(av, axis=-1)
    lb = jnp.linalg.norm(bv, axis=-1)
    lc = jnp.linalg.norm(cv, axis=-1)
    det = jnp.einsum("mfk,mfk->mf", av, jnp.cross(bv, cv))
    denom = (
        la * lb * lc
        + jnp.einsum("mfk,mfk->mf", av, bv) * lc
        + jnp.einsum("mfk,mfk->mf", bv, cv) * la
        + jnp.einsum("mfk,mfk->mf", cv, av) * lb
    )
    omega = 2.0 * jnp.arctan2(det, denom)
    return jnp.sum(omega, axis=-1) / (4.0 * jnp.pi)


def _sdf_points(pts: jnp.ndarray, tris: jnp.ndarray, chunk: int = 2048) -> jnp.ndarray:
    """Signed distance of arbitrary points to a closed triangle soup."""
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
    n = pts.shape[0]
    n_pad = (-n) % chunk
    pts_p = jnp.concatenate([pts, jnp.zeros((n_pad, 3), pts.dtype)])

    def body(chunk_pts):
        d2 = _point_tri_dist_sq(chunk_pts, a, b, c)
        dist = jnp.sqrt(jnp.min(d2, axis=-1))
        wn = _winding_number(chunk_pts, a, b, c)
        sign = jnp.where(wn > 0.5, -1.0, 1.0)
        return dist * sign

    out = jax.lax.map(body, pts_p.reshape(-1, chunk, 3))
    return out.reshape(-1)[:n]


def grid_points(lower: jnp.ndarray, spacing, dims) -> jnp.ndarray:
    ii, jj, kk = jnp.meshgrid(
        jnp.arange(dims[0]), jnp.arange(dims[1]), jnp.arange(dims[2]), indexing="ij"
    )
    idx = jnp.stack([ii, jj, kk], axis=-1).reshape(-1, 3).astype(jnp.float32)
    return lower[None] + idx * spacing


def bake_sdf(vertices: np.ndarray, faces: np.ndarray, dims: int = 48,
             padding: float = 0.004, chunk: int = 2048) -> SdfGrid:
    """Voxelize a watertight mesh (or union of watertight parts) into an
    :class:`SdfGrid`.  Replaces the external ``SDFGen`` binary invocation
    (``make_sdf.py:30-36``) with an on-device bake.

    All grids share cubic ``dims`` so instances of a category stack into a
    single (K, N, N, N) tensor for batched scene queries.
    """
    v = jnp.asarray(vertices, jnp.float32)
    f = np.asarray(faces)
    tris = v[f]  # (F,3,3)
    lo = jnp.min(v, axis=0) - padding
    hi = jnp.max(v, axis=0) + padding
    spacing = jnp.max(hi - lo) / (dims - 1)
    # center the (cubic) grid on the bbox
    center = (lo + hi) / 2
    half = spacing * (dims - 1) / 2
    lower = center - half
    pts = grid_points(lower, spacing, (dims, dims, dims))
    vals = _sdf_points(pts, tris, chunk=chunk).reshape(dims, dims, dims)
    return SdfGrid(values=vals, lower=lower, spacing=spacing)


# ---------------------------------------------------------------------------
# Query
# ---------------------------------------------------------------------------


def query(grid_values: jnp.ndarray, lower: jnp.ndarray, spacing: jnp.ndarray,
          pts: jnp.ndarray) -> jnp.ndarray:
    """Trilinear signed-distance lookup, batched over points (..., 3).

    Outside the grid, returns the boundary value plus the Euclidean distance
    to the grid box — a conservative exterior estimate (same spirit as
    ``meshpy/sdf.py:345-361`` which clamps, plus a positive push so far-away
    points never read as colliding).
    """
    dims = jnp.array(grid_values.shape, jnp.float32)
    g = (pts - lower) / spacing  # grid coords
    g_cl = jnp.clip(g, 0.0, dims - 1.000001)
    i0 = jnp.floor(g_cl).astype(jnp.int32)
    i0 = jnp.minimum(i0, jnp.array(grid_values.shape, jnp.int32) - 2)
    frac = g_cl - i0

    def gv(di, dj, dk):
        return grid_values[i0[..., 0] + di, i0[..., 1] + dj, i0[..., 2] + dk]

    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    c00 = gv(0, 0, 0) * (1 - fx) + gv(1, 0, 0) * fx
    c10 = gv(0, 1, 0) * (1 - fx) + gv(1, 1, 0) * fx
    c01 = gv(0, 0, 1) * (1 - fx) + gv(1, 0, 1) * fx
    c11 = gv(0, 1, 1) * (1 - fx) + gv(1, 1, 1) * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    val = c0 * (1 - fz) + c1 * fz

    # exterior correction
    out_vec = (g - g_cl) * spacing
    return val + jnp.linalg.norm(out_vec, axis=-1)


def query_grid(grid: SdfGrid, pts: jnp.ndarray) -> jnp.ndarray:
    return query(grid.values, grid.lower, grid.spacing, pts)


def query_shapes(values: jnp.ndarray, lowers: jnp.ndarray, spacings: jnp.ndarray,
                 shape_id: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Query a library of stacked grids: ``values`` (K,N,N,N), ``shape_id``
    scalar int selecting the grid, ``pts`` (...,3)."""
    return query(values[shape_id], lowers[shape_id], spacings[shape_id], pts)


def query_and_grad(grid_values: jnp.ndarray, lower: jnp.ndarray,
                   spacing: jnp.ndarray, pts: jnp.ndarray):
    """Trilinear value AND analytic gradient from one 8-corner fetch —
    the contact-narrowphase primitive for baked grids (one gather pass vs
    seven for :func:`query` + central-difference :func:`grad`).

    Returns (phi (...,), normal (..., 3) unit).  Outside the grid the
    boundary value gets the conservative Euclidean push of :func:`query`
    and its direction joins the gradient.
    """
    dims = jnp.array(grid_values.shape, jnp.float32)
    g = (pts - lower) / spacing
    g_cl = jnp.clip(g, 0.0, dims - 1.000001)
    i0 = jnp.floor(g_cl).astype(jnp.int32)
    i0 = jnp.minimum(i0, jnp.array(grid_values.shape, jnp.int32) - 2)
    frac = g_cl - i0

    def gv(di, dj, dk):
        return grid_values[i0[..., 0] + di, i0[..., 1] + dj, i0[..., 2] + dk]

    v000, v100 = gv(0, 0, 0), gv(1, 0, 0)
    v010, v110 = gv(0, 1, 0), gv(1, 1, 0)
    v001, v101 = gv(0, 0, 1), gv(1, 0, 1)
    v011, v111 = gv(0, 1, 1), gv(1, 1, 1)
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]

    c00 = v000 * (1 - fx) + v100 * fx
    c10 = v010 * (1 - fx) + v110 * fx
    c01 = v001 * (1 - fx) + v101 * fx
    c11 = v011 * (1 - fx) + v111 * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    val = c0 * (1 - fz) + c1 * fz

    dx = (((v100 - v000) * (1 - fy) + (v110 - v010) * fy) * (1 - fz)
          + ((v101 - v001) * (1 - fy) + (v111 - v011) * fy) * fz)
    dy = ((c10 - c00) * (1 - fz) + (c11 - c01) * fz)
    dz = c1 - c0
    grad_in = jnp.stack([dx, dy, dz], axis=-1) / spacing

    out_vec = (g - g_cl) * spacing
    out_d = jnp.linalg.norm(out_vec, axis=-1)
    n = grad_in + out_vec / (out_d[..., None] + 1e-9) * (out_d[..., None] > 0)
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-9)
    return val + out_d, n


def grad(grid_values: jnp.ndarray, lower: jnp.ndarray, spacing: jnp.ndarray,
         pts: jnp.ndarray, eps: float | None = None) -> jnp.ndarray:
    """SDF gradient (outward normal direction) by central differences."""
    e = spacing * 0.5 if eps is None else eps
    def q(offset):
        return query(grid_values, lower, spacing, pts + offset)
    ex = jnp.array([1.0, 0, 0]) * e
    ey = jnp.array([0, 1.0, 0]) * e
    ez = jnp.array([0, 0, 1.0]) * e
    g = jnp.stack([
        q(ex) - q(-ex),
        q(ey) - q(-ey),
        q(ez) - q(-ez),
    ], axis=-1) / (2 * e)
    return g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-9)


def mesh_sdf_points(pts: jnp.ndarray, vertices, faces, chunk: int = 2048) -> jnp.ndarray:
    """Direct (no grid) signed distance of points to a mesh — the exact
    oracle used in tests to validate bake+query."""
    tris = jnp.asarray(vertices, jnp.float32)[np.asarray(faces)]
    return _sdf_points(pts, tris, chunk=chunk)
