"""Simulation data model: struct-of-arrays pytrees.

Replaces PyBullet's body registry (``pybullet_env/env_base.py``,
``utils_pybullet.py``) with static-shape arrays so whole scenes vmap and
shard: a scene is ``SceneState`` (dynamic) + ``SceneParams`` (per-body
constants) over a shared ``ShapeLib`` (per-shape geometry).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..geom import csg as csglib
from ..geom import sdf as sdflib
from ..geom.mesh import TriMesh

DENSITY = 7800.0  # steel-ish; reference objects are industrial metal parts


@struct.dataclass
class ShapeLib:
    """Library of K shapes (unit scale).  The contact engine evaluates
    geometry through the stacked analytic CSG trees (gather-free on TPU);
    optional baked SDF grids serve mesh-only workflows and validation.
    Per-body uniform scale applies at query time via φ_s(x) = s·φ(x/s)."""

    csg: csglib.CsgShape  # stacked, leading K axis
    surf_pts: jnp.ndarray  # (K, P, 3) contact sample points, body frame
    surf_normals: jnp.ndarray  # (K, P, 3)
    volume: jnp.ndarray  # (K,)
    inertia_unit: jnp.ndarray  # (K, 3) diagonal inertia at unit scale, unit density
    radius: jnp.ndarray  # (K,) bounding radius (broadphase)
    bounds: jnp.ndarray = None  # (K, 2, 3) unit-scale AABB (NUNOCS normalization)
    sdf_values: jnp.ndarray | None = None  # (K, D, D, D) optional grids
    sdf_lower: jnp.ndarray | None = None  # (K, 3)
    sdf_spacing: jnp.ndarray | None = None  # (K,)

    @property
    def num_shapes(self):
        return self.surf_pts.shape[0]


def build_shape_lib(meshes: list[TriMesh], csg_shapes: list[csglib.CsgShape] | None = None,
                    dims: int = 40, n_surf: int = 64, padding: float = 0.003,
                    seed: int = 0, bake_grids: bool = False) -> ShapeLib:
    """Build a ShapeLib from meshes (+ matching CSG trees).

    If ``csg_shapes`` is None, CSG trees are auto-fit as the bounding box of
    each mesh (coarse but engine-compatible for arbitrary assets)."""
    rng = np.random.default_rng(seed)
    values, lowers, spacings, pts, nrm, vols, inert, rad = [], [], [], [], [], [], [], []
    if csg_shapes is None:
        csg_shapes = []
        for m in meshes:
            b = m.bounds
            csg_shapes.append(csglib.csg_box(b[1] - b[0], center=(b[1] + b[0]) / 2))
    for m in meshes:
        if bake_grids:
            g = sdflib.bake_sdf(m.vertices, m.faces, dims=dims, padding=padding)
            values.append(g.values)
            lowers.append(g.lower)
            spacings.append(g.spacing)
        p, n = m.sample_surface(n_surf, rng, return_normals=True)
        pts.append(p)
        nrm.append(n)
        # volume via divergence theorem over triangles
        t = m.triangles
        vol = float(np.abs(np.einsum("fi,fi->f", t[:, 0], np.cross(t[:, 1], t[:, 2])).sum() / 6.0))
        vols.append(vol)
        # diagonal inertia approx from surface samples spread over the volume:
        # use point cloud second moments scaled to solid-body values.
        c = p.mean(axis=0)
        q = p - c
        # solid approximation: 3/5 factor maps shell moments toward solid
        sec = (q**2).mean(axis=0) * 0.6
        I = np.array([sec[1] + sec[2], sec[0] + sec[2], sec[0] + sec[1]]) * vol
        inert.append(I)
        rad.append(float(np.linalg.norm(m.vertices, axis=1).max()))
    return ShapeLib(
        csg=csglib.stack_shapes(csg_shapes),
        surf_pts=jnp.asarray(np.stack(pts)),
        surf_normals=jnp.asarray(np.stack(nrm)),
        volume=jnp.asarray(np.array(vols, dtype=np.float32)),
        inertia_unit=jnp.asarray(np.stack(inert).astype(np.float32)),
        radius=jnp.asarray(np.array(rad, dtype=np.float32)),
        bounds=jnp.asarray(np.stack([m.bounds for m in meshes]).astype(np.float32)),
        sdf_values=jnp.stack(values) if bake_grids else None,
        sdf_lower=jnp.stack(lowers) if bake_grids else None,
        sdf_spacing=jnp.stack(spacings) if bake_grids else None,
    )


@struct.dataclass
class SceneParams:
    """Per-body constants of one scene (N = max bodies, fixed)."""

    shape_id: jnp.ndarray  # (N,) int32
    scale: jnp.ndarray  # (N,) float
    mass: jnp.ndarray  # (N,)
    inertia: jnp.ndarray  # (N, 3) diagonal, body frame
    friction: jnp.ndarray  # (N,)

    @staticmethod
    def create(lib: ShapeLib, shape_id, scale=None, friction: float = 0.9,
               density: float = DENSITY):
        # friction default = the reference's pile-object lateralFriction 0.9
        # (``env.py:267``); grasp scoring overrides to 0.7
        # (``generate_grasp.py:39``)
        shape_id = jnp.asarray(shape_id, jnp.int32)
        n = shape_id.shape[0]
        scale = jnp.ones(n) if scale is None else jnp.asarray(scale)
        vol = lib.volume[shape_id] * scale**3
        mass = vol * density
        inertia = lib.inertia_unit[shape_id] * (scale**5)[:, None] * density
        return SceneParams(
            shape_id=shape_id,
            scale=scale,
            mass=mass,
            inertia=inertia,
            friction=jnp.full(n, friction),
        )


@struct.dataclass
class SceneState:
    """Dynamic state of one scene; vmap over a leading batch axis for B
    scenes (the TPU 'process parallelism' — SURVEY.md §2.3)."""

    pos: jnp.ndarray  # (N, 3)
    quat: jnp.ndarray  # (N, 4) wxyz
    linvel: jnp.ndarray  # (N, 3)
    angvel: jnp.ndarray  # (N, 3) world frame
    active: jnp.ndarray  # (N,) bool — inactive bodies are ignored entirely

    @staticmethod
    def create(n: int) -> "SceneState":
        return SceneState(
            pos=jnp.zeros((n, 3)),
            quat=jnp.zeros((n, 4)).at[:, 0].set(1.0),
            linvel=jnp.zeros((n, 3)),
            angvel=jnp.zeros((n, 3)),
            active=jnp.zeros((n,), bool),
        )
