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

from ..geom import sdf as sdflib
from ..geom.mesh import TriMesh

DENSITY = 7800.0  # steel-ish; reference objects are industrial metal parts


@struct.dataclass
class ShapeLib:
    """Library of K baked shapes (unit scale).  All SDF grids share dims so
    they stack; per-body uniform scale is applied at query time via
    φ_s(x) = s·φ(x/s)."""

    sdf_values: jnp.ndarray  # (K, D, D, D)
    sdf_lower: jnp.ndarray  # (K, 3)
    sdf_spacing: jnp.ndarray  # (K,)
    surf_pts: jnp.ndarray  # (K, P, 3) contact sample points, body frame
    surf_normals: jnp.ndarray  # (K, P, 3)
    volume: jnp.ndarray  # (K,)
    inertia_unit: jnp.ndarray  # (K, 3) diagonal inertia at unit scale, unit density
    radius: jnp.ndarray  # (K,) bounding radius (broadphase)

    @property
    def num_shapes(self):
        return self.sdf_values.shape[0]


def build_shape_lib(meshes: list[TriMesh], dims: int = 40, n_surf: int = 64,
                    padding: float = 0.003, seed: int = 0) -> ShapeLib:
    """Bake meshes into a ShapeLib (runs once at setup, on device)."""
    rng = np.random.default_rng(seed)
    values, lowers, spacings, pts, nrm, vols, inert, rad = [], [], [], [], [], [], [], []
    for m in meshes:
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
        sdf_values=jnp.stack(values),
        sdf_lower=jnp.stack(lowers),
        sdf_spacing=jnp.stack(spacings),
        surf_pts=jnp.asarray(np.stack(pts)),
        surf_normals=jnp.asarray(np.stack(nrm)),
        volume=jnp.asarray(np.array(vols, dtype=np.float32)),
        inertia_unit=jnp.asarray(np.stack(inert).astype(np.float32)),
        radius=jnp.asarray(np.array(rad, dtype=np.float32)),
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
    def create(lib: ShapeLib, shape_id, scale=None, friction: float = 0.7,
               density: float = DENSITY):
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
