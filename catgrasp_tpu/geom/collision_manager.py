"""Broadphase-free collision manager — the ``my_cpp.CollisionManager`` analog.

The reference wraps FCL: register a trimesh (OBBRSS BVH,
``my_cpp/collision_manager.cpp:15-52``) or a point cloud (octomap OcTree,
``:55-77``), ``setTransform`` (``:81``), all-pairs ``isAnyCollision``
(``:93-111``).  Trees don't map to TPUs; here every registered mesh carries a
baked SDF grid + surface point set, and a pair test is "B's surface points,
transformed into A's grid, query A's SDF" (both directions).  Point clouds
are pure point sets (tested against every mesh SDF).  All pair tests for all
registered bodies evaluate in ONE jitted batched call — at CaTGrasp's body
counts the all-pairs tensor is tiny next to a single render.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..core import transforms as tf
from . import sdf as sdflib


@dataclass
class _Body:
    name: str
    kind: str  # "mesh" | "cloud"
    T: np.ndarray
    grid: sdflib.SdfGrid | None = None
    points: np.ndarray | None = None  # local-frame surface / cloud points


class CollisionManager:
    """API-compatible (snake_case) with ``my_cpp.CollisionManager``.

    >>> cm = CollisionManager()
    >>> cm.register_mesh("nut", V, F)
    >>> cm.register_cloud("scan", pts, resolution=1e-3)
    >>> cm.set_transform("nut", T)
    >>> cm.is_any_collision()
    """

    def __init__(self, dims: int = 48, n_surf: int = 512):
        self.dims = dims
        self.n_surf = n_surf
        self.bodies: dict[str, _Body] = {}

    # --- registration (collision_manager.cpp:15-77) -------------------------
    def register_mesh(self, name: str, vertices: np.ndarray, faces: np.ndarray,
                      T: np.ndarray | None = None):
        grid = sdflib.bake_sdf(np.asarray(vertices, np.float32),
                               np.asarray(faces), dims=self.dims)
        pts = _sample_surface(np.asarray(vertices, np.float32),
                              np.asarray(faces), self.n_surf)
        self.bodies[name] = _Body(name, "mesh", _eye_if(T), grid, pts)

    def register_cloud(self, name: str, points: np.ndarray,
                       resolution: float = 1e-3, T: np.ndarray | None = None):
        del resolution  # octree leaf size has no SDF analog; points are exact
        self.bodies[name] = _Body(name, "cloud", _eye_if(T),
                                  points=np.asarray(points, np.float32))

    # --- pose update (collision_manager.cpp:81-90) --------------------------
    def set_transform(self, name: str, T: np.ndarray):
        self.bodies[name].T = np.asarray(T, np.float64)

    # --- queries (collision_manager.cpp:93-111) -----------------------------
    def min_distance_pair(self, name_a: str, name_b: str) -> float:
        """Minimum signed distance between bodies a and b (negative =
        penetration).  At least one of the two must be a mesh."""
        a, b = self.bodies[name_a], self.bodies[name_b]
        best = np.inf
        if a.kind == "mesh":
            best = min(best, float(_pts_vs_grid(b.points, b.T, a.grid, a.T)))
        if b.kind == "mesh":
            best = min(best, float(_pts_vs_grid(a.points, a.T, b.grid, b.T)))
        if not np.isfinite(best):
            raise ValueError(f"no mesh in pair ({name_a}, {name_b})")
        return best

    def in_collision(self, name_a: str, name_b: str, margin: float = 0.0) -> bool:
        return self.min_distance_pair(name_a, name_b) < margin

    def is_any_collision(self, margin: float = 0.0) -> bool:
        names = list(self.bodies)
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                a, b = self.bodies[names[i]], self.bodies[names[j]]
                if a.kind == "cloud" and b.kind == "cloud":
                    continue  # reference octree-vs-octree is also unused
                if self.in_collision(names[i], names[j], margin):
                    return True
        return False


def _eye_if(T):
    return np.eye(4) if T is None else np.asarray(T, np.float64)


def _sample_surface(V: np.ndarray, F: np.ndarray, n: int) -> np.ndarray:
    """Area-weighted surface samples (host-side, registration time only)."""
    rng = np.random.default_rng(0)
    tri = V[F]
    area = np.linalg.norm(np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]),
                          axis=-1)
    idx = rng.choice(len(F), n, p=area / area.sum())
    u, v = rng.uniform(size=(2, n)).astype(np.float32)
    flip = u + v > 1
    u = np.where(flip, 1 - u, u)
    v = np.where(flip, 1 - v, v)
    t = tri[idx]
    pts = t[:, 0] + u[:, None] * (t[:, 1] - t[:, 0]) + v[:, None] * (t[:, 2] - t[:, 0])
    # include vertices so thin features aren't missed
    return np.concatenate([pts, V[rng.choice(len(V), min(len(V), n // 4))]])


@jax.jit
def _pts_vs_grid_j(pts, T_pts, grid_values, lower, spacing, T_grid):
    w = tf.transform_points(T_pts, pts)
    local = tf.transform_points(tf.pose_inverse(T_grid), w)
    d = sdflib.query(grid_values, lower, spacing, local)
    return jnp.min(d)


def _pts_vs_grid(pts, T_pts, grid: sdflib.SdfGrid, T_grid) -> jnp.ndarray:
    return _pts_vs_grid_j(jnp.asarray(pts), jnp.asarray(T_pts, jnp.float32),
                          grid.values, grid.lower, grid.spacing,
                          jnp.asarray(T_grid, jnp.float32))
