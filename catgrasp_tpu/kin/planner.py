"""Arm motion planning: batched collision checking + RRT-connect.

Replaces the vendored ss-pybullet planners the reference actually exercises
(SURVEY.md P24): ``plan_joint_motion`` -> birrt (``rrt_connect.py:56-86``),
``plan_cartesian_motion_ikfast`` (``utils.py:4045-4110``), plus the
per-sample ``collision_fn``.

TPU split of labor: the tree bookkeeping (tiny, sequential) stays on host;
every collision query is a BATCH of configurations evaluated on device —
arm links as capsules against the scene point cloud, fully vectorized
(the reference calls FCL once per RRT sample; here one device call checks
hundreds of samples).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import transforms as tf
from . import iiwa

LINK_RADII = np.array([0.09, 0.07, 0.06, 0.05], dtype=np.float32)  # S-E, E-W, W-F, tool


@partial(jax.jit, static_argnames=())
def arm_capsule_points(q: jnp.ndarray, n_per_link: int = 6):
    """Capsule axis sample points along the arm for configs q (..., 7):
    returns (..., L, 3) points and per-point radius (L,)."""
    T_S, T_E, T_W, T_F = iiwa.fk_frames(q)
    anchors = jnp.stack([
        jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0]), T_S[..., :3, 3].shape),
        T_S[..., :3, 3], T_E[..., :3, 3], T_W[..., :3, 3], T_F[..., :3, 3],
    ], axis=-2)  # (..., 5, 3)
    a = anchors[..., :-1, :]
    b = anchors[..., 1:, :]
    ts = (jnp.arange(n_per_link) + 0.5) / n_per_link
    pts = a[..., :, None, :] * (1 - ts[:, None]) + b[..., :, None, :] * ts[:, None]
    radii = jnp.repeat(jnp.asarray(LINK_RADII), n_per_link)
    return pts.reshape(pts.shape[:-3] + (-1, 3)), radii


@jax.jit
def configs_collide(qs: jnp.ndarray, obstacle_pts: jnp.ndarray,
                    obstacle_mask: jnp.ndarray, floor_z: float = 0.0) -> jnp.ndarray:
    """Batched collision check: (B, 7) configs vs obstacle cloud (C, 3) in
    the robot base frame -> (B,) bool."""
    pts, radii = arm_capsule_points(qs)  # (B, L, 3)
    d2 = jnp.sum((pts[:, :, None, :] - obstacle_pts[None, None]) ** 2, axis=-1)
    d2 = jnp.where(obstacle_mask[None, None], d2, jnp.inf)
    hit_cloud = jnp.any(d2 < (radii[None, :, None] ** 2), axis=(1, 2))
    hit_floor = jnp.any(pts[..., 2] < floor_z + radii[None, :] * 0.5, axis=1)
    return hit_cloud | hit_floor


def _interp(a, b, n):
    ts = np.linspace(0.0, 1.0, n)[:, None]
    return a[None] * (1 - ts) + b[None] * ts


class RRTConnect:
    """Host-side RRT-connect over device-batched collision checks —
    semantics of ss-pybullet ``birrt``/``rrt_connect`` with smoothing."""

    def __init__(self, obstacle_pts: np.ndarray, obstacle_mask: np.ndarray | None = None,
                 step: float = 0.2, n_check: int = 8, seed: int = 0,
                 floor_z: float = -0.05):
        self.obs = jnp.asarray(obstacle_pts, jnp.float32)
        m = np.ones(len(obstacle_pts), bool) if obstacle_mask is None else obstacle_mask
        self.mask = jnp.asarray(m)
        self.step = step
        self.n_check = n_check
        self.floor_z = floor_z
        self.rng = np.random.default_rng(seed)

    def _free(self, qs: np.ndarray) -> np.ndarray:
        return ~np.asarray(configs_collide(jnp.asarray(qs, jnp.float32), self.obs,
                                           self.mask, self.floor_z))

    def edge_free(self, a: np.ndarray, b: np.ndarray) -> bool:
        return bool(self._free(_interp(a, b, self.n_check)).all())

    def plan(self, q_start: np.ndarray, q_goal: np.ndarray, max_iter: int = 200,
             smooth_iter: int = 30):
        """Returns a waypoint path (list of q) or None."""
        q_start = np.asarray(q_start, np.float32)
        q_goal = np.asarray(q_goal, np.float32)
        if not self._free(np.stack([q_start, q_goal])).all():
            return None
        if self.edge_free(q_start, q_goal):  # direct path (meta.py:7)
            return self._smooth([q_start, q_goal], smooth_iter)

        trees = [{0: (q_start, -1)}, {0: (q_goal, -1)}]

        def nearest(tree, q):
            ks = list(tree.keys())
            qs = np.stack([tree[k][0] for k in ks])
            i = int(np.argmin(np.linalg.norm(qs - q, axis=1)))
            return ks[i]

        def extend(tree, q_rand):
            k = nearest(tree, q_rand)
            q_near = tree[k][0]
            d = q_rand - q_near
            dist = np.linalg.norm(d)
            q_new = q_rand if dist <= self.step else q_near + d / dist * self.step
            if self.edge_free(q_near, q_new):
                nk = len(tree)
                tree[nk] = (q_new, k)
                return nk, q_new
            return None, None

        limits = iiwa.JOINT_LIMITS
        for it in range(max_iter):
            q_rand = self.rng.uniform(-limits, limits).astype(np.float32)
            ka, q_new = extend(trees[0], q_rand)
            if ka is not None:
                kb, q_conn = extend(trees[1], q_new)
                if kb is not None and np.allclose(q_conn, q_new, atol=1e-6) or (
                        kb is not None and self.edge_free(q_conn, q_new)):
                    path_a = self._trace(trees[0], ka)[::-1]
                    path_b = self._trace(trees[1], kb)
                    path = path_a + path_b
                    return self._smooth(path, smooth_iter)
            trees = trees[::-1]  # alternate
        return None

    @staticmethod
    def _trace(tree, k):
        out = []
        while k != -1:
            q, k = tree[k]
            out.append(q)
        return out

    def _smooth(self, path, iters):
        """Shortcut smoothing (ss-pybullet ``smoothing.py:27``)."""
        path = list(path)
        for _ in range(iters):
            if len(path) <= 2:
                break
            i, j = sorted(self.rng.choice(len(path), 2, replace=False))
            if j - i < 2:
                continue
            if self.edge_free(path[i], path[j]):
                path = path[: i + 1] + path[j:]
        return path


def plan_cartesian_waypoints(poses: np.ndarray, q_seed: np.ndarray | None = None,
                             n_psi: int = 32):
    """IK along a Cartesian pose path with continuity preference — the
    ``move_arm_catesian``/``plan_cartesian_motion_ikfast`` analog
    (``env.py:201``, ``utils.py:4045``).  Returns (qs (W,7), ok)."""
    qs_all, valid_all = iiwa.ik_batch(jnp.asarray(poses, jnp.float32), n_psi)
    qs_all = np.asarray(qs_all)
    valid_all = np.asarray(valid_all)
    out = []
    prev = np.zeros(7, np.float32) if q_seed is None else np.asarray(q_seed)
    for w in range(len(poses)):
        cand = qs_all[w][valid_all[w]]
        if len(cand) == 0:
            return None, False
        d = np.linalg.norm(cand - prev, axis=1)
        prev = cand[int(np.argmin(d))]
        out.append(prev)
    return np.stack(out), True
