"""Grasp samplers — Darboux-frame cone sampler and NOCS-transfer sampler.

Rebuild of ``dexnet/grasping/grasp_sampler.py``:

* :class:`PointConeGraspSampler` (``grasp_sampler.py:155-298``): pick surface
  points, build a Darboux frame from the neighborhood normal covariance,
  augment with sphere directions within a 60° cone x in-plane rolls x
  approach depths, then run the batched pose filter.
* :class:`NocsTransferGraspSampler` (``grasp_sampler.py:302-356``): map a
  canonical grasp codebook through the estimated NUNOCS pose (with symmetry
  expansion) and filter.
* :class:`CombinedGraspSampler` concatenates sampler outputs
  (``grasp_sampler.py:360-370``).

The reference loops in Python per surface point with a cKDTree; here the
whole candidate tensor (points x dirs x rolls x depths) is built in one
vectorized pass — candidate counts are static, rejection is by mask.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import transforms as tf
from ..core.sampling import cone_directions
from .filter import filter_grasp_poses
from .gripper import Gripper


def darboux_frames(points: jnp.ndarray, normals: jnp.ndarray,
                   sample_ids: jnp.ndarray, r_ball: float) -> jnp.ndarray:
    """Grasp reference frame per sampled surface point: (M, 3, 3) with
    columns [approach, major, minor].

    Follows ``sample_one_surface_point`` (``grasp_sampler.py:225-298``):
    approach = -normal; minor axis = smallest-eigenvalue direction of the
    neighborhood normal covariance M = Σ n nᵀ (within r_ball), orthogonalized
    against the approach; major = minor x approach.
    """
    p_sel = points[sample_ids]  # (M,3)
    n_sel = normals[sample_ids]
    d2 = jnp.sum((p_sel[:, None, :] - points[None]) ** 2, axis=-1)  # (M,N)
    w = (d2 <= r_ball * r_ball).astype(points.dtype)
    Mcov = jnp.einsum("mn,ni,nj->mij", w, normals, normals)

    # smallest eigvec of symmetric 3x3 — eigh is fine at M ~ hundreds
    eigval, eigvec = jnp.linalg.eigh(Mcov)
    minor = eigvec[..., 0]  # ascending order -> first column

    approach = -n_sel
    approach = approach / (jnp.linalg.norm(approach, axis=-1, keepdims=True) + 1e-12)
    # project out approach component (Gram-Schmidt, grasp_sampler.py:251-257)
    proj = jnp.sum(approach * minor, axis=-1, keepdims=True) * approach
    minor = minor - proj
    minor = minor / (jnp.linalg.norm(minor, axis=-1, keepdims=True) + 1e-12)
    major = jnp.cross(minor, approach)
    major = major / (jnp.linalg.norm(major, axis=-1, keepdims=True) + 1e-12)
    return jnp.stack([approach, major, minor], axis=-1)


@partial(jax.jit, static_argnames=("init_bite", "hand_depth", "approach_step",
                                   "n_dirs", "n_inplane", "n_depths"))
def augment_grasp_poses(R0: jnp.ndarray, surface_pts: jnp.ndarray,
                        sphere_dirs: jnp.ndarray, init_bite: float,
                        hand_depth: float, approach_step: float,
                        n_dirs: int, n_inplane: int = 6, n_depths: int = 0) -> jnp.ndarray:
    """Candidate pose tensor from base frames: (M, 1 + n_dirs*n_inplane,
    n_depths, 4, 4) flattened to (M * R * D, 4, 4).

    Port of ``augmentGraspPoses`` (``common.cpp:116-153``) /
    ``grasp_sampler.py:269-290``: rotations = R0 plus R0 @ R_sphere(dir) @
    R_inplane(k*30°); centers walk the approach axis from init_bite by
    approach_step over hand_depth.
    """
    M = R0.shape[0]
    if n_depths == 0:
        n_depths = max(int(np.floor(hand_depth / approach_step)), 1)

    R_sph = tf.direction_vec_to_rotation(
        sphere_dirs, jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), sphere_dirs.shape)
    )  # (n_dirs,3,3)
    rolls = jnp.arange(n_inplane) * (jnp.pi / n_inplane)  # 0..180° step 180/n (grasp_sampler.py:274)
    cr, sr = jnp.cos(rolls), jnp.sin(rolls)
    R_roll = jnp.zeros((n_inplane, 3, 3))
    R_roll = R_roll.at[:, 0, 0].set(1.0)
    R_roll = R_roll.at[:, 1, 1].set(cr).at[:, 1, 2].set(-sr)
    R_roll = R_roll.at[:, 2, 1].set(sr).at[:, 2, 2].set(cr)

    R_aug = jnp.einsum("dij,rjk->drik", R_sph, R_roll).reshape(-1, 3, 3)  # (n_dirs*n_inplane,3,3)
    Rs = jnp.einsum("mij,ajk->maik", R0, R_aug)  # (M, A, 3, 3)
    Rs = jnp.concatenate([R0[:, None], Rs], axis=1)  # + identity augment

    # reference semantics (common.cpp:142-144): the FINGERTIP plane advances
    # from init_bite short of the surface point to hand_depth past it.  Our
    # grasp-frame origin is the finger ROOT (tips at +hand_depth), so the
    # origin depth is tip depth minus hand_depth — without this shift the
    # sweep only produced fully-engulfed poses (tips 45-90 mm past the
    # surface), which bury the fingers through the floor for every top-down
    # pinch of a low-profile part.
    depths = init_bite - hand_depth + jnp.arange(n_depths) * approach_step  # (D,)
    approach = Rs[..., :, 0]  # (M, A+1, 3)
    centers = (surface_pts[:, None, None, :]
               + approach[:, :, None, :] * depths[None, None, :, None])  # (M,A+1,D,3)
    R_full = jnp.broadcast_to(Rs[:, :, None], centers.shape[:-1] + (3, 3))
    T = tf.pose_from_rt(R_full, centers)
    return T.reshape(-1, 4, 4)


@dataclass
class PointConeGraspSampler:
    """Surface-point cone sampler (``grasp_sampler.py:155``)."""

    gripper: Gripper
    max_num_samples: int = 100
    n_sphere_dir: int = 30  # config_run.yml cone_grasp_smapler_n_sphere_dir
    approach_step: float = 0.003
    n_inplane: int = 6
    cone_half_angle: float = 60.0

    def sample_grasp_poses(self, key, points, normals, r_ball=None):
        """Candidate poses (object/camera frame of `points`), unfiltered."""
        points = jnp.asarray(points, jnp.float32)
        normals = jnp.asarray(normals, jnp.float32)
        n = points.shape[0]
        k1, k2 = jax.random.split(key)
        m = min(self.max_num_samples, n)
        sample_ids = jax.random.choice(k1, n, (m,), replace=False)
        if r_ball is None:
            # cloud resolution * 3 (grasp_sampler.py:161); estimate via
            # median nearest-neighbor distance on a subsample
            sub = points[jax.random.choice(k2, n, (min(128, n),), replace=False)]
            d2 = jnp.sum((sub[:, None] - points[None]) ** 2, axis=-1)
            d2 = jnp.where(d2 < 1e-12, jnp.inf, d2)
            r_ball = 3.0 * jnp.median(jnp.sqrt(jnp.min(d2, axis=-1)))

        R0 = darboux_frames(points, normals, sample_ids, r_ball)
        dirs = cone_directions(max(self.n_sphere_dir * 4, 100), self.cone_half_angle)
        if len(dirs) > self.n_sphere_dir:
            idx = np.random.default_rng(0).choice(len(dirs), self.n_sphere_dir, replace=False)
            dirs = dirs[idx]
        return augment_grasp_poses(
            R0, points[sample_ids], jnp.asarray(dirs),
            float(self.gripper.init_bite), float(self.gripper.hand_depth),
            float(self.approach_step), n_dirs=len(dirs), n_inplane=self.n_inplane,
        )

    def sample_grasps(self, key, points, normals, background_cloud, background_mask,
                      cam_in_world=None, nocs_pose=None, filter_ik=True,
                      center_ob_between_gripper=False, **filter_kw):
        """Full pipeline: sample + augment + filter.  Returns (poses (K,4,4)
        in camera frame, valid mask, stats) with static K."""
        poses = self.sample_grasp_poses(key, points, normals)
        if center_ob_between_gripper:
            poses = center_object_between_fingers(poses, jnp.asarray(points))
        nocs_pose = jnp.eye(4) if nocs_pose is None else nocs_pose
        cam_in_world = jnp.eye(4) if cam_in_world is None else cam_in_world
        pts = jnp.asarray(points)
        return filter_grasp_poses(
            poses, jnp.eye(4)[None], nocs_pose, cam_in_world,
            jnp.asarray(self.gripper.ee_in_grasp),
            pts, jnp.asarray(background_cloud),
            jnp.ones(pts.shape[0], bool), jnp.asarray(background_mask),
            spec=self.gripper.spec, filter_ik=filter_ik, **filter_kw,
        )


def center_object_between_fingers(poses: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Shift each grasp along its closing axis so the object cloud is
    centered between the fingers (``grasp_sampler.py:194-202``)."""

    def one(T):
        pts_g = tf.transform_points(tf.pose_inverse(T), points)
        c = (jnp.max(pts_g[:, 1]) + jnp.min(pts_g[:, 1])) / 2
        return T.at[:3, 3].add(T[:3, 1] * c)

    return jax.lax.map(one, poses, batch_size=256)


@dataclass
class NocsTransferGraspSampler:
    """Map the canonical grasp codebook into the scene via the estimated
    9D NUNOCS pose (``grasp_sampler.py:302-356``)."""

    gripper: Gripper
    canonical_grasps: np.ndarray  # (K, 4, 4) grasp poses in canonical frame
    canonical_scores: np.ndarray  # (K,) perturbation scores
    score_larger_than: float = 0.0
    max_n_grasp: int | None = None
    center_ob_between_gripper: bool = False

    def __post_init__(self):
        keep = self.canonical_scores >= self.score_larger_than
        g, s = self.canonical_grasps[keep], self.canonical_scores[keep]
        if self.max_n_grasp is not None and len(g) > self.max_n_grasp:
            order = np.argsort(-s)[: self.max_n_grasp]
            g, s = g[order], s[order]
        if self.center_ob_between_gripper:
            # zero the object-in-grasp lateral offset (grasp_sampler.py:318-325)
            for i in range(len(g)):
                ob_in_grasp = np.linalg.inv(g[i])
                ob_in_grasp[1, 3] = 0.0
                g[i] = np.linalg.inv(ob_in_grasp)
        self.canonical_grasps, self.canonical_scores = g, s

    def sample_grasps(self, nocs_pose, symmetry_tfs, background_cloud, background_mask,
                      collision_cloud, collision_mask, cam_in_world=None,
                      filter_ik=True, filter_approach=False, **filter_kw):
        cam_in_world = jnp.eye(4) if cam_in_world is None else cam_in_world
        return filter_grasp_poses(
            jnp.asarray(self.canonical_grasps), jnp.asarray(symmetry_tfs),
            jnp.asarray(nocs_pose), cam_in_world,
            jnp.asarray(self.gripper.ee_in_grasp),
            jnp.asarray(collision_cloud), jnp.asarray(background_cloud),
            jnp.asarray(collision_mask), jnp.asarray(background_mask),
            spec=self.gripper.spec, filter_ik=filter_ik,
            filter_approach=filter_approach, **filter_kw,
        )


@dataclass
class CombinedGraspSampler:
    """Concatenate several samplers' outputs (``grasp_sampler.py:360-370``)."""

    samplers: list

    def sample_grasps(self, **kwargs):
        outs = [s.sample_grasps(**kwargs) for s in self.samplers]
        poses = jnp.concatenate([o[0] for o in outs])
        valid = jnp.concatenate([o[1] for o in outs])
        stats = [o[2] for o in outs]
        return poses, valid, stats
