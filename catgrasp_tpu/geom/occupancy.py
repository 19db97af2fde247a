"""Occlusion-aware background densification from a depth scan.

Replaces ``my_cpp.makeOccupancyGridFromCloudScan`` (``common.cpp:324-431``):
the reference builds an octomap from the scan and ray-casts every voxel of
the scene AABB to mark voxels at or behind observed surfaces as occupied —
so the grasp filter treats occluded space as solid.

TPU formulation: no octree, no ray marching.  A camera-frame depth *image*
already encodes exactly that visibility function: a voxel center projected
to pixel (u, v) is occupied iff its ray depth >= observed depth(u, v) - pad.
One projection + one (small) image lookup per voxel, fully vectorized.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("grid_dims",))
def occupancy_from_depth(depth: jnp.ndarray, K: jnp.ndarray,
                         lower: jnp.ndarray, upper: jnp.ndarray,
                         grid_dims: tuple = (64, 64, 32), pad: float = 0.005):
    """Occupied-voxel mask over an AABB in the CAMERA frame.

    depth (H, W) metric, 0 = invalid; returns (centers (V, 3), occupied (V,))
    with V = prod(grid_dims) static.
    """
    H, W = depth.shape
    D1, D2, D3 = grid_dims
    gx = jnp.linspace(lower[0], upper[0], D1)
    gy = jnp.linspace(lower[1], upper[1], D2)
    gz = jnp.linspace(lower[2], upper[2], D3)
    X, Y, Z = jnp.meshgrid(gx, gy, gz, indexing="ij")
    centers = jnp.stack([X, Y, Z], axis=-1).reshape(-1, 3)

    z = jnp.maximum(centers[:, 2], 1e-6)
    u = jnp.clip((centers[:, 0] / z * K[0, 0] + K[0, 2]).astype(jnp.int32), 0, W - 1)
    v = jnp.clip((centers[:, 1] / z * K[1, 1] + K[1, 2]).astype(jnp.int32), 0, H - 1)
    d_obs = depth[v, u]
    occupied = (d_obs > 0) & (z >= d_obs - pad)
    return centers, occupied


def background_cloud_from_depth(depth: jnp.ndarray, K: jnp.ndarray,
                                seg: jnp.ndarray, target_id: int,
                                grid_dims: tuple = (64, 64, 32),
                                pad: float = 0.005,
                                center: jnp.ndarray | None = None,
                                reach: float = 0.12):
    """Collision cloud for grasp filtering around one target segment: all
    occupied voxels EXCEPT the target object's own surface — the
    ``compute_candidate_grasp_one_ob`` usage (``run_grasp_simulation.py:139``).

    The grid spans only the gripper-reachable AABB (``center ± reach``; the
    reference's octree is 0.5 mm leaves — a bin-wide coarse grid would
    quantize neighbors into the finger sweep and reject every grasp), so
    cells stay at millimetre scale with modest ``grid_dims``.

    Returns (points (V,3), mask (V,)) fixed-shape.
    """
    valid = depth > 0
    if center is None:
        lower = jnp.array([
            jnp.min(jnp.where(valid, _x_of(depth, K), jnp.inf)),
            jnp.min(jnp.where(valid, _y_of(depth, K), jnp.inf)),
            jnp.min(jnp.where(valid, depth, jnp.inf)),
        ])
        upper = jnp.array([
            jnp.max(jnp.where(valid, _x_of(depth, K), -jnp.inf)),
            jnp.max(jnp.where(valid, _y_of(depth, K), -jnp.inf)),
            jnp.max(jnp.where(valid, depth, -jnp.inf)),
        ]) + pad
        lower = lower - pad
    else:
        lower = center - reach
        upper = center + reach
    depth_bg = jnp.where(seg == target_id, 0.0, depth)
    centers, occ = occupancy_from_depth(depth_bg, K, lower, upper,
                                        grid_dims, pad)
    return centers, occ


def _x_of(depth, K):
    W = depth.shape[1]
    us = jnp.arange(W, dtype=depth.dtype)[None, :]
    return (us - K[0, 2]) * depth / K[0, 0]


def _y_of(depth, K):
    H = depth.shape[0]
    vs = jnp.arange(H, dtype=depth.dtype)[:, None]
    return (vs - K[1, 2]) * depth / K[1, 1]
