"""Pinhole camera model and depth <-> point-cloud conversions.

TPU-native, batched replacements for ``Utils.py:239-251`` (depth2xyzmap) and
the intrinsics handling in ``pybullet_env/camera.py:25-45``.  The heavy
rendering itself lives in :mod:`catgrasp_tpu.render`.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Camera:
    """Intrinsics + image size.  ``K`` is the usual 3x3 pinhole matrix.

    Default values mirror the reference config (``config.yml:1-4``).
    """

    K: np.ndarray
    H: int = 1544
    W: int = 2064
    zfar: float = 3.0
    znear: float = 0.1

    @staticmethod
    def from_config(cfg: dict) -> "Camera":
        K = np.array(cfg["K"], dtype=np.float32).reshape(3, 3)
        return Camera(K=K, H=int(cfg["H"]), W=int(cfg["W"]), zfar=float(cfg.get("zfar", 3.0)))

    def scaled(self, factor: float) -> "Camera":
        """Downscale the camera (render at reduced resolution)."""
        K = self.K.copy().astype(np.float32)
        K[:2] *= factor
        return Camera(K=K, H=int(round(self.H * factor)), W=int(round(self.W * factor)), zfar=self.zfar, znear=self.znear)


def depth_to_xyzmap(depth: jnp.ndarray, K: jnp.ndarray, min_depth: float = 0.1) -> jnp.ndarray:
    """Back-project a depth image (..., H, W) into an organized xyz map
    (..., H, W, 3) in the camera frame. Invalid pixels (depth < min_depth)
    map to zero, matching ``Utils.py:239-251``.
    """
    H, W = depth.shape[-2], depth.shape[-1]
    vs = jnp.arange(H, dtype=depth.dtype)[:, None]
    us = jnp.arange(W, dtype=depth.dtype)[None, :]
    zs = depth
    xs = (us - K[0, 2]) * zs / K[0, 0]
    ys = (vs - K[1, 2]) * zs / K[1, 1]
    xyz = jnp.stack([xs, ys, zs], axis=-1)
    invalid = depth < min_depth
    return jnp.where(invalid[..., None], 0.0, xyz)


def pixel_rays(K: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Unit ray direction per pixel, (H, W, 3) in camera frame (+z forward)."""
    vs = jnp.arange(H, dtype=jnp.float32)[:, None]
    us = jnp.arange(W, dtype=jnp.float32)[None, :]
    xs = (us - K[0, 2]) / K[0, 0]
    ys = (vs - K[1, 2]) / K[1, 1]
    d = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def project_points(pts_cam: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Project camera-frame points (..., 3) to pixel coords (..., 2) = (u, v)."""
    z = jnp.maximum(pts_cam[..., 2:3], 1e-9)
    u = pts_cam[..., 0:1] / z * K[0, 0] + K[0, 2]
    v = pts_cam[..., 1:2] / z * K[1, 1] + K[1, 2]
    return jnp.concatenate([u, v], axis=-1)
