"""Batched SE(3) / similarity transform primitives.

TPU-native replacement for the reference's scattered pose math
(``Utils.py:173-290``, ``transformations.py`` usage, Eigen code in
``my_cpp/common.cpp:75-113``).  Everything here is pure jax.numpy, works on
arbitrary leading batch dimensions, and is safe under ``jit``/``vmap``.

Conventions
-----------
* Rotations are 3x3 matrices or quaternions in (w, x, y, z) order.
* Rigid poses are 4x4 homogeneous matrices ("pose") or (quat, pos) pairs.
* All angles are radians unless suffixed ``_deg``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------


def quat_identity(shape=()) -> jnp.ndarray:
    q = jnp.zeros(shape + (4,))
    return q.at[..., 0].set(1.0)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + eps)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b; rotation composition R(a) @ R(b)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., 3) by quaternions q (..., 4)."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-12)
    half = angle[..., None] * 0.5
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> quaternion (..., 4), branch-free.

    Uses the 4-candidate construction so it is stable for every sign pattern
    of the trace (safe under vmap/jit, no data-dependent control flow).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate quaternions (unnormalized), one per dominant component.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    diag = jnp.stack([tr, m00, m11, m22], axis=-1)
    case = jnp.argmax(diag, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 cases, 4)
    q = jnp.take_along_axis(cands, case[..., None, None].astype(jnp.int32).repeat(4, axis=-1), axis=-2)[..., 0, :]
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# 4x4 homogeneous poses
# ---------------------------------------------------------------------------


def pose_from_qt(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(quat, pos) -> 4x4 matrix, batched."""
    R = quat_to_matrix(q)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0]), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def quat_slerp(q0: jnp.ndarray, q1: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Shortest-arc spherical interpolation between unit quaternions,
    batched over leading axes of ``alpha``."""
    d = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where(d[..., None] < 0, -q1, q1)  # shortest arc
    d = jnp.abs(d).clip(0.0, 1.0)
    theta = jnp.arccos(d)
    s = jnp.sin(theta)
    # fall back to lerp near theta=0 (sin underflow)
    w0 = jnp.where(s > 1e-6, jnp.sin((1 - alpha) * theta) / jnp.where(s > 1e-6, s, 1.0), 1 - alpha)
    w1 = jnp.where(s > 1e-6, jnp.sin(alpha * theta) / jnp.where(s > 1e-6, s, 1.0), alpha)
    return quat_normalize(w0[..., None] * q0 + w1[..., None] * q1)


def interpolate_poses(T0: jnp.ndarray, T1: jnp.ndarray, alphas: jnp.ndarray) -> jnp.ndarray:
    """Waypoint poses between two 4x4 transforms: translation lerp +
    rotation slerp — the ``interpolate_poses_matrix`` analog
    (``ss-pybullet/pybullet_tools/utils.py:3925``).  alphas (K,) -> (K,4,4)."""
    q0 = matrix_to_quat(T0[:3, :3])
    q1 = matrix_to_quat(T1[:3, :3])
    q = quat_slerp(q0, q1, alphas)
    t = T0[:3, 3][None] * (1 - alphas[:, None]) + T1[:3, 3][None] * alphas[:, None]
    return pose_from_qt(q, t)


def pose_from_rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def pose_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Rigid inverse: [R t]⁻¹ = [Rᵀ -Rᵀt]. Not valid for scaled transforms."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t)
    return pose_from_rt(Rt, ti)


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply 4x4 transform(s) to points (..., N, 3)."""
    return jnp.einsum("...ij,...nj->...ni", T[..., :3, :3], pts) + T[..., None, :3, 3]


def transform_dirs(T: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...ij,...nj->...ni", T[..., :3, :3], dirs)


def to_homo(pts: jnp.ndarray) -> jnp.ndarray:
    """Append 1 to the last dimension (reference ``Utils.py:396``)."""
    return jnp.concatenate([pts, jnp.ones(pts.shape[:-1] + (1,))], axis=-1)


# ---------------------------------------------------------------------------
# Euler (static sxyz convention, matching transformations.euler_matrix)
# ---------------------------------------------------------------------------


def euler_matrix_sxyz(ax, ay, az) -> jnp.ndarray:
    """R = Rz(az) @ Ry(ay) @ Rx(ax): static x-y-z convention, 4x4 output.

    Matches ``transformations.euler_matrix(ax, ay, az, axes='sxyz')`` used
    throughout the reference (e.g. ``Utils.py:84``).
    """
    ax, ay, az = jnp.asarray(ax), jnp.asarray(ay), jnp.asarray(az)
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    R = jnp.stack(
        [
            cy * cz, sx * sy * cz - cx * sz, cx * sy * cz + sx * sz,
            cy * sz, sx * sy * sz + cx * cz, cx * sy * sz - sx * cz,
            -sy, sx * cy, cx * cy,
        ],
        axis=-1,
    ).reshape(jnp.shape(ax) + (3, 3))
    return pose_from_rt(R, jnp.zeros(jnp.shape(ax) + (3,)))


def rotation_x(a):
    return euler_matrix_sxyz(a, 0.0, 0.0)


def rotation_y(a):
    return euler_matrix_sxyz(0.0, a, 0.0)


def rotation_z(a):
    return euler_matrix_sxyz(0.0, 0.0, a)


def axis_angle_to_matrix(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula (3x3), replacing cv2.Rodrigues (``Utils.py:448``)."""
    return quat_to_matrix(quat_from_axis_angle(axis, angle))


# ---------------------------------------------------------------------------
# Misc pose utilities mirroring reference semantics
# ---------------------------------------------------------------------------


def normalize_rotation(T: jnp.ndarray) -> jnp.ndarray:
    """Divide out per-column scale, assuming no shear (``Utils.py:173``)."""
    scales = jnp.linalg.norm(T[..., :3, :3], axis=-2, keepdims=True)
    R = T[..., :3, :3] / (scales + 1e-15)
    out = T.at[..., :3, :3].set(R) if isinstance(T, jnp.ndarray) else T
    return out


def orthonormalize(R: jnp.ndarray) -> jnp.ndarray:
    """Closest rotation via SVD (reference uses JacobiSVD, common.cpp:104)."""
    u, _, vh = jnp.linalg.svd(R)
    Ro = u @ vh
    # Flip to det(+1).
    det = jnp.linalg.det(Ro)
    u = u.at[..., :, -1].multiply(jnp.where(det < 0, -1.0, 1.0)[..., None])
    return u @ vh


def geodesic_distance(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    """Angle between rotations (``Utils.py:255``)."""
    cos = (jnp.einsum("...ii->...", R1 @ jnp.swapaxes(R2, -1, -2)) - 1.0) / 2.0
    return jnp.arccos(jnp.clip(cos, -1.0, 1.0))


def direction_vec_to_rotation(direction: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Rotation R with R @ ref = direction, branch-free.

    Port of the semantics of ``Utils.py:262-290`` / ``common.cpp:75-113``
    (Rodrigues alignment of two unit vectors), written without data-dependent
    branches so it vmaps. The antiparallel case picks a stable perpendicular
    axis instead of the reference's fixed diag(1,-1,-1).
    """
    d = direction / (jnp.linalg.norm(direction, axis=-1, keepdims=True) + 1e-12)
    r = ref / (jnp.linalg.norm(ref, axis=-1, keepdims=True) + 1e-12)
    c = jnp.sum(d * r, axis=-1)  # cos angle
    axis = jnp.cross(r, d)  # rotate FROM ref TO direction
    s = jnp.linalg.norm(axis, axis=-1)
    # Fallback axis for the (anti)parallel case: any vector ⟂ r.
    helper = jnp.where(
        jnp.abs(r[..., :1]) < 0.9,
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), r.shape),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), r.shape),
    )
    perp = jnp.cross(r, helper)
    perp = perp / (jnp.linalg.norm(perp, axis=-1, keepdims=True) + 1e-12)
    degenerate = s < 1e-8
    safe_axis = jnp.where(degenerate[..., None], perp, axis / jnp.maximum(s, 1e-12)[..., None])
    angle = jnp.arctan2(s, c)
    angle = jnp.where(degenerate, jnp.where(c > 0, 0.0, jnp.pi), angle)
    return axis_angle_to_matrix(safe_axis, angle)


# ---------------------------------------------------------------------------
# Random pose perturbations (reference Utils.py:423-471)
# ---------------------------------------------------------------------------


def random_direction(key: jax.Array, shape=()) -> jnp.ndarray:
    """Uniform direction on the unit sphere (``Utils.py:423``)."""
    k1, k2 = jax.random.split(key)
    theta = jax.random.uniform(k1, shape, minval=0.0, maxval=2 * jnp.pi)
    z = jax.random.uniform(k2, shape, minval=-1.0, maxval=1.0)
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta), z], axis=-1)


def random_uniform_magnitude(key: jax.Array, max_t: float, max_r_deg: float, shape=()) -> jnp.ndarray:
    """Random SE(3) perturbation: uniform magnitude translation (≤ max_t)
    along a uniform direction and uniform-angle rotation (≤ max_r_deg) about a
    uniform axis.  Mirrors ``Utils.py:455-471`` (used by the perturbation
    score protocol, ``env_grasp.py:114``).
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    t_dir = random_direction(k1, shape)
    t_mag = jax.random.uniform(k2, shape, minval=0.0, maxval=max_t)
    t = t_dir * t_mag[..., None]
    r_dir = random_direction(k3, shape)
    r_mag = jax.random.uniform(k4, shape, minval=0.0, maxval=max_r_deg) * jnp.pi / 180.0
    R = axis_angle_to_matrix(r_dir, r_mag)
    return pose_from_rt(R, t)
