"""KUKA iiwa14 forward kinematics + analytic inverse kinematics, vmapped.

TPU-native replacement for the generated ikfast solver the reference binds
in ``ikfast_pybind/src/kuka_iiwa14`` and links into the grasp filter
(``my_cpp/common.cpp:9-72``).  Instead of porting 19k lines of branchy
generated C++, we exploit the iiwa's S-R-S (spherical-revolute-spherical)
structure: the 7-DoF redundancy is one scalar "arm angle" ψ; for each ψ the
remaining 6-DoF problem is closed-form with 8 discrete branches
(elbow ±, shoulder ±, wrist ±).  Sampling ψ on a static grid turns IK into a
fixed-shape batched computation: ``ik()`` maps one 4x4 pose to
``(8*N_PSI, 7)`` candidate solutions + validity mask, and vmaps over
thousands of poses (the reference calls IK once per grasp candidate in its
hot filter loop, ``common.cpp:214-226``).

Kinematic convention (standard iiwa14 dimensions):
  joints about  z   y   z    y   z   y   z
  shoulder S = (0,0,0.36); elbow E at +0.42 along upper arm;
  wrist W at +0.40 along forearm; flange F at +0.126 along wrist z.
  T_0F(q) = Tz(.36)·Rz(q1)Ry(q2)Rz(q3)·Tz(.42)·Ry(q4)·Tz(.40)·Rz(q5)Ry(q6)Rz(q7)·Tz(.126)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import transforms as tf

D_BS = 0.36
D_SE = 0.42
D_EW = 0.40
D_WF = 0.126

# Joint limits in radians (iiwa14 spec: ±170,±120,±170,±120,±170,±120,±175 deg)
JOINT_LIMITS = np.deg2rad(np.array([170.0, 120.0, 170.0, 120.0, 170.0, 120.0, 175.0]))
UPPER = jnp.asarray(JOINT_LIMITS)
LOWER = -UPPER

N_PSI = 32  # arm-angle grid; 8*N_PSI candidate solutions per pose


def _rz(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack([c, -s, z, s, c, z, z, z, o], axis=-1).reshape(jnp.shape(a) + (3, 3))


def _ry(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack([c, z, s, z, o, z, -s, z, c], axis=-1).reshape(jnp.shape(a) + (3, 3))


def fk(q: jnp.ndarray) -> jnp.ndarray:
    """Flange pose (4x4) for joint vector q (..., 7)."""
    return fk_frames(q)[-1]


def fk_frames(q: jnp.ndarray):
    """Key frames along the chain for q (..., 7):
    returns (T_S, T_E, T_W, T_F) each (..., 4, 4) — shoulder, elbow, wrist,
    flange.  Positions feed capsule collision checks in motion planning."""
    q1, q2, q3, q4, q5, q6, q7 = [q[..., i] for i in range(7)]
    batch = q.shape[:-1]
    eye_t = jnp.broadcast_to(jnp.zeros(3), batch + (3,))

    R03 = _rz(q1) @ _ry(q2) @ _rz(q3)
    p_s = jnp.broadcast_to(jnp.array([0.0, 0.0, D_BS]), batch + (3,))
    T_S = tf.pose_from_rt(R03, p_s)

    p_e = p_s + jnp.einsum("...ij,j->...i", R03, jnp.array([0.0, 0.0, D_SE]))
    R04 = R03 @ _ry(q4)
    T_E = tf.pose_from_rt(R04, p_e)

    p_w = p_e + jnp.einsum("...ij,j->...i", R04, jnp.array([0.0, 0.0, D_EW]))
    R07 = R04 @ _rz(q5) @ _ry(q6) @ _rz(q7)
    T_W = tf.pose_from_rt(R07, p_w)

    p_f = p_w + jnp.einsum("...ij,j->...i", R07, jnp.array([0.0, 0.0, D_WF]))
    T_F = tf.pose_from_rt(R07, p_f)
    return T_S, T_E, T_W, T_F


def _euler_zyz(R):
    """Both ZYZ decompositions of R: returns (a, b, c) with shape (..., 2).
    R = Rz(a) Ry(b) Rz(c).  Handles the b≈0 singularity by folding the spin
    into `a`."""
    r02, r12, r22 = R[..., 0, 2], R[..., 1, 2], R[..., 2, 2]
    r20, r21 = R[..., 2, 0], R[..., 2, 1]
    r00, r10 = R[..., 0, 0], R[..., 1, 0]
    sb = jnp.sqrt(jnp.clip(r02**2 + r12**2, 0.0, None))
    degen = sb < 1e-7

    # Degenerate fold a=atan2(r10,r00) is the b≈0 case only; b≈pi (r22≈-1)
    # is unreachable inside the ±120° joint-2 limit, so it is not handled.
    b1 = jnp.arctan2(sb, r22)
    a1 = jnp.where(degen, jnp.arctan2(r10, r00), jnp.arctan2(r12, r02))
    c1 = jnp.where(degen, 0.0, jnp.arctan2(r21, -r20))

    b2 = -b1
    a2 = jnp.where(degen, a1, jnp.arctan2(-r12, -r02))
    c2 = jnp.where(degen, c1, jnp.arctan2(-r21, r20))

    a = jnp.stack([a1, a2], axis=-1)
    b = jnp.stack([b1, b2], axis=-1)
    c = jnp.stack([c1, c2], axis=-1)
    return a, b, c


@partial(jax.jit, static_argnames=("n_psi",))
def ik(T: jnp.ndarray, n_psi: int = N_PSI):
    """All candidate joint solutions for flange pose T (4x4).

    Returns ``(q, valid)`` with q (8*n_psi, 7) and valid (8*n_psi,) bool
    (within joint limits AND position-exactly-solvable).  Branch layout:
    psi-grid x elbow± x shoulder± x wrist±.  vmap over poses for batches.
    Equivalent of ``get_ik_within_limits`` (``my_cpp/common.cpp:9-72``) —
    validity-mask ANY gives the IK-feasibility gate.
    """
    R = T[:3, :3]
    p = T[:3, 3]
    p_s = jnp.array([0.0, 0.0, D_BS])
    p_w = p - R @ jnp.array([0.0, 0.0, D_WF])
    sw = p_w - p_s
    d_sw = jnp.linalg.norm(sw)

    # --- elbow angle (2 branches) ------------------------------------------
    cos_q4 = (d_sw**2 - D_SE**2 - D_EW**2) / (2 * D_SE * D_EW)
    reachable = jnp.abs(cos_q4) <= 1.0
    q4_mag = jnp.arccos(jnp.clip(cos_q4, -1.0, 1.0))
    q4_branches = jnp.stack([q4_mag, -q4_mag])  # (2,)

    u_sw = sw / jnp.maximum(d_sw, 1e-9)

    psi = jnp.linspace(0.0, 2 * jnp.pi, n_psi, endpoint=False)

    def solve(q4, psi):
        # reference shoulder config (q3 = 0): Rz(q1)Ry(q2) v = sw,
        # v = elbow-to-wrist offset in the upper-arm frame
        v = jnp.array([D_EW * jnp.sin(q4), 0.0, D_SE + D_EW * jnp.cos(q4)])
        # v has zero y-component: v = (vx, 0, vz).
        # Rz(q1)Ry(q2) [vx,0,vz] = sw. Solve spherical angles:
        # In the q1-rotated frame: Ry(q2) v = (vx c2 + vz s2, 0, -vx s2 + vz c2)
        r_xy = jnp.sqrt(sw[0] ** 2 + sw[1] ** 2)
        q1_0 = jnp.arctan2(sw[1], sw[0])
        # polar angle of sw from +z vs polar angle of v from +z
        theta_sw = jnp.arctan2(r_xy, sw[2])
        theta_v = jnp.arctan2(v[0], v[2])
        q2_0 = theta_sw - theta_v
        R03_ref = _rz(q1_0) @ _ry(q2_0)

        # arm-angle rotation about the SW axis
        R_psi = tf.axis_angle_to_matrix(u_sw, psi)
        R03 = R_psi @ R03_ref

        # shoulder ZYZ (2 branches)
        a_s, b_s, c_s = _euler_zyz(R03)  # each (2,)

        def wrist(q123):
            q1, q2, q3 = q123
            R03b = _rz(q1) @ _ry(q2) @ _rz(q3)
            R47 = _ry(-q4) @ R03b.T @ R
            a_w, b_w, c_w = _euler_zyz(R47)  # (2,)
            # assemble 2 wrist branches
            qs = jnp.stack(
                [
                    jnp.stack([q1, q2, q3, q4, a_w[0], b_w[0], c_w[0]]),
                    jnp.stack([q1, q2, q3, q4, a_w[1], b_w[1], c_w[1]]),
                ]
            )  # (2,7)
            return qs

        q_sh = jnp.stack([a_s, b_s, c_s], axis=0).T  # (2,3)
        qs = jax.vmap(wrist)(q_sh)  # (2,2,7)
        return qs.reshape(4, 7)

    # (n_psi, 2 elbow, 4, 7)
    qs = jax.vmap(lambda ps: jax.vmap(lambda q4: solve(q4, ps))(q4_branches))(psi)
    qs = qs.reshape(-1, 7)  # (8*n_psi, 7)
    # wrap to [-pi, pi]
    qs = jnp.mod(qs + jnp.pi, 2 * jnp.pi) - jnp.pi

    within = jnp.all((qs <= UPPER[None]) & (qs >= LOWER[None]), axis=-1)
    valid = within & reachable
    return qs, valid


def ik_best(T: jnp.ndarray, q_ref: jnp.ndarray | None = None, n_psi: int = N_PSI):
    """Single best IK solution: valid candidate closest to ``q_ref``
    (or to zero).  Returns (q (7,), found bool)."""
    qs, valid = ik(T, n_psi)
    ref = jnp.zeros(7) if q_ref is None else q_ref
    cost = jnp.sum((qs - ref[None]) ** 2, axis=-1)
    cost = jnp.where(valid, cost, jnp.inf)
    i = jnp.argmin(cost)
    return qs[i], valid[i]


ik_batch = jax.vmap(ik, in_axes=(0, None))


def ik_feasible(Ts: jnp.ndarray, n_psi: int = N_PSI,
                chunk: int = 8192) -> jnp.ndarray:
    """Vectorized IK-feasibility gate over poses (B, 4, 4) -> (B,) bool.
    Replaces the per-pose ikfast call inside ``filterGraspPose``
    (``common.cpp:214-226``).

    Chunked with ``lax.map`` so the branch-expansion temporaries (8*n_psi
    candidate solutions per pose, each with a handful of 3x3 intermediates)
    stay bounded — unchunked, 100k+ poses exhaust HBM."""
    def gate(T):
        _, valid = ik(T, n_psi)
        return jnp.any(valid, axis=-1)

    return jax.lax.map(gate, Ts, batch_size=min(chunk, max(Ts.shape[0], 1)))
