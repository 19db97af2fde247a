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


_TAN10 = float(np.tan(np.deg2rad(10.0)))   # ±170° interval test slope
_TAN5 = float(np.tan(np.deg2rad(5.0)))     # ±175°
_COS120 = float(np.cos(np.deg2rad(120.0)))


def _rodrigues(u, cps, sps, v):
    """Rot(u, ψ) @ v for a batch of ψ: u (...,3), cps/sps (..., n_psi),
    v (..., 3) -> (..., n_psi, 3).  No 3x3 matrices materialized."""
    udv = jnp.sum(u * v, axis=-1)[..., None, None]
    uxv = jnp.cross(u, v)[..., None, :]
    return (v[..., None, :] * cps[..., None] + uxv * sps[..., None]
            + u[..., None, :] * udv * (1.0 - cps[..., None]))


def _spin_ok(x, y, slope):
    """|atan2(y, x)| <= pi - atan(slope): NOT inside the cone around ±pi."""
    return ~((x < 0.0) & (jnp.abs(y) <= -x * slope))


@partial(jax.jit, static_argnames=("n_psi",))
def ik_feasible(Ts: jnp.ndarray, n_psi: int = N_PSI,
                chunk: int = 8192) -> jnp.ndarray:
    """Branch-free IK-feasibility gate over poses (B, 4, 4) -> (B,) bool.
    Replaces the per-pose ikfast call inside ``filterGraspPose``
    (``common.cpp:214-226``).

    Exploits two structural facts to avoid materializing the (8·n_psi, 7)
    solution tensor of :func:`ik`:

    * the wrist rotation R47 = Ry(-q4)·R03ᵀ·R is independent of which
      shoulder ZYZ branch is taken (both decompose the same R03), so
      shoulder and wrist feasibility test independently;
    * a joint-limit check on a ZYZ angle needs no arctan: |b| ≤ 120° is
      ``r22 >= cos120°`` and |a| ≤ 170° is "atan2 operands not inside the
      10° cone around ±π" — sign/ratio comparisons on matrix elements.

    The ψ sweep is Rodrigues rotation of a handful of fixed vectors (pure
    VPU mul/add), giving O(n_psi) scalars per pose instead of O(n_psi)
    3x3 temporaries.  At the exact shoulder/wrist singularity (b≈0) the
    composite spin always splits within the ±170°(+±175°) limits, so the
    gate accepts — in principle slightly more complete than :func:`ik`'s
    conservative fold of the spin into joint 1, but measured agreement is
    EXACT: 0 disagreements in either direction over 12,288 sampled poses
    (6,144 FK-reachable + 6,144 workspace mix), see
    ``tests/test_ik_consistency.py``.
    """
    R = Ts[..., :3, :3]
    p = Ts[..., :3, 3]
    p_w = p - R[..., :, 2] * D_WF
    sw = p_w - jnp.array([0.0, 0.0, D_BS])
    d2 = jnp.sum(sw * sw, axis=-1)
    d_sw = jnp.sqrt(d2)

    cos_q4 = (d2 - D_SE**2 - D_EW**2) / (2 * D_SE * D_EW)
    reachable = jnp.abs(cos_q4) <= 1.0
    q4m = jnp.arccos(jnp.clip(cos_q4, -1.0, 1.0))
    elbow_ok = q4m <= JOINT_LIMITS[3]

    u = sw / jnp.maximum(d_sw, 1e-9)[..., None]
    psi = jnp.linspace(0.0, 2 * jnp.pi, n_psi, endpoint=False)
    cps, sps = jnp.cos(psi), jnp.sin(psi)
    cps = jnp.broadcast_to(cps, Ts.shape[:-2] + (n_psi,))
    sps = jnp.broadcast_to(sps, Ts.shape[:-2] + (n_psi,))

    rxy = jnp.sqrt(sw[..., 0] ** 2 + sw[..., 1] ** 2)
    q1_0 = jnp.arctan2(sw[..., 1], sw[..., 0])
    theta_sw = jnp.arctan2(rxy, sw[..., 2])

    e_z = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), u.shape)
    # Rot(u,-ψ) e_z and Rot(u,-ψ) R[:,2] are elbow-independent: hoist
    rot_neg_ez = _rodrigues(u, cps, -sps, e_z)          # (..., n_psi, 3)
    rot_neg_rz = _rodrigues(u, cps, -sps, R[..., :, 2])

    def per_elbow(q4):
        # reference shoulder config: R03_ref = Rz(q1_0) Ry(q2_0)
        vx = D_EW * jnp.sin(q4)
        vz = D_SE + D_EW * jnp.cos(q4)
        q2_0 = theta_sw - jnp.arctan2(vx, vz)
        c1, s1 = jnp.cos(q1_0), jnp.sin(q1_0)
        c2, s2 = jnp.cos(q2_0), jnp.sin(q2_0)

        def ref_apply(v, C1, S1, C2, S2):      # R03_ref @ v
            x = C2 * v[..., 0] + S2 * v[..., 2]
            z = -S2 * v[..., 0] + C2 * v[..., 2]
            return jnp.stack([C1 * x - S1 * v[..., 1],
                              S1 * x + C1 * v[..., 1], z], axis=-1)

        def ref_apply_T(v, C1, S1, C2, S2):    # R03_refᵀ @ v
            x = C1 * v[..., 0] + S1 * v[..., 1]
            y = -S1 * v[..., 0] + C1 * v[..., 1]
            return jnp.stack([C2 * x - S2 * v[..., 2], y,
                              S2 * x + C2 * v[..., 2]], axis=-1)

        # expanded coefficients broadcast against the n_psi axis
        C1, S1, C2, S2 = (a[..., None] for a in (c1, s1, c2, s2))

        # shoulder col2: R03 e_z = Rot(u,ψ) (R03_ref e_z)
        col2 = _rodrigues(u, cps, sps, ref_apply(e_z, c1, s1, c2, s2))
        # shoulder row2: R03ᵀ e_z = R03_refᵀ (Rot(u,-ψ) e_z)
        row2 = ref_apply_T(rot_neg_ez, C1, S1, C2, S2)
        r02, r12, r22 = col2[..., 0], col2[..., 1], col2[..., 2]
        r20, r21 = row2[..., 0], row2[..., 1]
        sh_b = r22 >= _COS120
        sh_1 = _spin_ok(r02, r12, _TAN10) & _spin_ok(-r20, r21, _TAN10)
        sh_2 = _spin_ok(-r02, -r12, _TAN10) & _spin_ok(r20, -r21, _TAN10)
        degen_s = r02**2 + r12**2 < 1e-14
        sh_ok = sh_b & (degen_s | sh_1 | sh_2)

        # wrist: R47 = Ry(-q4) R03ᵀ R; col2 needs wz = R03ᵀ R[:,2]
        c4, s4 = jnp.cos(q4), jnp.sin(q4)
        wz = ref_apply_T(rot_neg_rz, C1, S1, C2, S2)
        r02w = c4[..., None] * wz[..., 0] - s4[..., None] * wz[..., 2]
        r12w = wz[..., 1]
        r22w = s4[..., None] * wz[..., 0] + c4[..., None] * wz[..., 2]
        # row2 of R47: m = R03 (s4, 0, c4) (ψ-independent inner vector)
        mv = jnp.stack([s4, jnp.zeros_like(s4), c4], axis=-1)
        m = _rodrigues(u, cps, sps, ref_apply(mv, c1, s1, c2, s2))
        r20w = jnp.sum(m * R[..., None, :, 0], axis=-1)
        r21w = jnp.sum(m * R[..., None, :, 1], axis=-1)
        wr_b = r22w >= _COS120
        wr_1 = _spin_ok(r02w, r12w, _TAN10) & _spin_ok(-r20w, r21w, _TAN5)
        wr_2 = _spin_ok(-r02w, -r12w, _TAN10) & _spin_ok(r20w, -r21w, _TAN5)
        degen_w = r02w**2 + r12w**2 < 1e-14
        wr_ok = wr_b & (degen_w | wr_1 | wr_2)
        return jnp.any(sh_ok & wr_ok, axis=-1)

    ok = per_elbow(q4m) | per_elbow(-q4m)
    return ok & reachable & elbow_ok
