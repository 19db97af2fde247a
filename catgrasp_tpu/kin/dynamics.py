"""Articulated rigid-body dynamics for the iiwa14 — joint-space RNEA, jit.

The reference arm is a PyBullet articulated body driven by
``p.setJointMotorControl2(..., POSITION_CONTROL, force=...)`` (force-limited
PD toward a position target; ``pybullet_env/env.py:60``,
``ss-pybullet/pybullet_tools/utils.py`` control helpers).  This module gives
the TPU build the same capability without a C++ physics engine: recursive
Newton-Euler inverse dynamics over the 7-joint serial chain (unrolled —
7 static iterations, no data-dependent control flow), the mass matrix by
unit-acceleration RNEA columns, and a semi-implicit-Euler forward rollout
under force-limited PD control as one ``lax.scan``.

Everything is batch-friendly: ``rnea`` / ``mass_matrix`` / ``forward_step``
vmap over leading axes, so a whole fleet of arms integrates as one program.

The kinematic chain reproduces :mod:`catgrasp_tpu.kin.iiwa` exactly (same
composite transform; ``test_dynamics.py`` pins FK agreement).  Inertial
parameters are the published KUKA LBR iiwa 14 R820 values (link masses,
approximate COM offsets, diagonal rotational inertia); the reference repo
does not ship its URDF (``env.py:60`` loads from an external path), so
tests assert physical invariants (energy conservation, passivity, M(q)
SPD, RNEA/CRBA consistency, PD tracking under gravity), not URDF numbers.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import iiwa

# chain: translation (in parent frame) to each joint origin, then rotation
# about the joint axis.  Composite equals iiwa.fk's
# Tz(.36) Rz Ry Rz Tz(.42) Ry Tz(.40) Rz Ry Rz Tz(.126).
_TRANS = np.array([
    [0.0, 0.0, iiwa.D_BS],
    [0.0, 0.0, 0.0],
    [0.0, 0.0, 0.0],
    [0.0, 0.0, iiwa.D_SE],
    [0.0, 0.0, iiwa.D_EW],
    [0.0, 0.0, 0.0],
    [0.0, 0.0, 0.0],
])
_AXES = np.array([
    [0.0, 0.0, 1.0],
    [0.0, 1.0, 0.0],
    [0.0, 0.0, 1.0],
    [0.0, 1.0, 0.0],
    [0.0, 0.0, 1.0],
    [0.0, 1.0, 0.0],
    [0.0, 0.0, 1.0],
])
_FLANGE = np.array([0.0, 0.0, iiwa.D_WF])

# published iiwa14 link masses (kg); COMs placed along the chain (joint-i
# frame), diagonal inertia ~ m * r^2 with r ~ link envelope
MASSES = np.array([5.76, 6.35, 3.5, 3.5, 3.5, 1.8, 1.3])
_COMS = np.array([
    [0.0, -0.03, -0.12],
    [0.0, 0.04, 0.10],
    [0.0, 0.03, 0.27],
    [0.0, -0.03, 0.10],
    [0.0, -0.02, 0.22],
    [0.0, 0.0, 0.03],
    [0.0, 0.0, 0.06],
])
_INERTIA_DIAG = np.array([
    [0.033, 0.033, 0.012],
    [0.031, 0.031, 0.010],
    [0.025, 0.025, 0.008],
    [0.017, 0.017, 0.006],
    [0.010, 0.010, 0.003],
    [0.005, 0.005, 0.002],
    [0.001, 0.001, 0.001],
])
# iiwa14 rated joint torques (N*m, KUKA spec sheet)
TORQUE_LIMITS = np.array([320.0, 320.0, 176.0, 176.0, 110.0, 40.0, 40.0])
GRAVITY = np.array([0.0, 0.0, -9.81])


def _axis_rot(axis: np.ndarray, q):
    """Rotation about a fixed coordinate axis (axis is one-hot z or y)."""
    return iiwa._rz(q) if axis[2] else iiwa._ry(q)


def chain_frames(q: jnp.ndarray):
    """World rotation, joint origin, world axis, world COM per joint:
    4 arrays of shape (7, ...) stacked along a leading joint axis."""
    R = jnp.eye(3)
    p = jnp.zeros(3)
    Rs, ps, axs, cs = [], [], [], []
    for i in range(7):
        p = p + R @ jnp.asarray(_TRANS[i])
        R = R @ _axis_rot(_AXES[i], q[i])
        Rs.append(R)
        ps.append(p)
        axs.append(R @ jnp.asarray(_AXES[i]))
        cs.append(p + R @ jnp.asarray(_COMS[i]))
    return (jnp.stack(Rs), jnp.stack(ps), jnp.stack(axs), jnp.stack(cs))


def fk_flange(q: jnp.ndarray) -> jnp.ndarray:
    """Flange pose from the dynamics chain — must equal ``iiwa.fk``."""
    R, p, _, _ = chain_frames(q)
    T = jnp.eye(4)
    T = T.at[:3, :3].set(R[-1])
    return T.at[:3, 3].set(p[-1] + R[-1] @ jnp.asarray(_FLANGE))


def rnea(q: jnp.ndarray, qd: jnp.ndarray, qdd: jnp.ndarray,
         gravity: jnp.ndarray | None = None) -> jnp.ndarray:
    """Inverse dynamics: joint torques realizing (q, qd, qdd) under
    ``gravity``.  World-frame recursive Newton-Euler, 7 unrolled steps."""
    g = jnp.asarray(GRAVITY if gravity is None else gravity)
    R, p, ax, pc = chain_frames(q)

    # forward pass: velocities/accelerations of joint frames
    w = jnp.zeros(3)
    dw = jnp.zeros(3)
    a_o = -g  # joint-origin linear acceleration, gravity folded in
    ws, dws, acs = [], [], []
    p_prev = jnp.zeros(3)
    for i in range(7):
        r = p[i] - p_prev
        a_o = a_o + jnp.cross(dw, r) + jnp.cross(w, jnp.cross(w, r))
        dw = dw + ax[i] * qdd[i] + jnp.cross(w, ax[i]) * qd[i]
        w = w + ax[i] * qd[i]
        rc = pc[i] - p[i]
        a_c = a_o + jnp.cross(dw, rc) + jnp.cross(w, jnp.cross(w, rc))
        ws.append(w)
        dws.append(dw)
        acs.append(a_c)
        p_prev = p[i]

    # backward pass: forces/moments, project onto joint axes
    F = jnp.zeros(3)
    N = jnp.zeros(3)
    tau = [None] * 7
    for i in range(6, -1, -1):
        I_w = R[i] @ jnp.diag(jnp.asarray(_INERTIA_DIAG[i])) @ R[i].T
        f_i = MASSES[i] * acs[i]
        n_i = I_w @ dws[i] + jnp.cross(ws[i], I_w @ ws[i])
        # moments about joint-i origin
        N = (n_i + N + jnp.cross(pc[i] - p[i], f_i)
             + (jnp.cross(p[i + 1] - p[i], F) if i < 6 else jnp.zeros(3)))
        F = F + f_i
        tau[i] = jnp.dot(ax[i], N)
    return jnp.stack(tau)


def bias_forces(q, qd, gravity=None):
    """C(q, qd) qd + g(q)."""
    return rnea(q, qd, jnp.zeros(7), gravity)


def mass_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """M(q) via unit-acceleration RNEA columns (zero gravity, zero qd)."""
    cols = jax.vmap(lambda e: rnea(q, jnp.zeros(7), e, jnp.zeros(3)))(
        jnp.eye(7))
    return cols.T


def forward_dynamics(q, qd, tau, gravity=None):
    """qdd = M(q)^-1 (tau - bias)."""
    M = mass_matrix(q)
    b = bias_forces(q, qd, gravity)
    return jnp.linalg.solve(M, tau - b)


def pd_torque(q, qd, q_des, qd_des=None, kp=600.0, kd=50.0,
              tau_max: jnp.ndarray | None = None):
    """Force-limited PD positional servo — PyBullet POSITION_CONTROL with
    ``force=`` semantics (clamped output torque)."""
    qd_des = jnp.zeros(7) if qd_des is None else qd_des
    tau = kp * (q_des - q) + kd * (qd_des - qd)
    lim = jnp.asarray(TORQUE_LIMITS if tau_max is None else tau_max)
    return jnp.clip(tau, -lim, lim)


@partial(jax.jit, static_argnames=("substeps", "gravity_comp"))
def track_schedule(q0: jnp.ndarray, q_des_traj: jnp.ndarray,
                   dt: float = 1.0 / 60, substeps: int = 8,
                   kp: float = 400.0, kd: float = 36.0,
                   tau_max: jnp.ndarray | None = None,
                   joint_damping: float = 0.0,
                   gravity_comp: bool = True):
    """Integrate force-limited PD tracking of a waypoint schedule.

    (T, 7) targets at ``dt`` spacing -> (T, 7) achieved joint positions +
    (T, 7) applied torques.  Semi-implicit Euler at ``dt/substeps``; this is
    the dynamic analog of the kinematic schedule playback in
    :mod:`catgrasp_tpu.sim.arm` (reference: stepped position control,
    ``pybullet_env/env.py:299-344``).  ``gravity_comp`` adds the static
    gravity torque feed-forward (PyBullet's constraint-based
    POSITION_CONTROL servo is effectively infinitely stiff against gravity;
    plain PD would sag by g/kp); the torque limit applies to the TOTAL
    commanded torque, so saturation still overrides compensation."""
    h = dt / substeps
    lim = jnp.asarray(TORQUE_LIMITS if tau_max is None else tau_max)

    def waypoint(carry, q_des):
        q, qd = carry

        def sub(carry, _):
            q, qd = carry
            # inertia-scaled (computed-torque) servo: M(q)(kp e - kd qd)
            # gives uniform error dynamics across joints — naive uniform
            # gains blow up on the low-inertia wrist rolls (m_eff ~ 3e-3
            # vs ~3 for the shoulder).  PyBullet's POSITION_CONTROL is a
            # per-step velocity constraint, i.e. also effectively
            # inertia-aware; the torque limit clamps the TOTAL command.
            M = mass_matrix(q)
            tau = M @ (kp * (q_des - q) - kd * qd)
            if gravity_comp:
                tau = tau + bias_forces(q, jnp.zeros(7))
            tau = jnp.clip(tau, -lim, lim)
            qdd = forward_dynamics(q, qd, tau - joint_damping * qd)
            qd = qd + h * qdd
            q = jnp.clip(q + h * qd, iiwa.LOWER, iiwa.UPPER)
            return (q, qd), tau

        (q, qd), taus = jax.lax.scan(sub, (q, qd), None, length=substeps)
        return (q, qd), (q, taus[-1])

    (_, _), (qs, taus) = jax.lax.scan(waypoint, (q0, jnp.zeros(7)), q_des_traj)
    return qs, taus


def kinetic_energy(q, qd):
    return 0.5 * jnp.dot(qd, mass_matrix(q) @ qd)


def potential_energy(q, gravity=None):
    g = jnp.asarray(GRAVITY if gravity is None else gravity)
    _, _, _, pc = chain_frames(q)
    return -jnp.sum(jnp.asarray(MASSES) * (pc @ g))
