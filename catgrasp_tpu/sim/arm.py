"""Kinematic arm execution inside the pile scene.

The reference *executes* planned motion: RRT path -> ``Command.execute`` ->
Cartesian descent with the object attached, placing via the arm
(``run_grasp_simulation.py:332-463``, ``pybullet_env/env.py:140-244``,
``ss-pybullet/pybullet_tools/kuka_primitives.py:172``).  PyBullet executes
kinematically (position control along the waypoint path) while the scene
reacts; this module reproduces that: every engine step the arm's link boxes
(from FK frames) and the gripper's finger boxes are kinematic colliders with
finite-difference velocities, so transport collisions, descent disturbance
of the pile, and arm-vs-bin contact are all simulated, not assumed.

Everything is a fixed-length ``lax.scan`` over a precomputed joint-space
schedule (static shapes; host planners produce the waypoints, the device
executes), so pick and place execute as two compiled programs regardless of
path length.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import transforms as tf
from ..kin import iiwa
from . import engine
from .env_grasp import (GripperSpec, closing_step, closing_touched_init,
                        gripper_env)
from .types import SceneParams, SceneState, ShapeLib

# segment radii base->S, S->E, E->W, W->F (matches kin.planner.LINK_RADII)
ARM_RADII = np.array([0.09, 0.07, 0.06, 0.05], dtype=np.float32)


def merge_envs(*envs: engine.StaticEnv) -> engine.StaticEnv:
    """Concatenate StaticEnv collider sets."""
    return engine.StaticEnv(
        center=jnp.concatenate([e.center for e in envs]),
        half=jnp.concatenate([e.half for e in envs]),
        quat=jnp.concatenate([e.quat for e in envs]),
        vel=jnp.concatenate([e.vel for e in envs]),
        friction=jnp.concatenate([e.friction for e in envs]),
        enabled=jnp.concatenate([e.enabled for e in envs]),
        imp_budget=jnp.concatenate([e.imp_budget for e in envs]),
        grip=jnp.concatenate([e.grip for e in envs]),
    )


def _rot_align_x(d: jnp.ndarray) -> jnp.ndarray:
    """Rotation whose +x axis is the unit direction d (..., 3)."""
    ref = jnp.where(jnp.abs(d[..., 2:3]) < 0.9,
                    jnp.array([0.0, 0.0, 1.0]), jnp.array([1.0, 0.0, 0.0]))
    y = jnp.cross(ref, d)
    y = y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + 1e-9)
    z = jnp.cross(d, y)
    return jnp.stack([d, y, z], axis=-1)  # columns


def arm_link_boxes(q: jnp.ndarray, base_in_world: jnp.ndarray):
    """Oriented boxes enclosing the arm's link capsules at config q (7,):
    returns (centers (4,3), halves (4,3), quats (4,4)) in WORLD frame."""
    T_S, T_E, T_W, T_F = iiwa.fk_frames(q)
    Rb, tb = base_in_world[:3, :3], base_in_world[:3, 3]
    anchors = jnp.stack([
        jnp.zeros(3), T_S[:3, 3], T_E[:3, 3], T_W[:3, 3], T_F[:3, 3]])
    anchors = anchors @ Rb.T + tb
    a, b = anchors[:-1], anchors[1:]
    seg = b - a
    ln = jnp.linalg.norm(seg, axis=-1, keepdims=True)
    d = seg / jnp.maximum(ln, 1e-9)
    R = _rot_align_x(d)  # (4,3,3)
    r = jnp.asarray(ARM_RADII)
    centers = (a + b) / 2
    halves = jnp.concatenate([ln / 2 + r[:, None] * 0.5,
                              jnp.stack([r, r], axis=-1)], axis=-1)
    quats = tf.matrix_to_quat(R)
    return centers, halves, quats


def arm_env(q: jnp.ndarray, q_prev: jnp.ndarray, base_in_world: jnp.ndarray,
            dt: float, friction: float = 0.4) -> engine.StaticEnv:
    """The arm as 4 kinematic world boxes with finite-difference velocity."""
    c, h, qt = arm_link_boxes(q, base_in_world)
    c_prev, _, _ = arm_link_boxes(q_prev, base_in_world)
    return engine.StaticEnv(
        center=c, half=h, quat=qt, vel=(c - c_prev) / dt,
        friction=jnp.full((4,), friction), enabled=jnp.ones((4,), bool),
        imp_budget=jnp.full((4,), jnp.inf),
        grip=jnp.zeros((4,), bool),
    )


def grasp_pose_of(q: jnp.ndarray, base_in_world: jnp.ndarray,
                  ee_in_grasp: jnp.ndarray) -> jnp.ndarray:
    """World grasp-frame pose at arm config q: T_grasp = T_ee @ ee_in_grasp^-1."""
    return base_in_world @ iiwa.fk(q) @ tf.pose_inverse(ee_in_grasp)


def resample_traj(waypoints: np.ndarray, n: int) -> np.ndarray:
    """Joint-space arc-length uniform resample of a waypoint path to n
    configs (the ``Command.execute`` time parameterization analog)."""
    w = np.asarray(waypoints, np.float32)
    if len(w) == 1:
        return np.repeat(w, n, axis=0)
    d = np.linalg.norm(np.diff(w, axis=0), axis=1)
    s = np.concatenate([[0.0], np.cumsum(d)])
    total = max(s[-1], 1e-9)
    ts = np.linspace(0.0, total, n)
    out = np.empty((n, 7), np.float32)
    for j in range(7):
        out[:, j] = np.interp(ts, s, w[:, j])
    return out


def dynamicize_schedule(qs: np.ndarray, dt: float = engine.DT,
                        **kw) -> np.ndarray:
    """Replace an idealized joint schedule with the trajectory a
    force-limited PD-controlled articulated iiwa actually achieves tracking
    it (:func:`catgrasp_tpu.kin.dynamics.track_schedule`).

    Opt-in (``run_grasp_simulation --arm_dynamics 1``): the executors below
    then step the *dynamically achieved* configurations through the scene —
    the reference's force-controlled PyBullet arm semantics
    (``p.setJointMotorControl2`` POSITION_CONTROL with force limits) instead
    of ideal kinematic playback."""
    from ..kin.dynamics import track_schedule
    qs = np.asarray(qs, np.float32)
    achieved, _ = track_schedule(jnp.asarray(qs[0]), jnp.asarray(qs), dt=dt,
                                 **kw)
    return np.asarray(achieved, np.float32)


@partial(jax.jit, static_argnames=("spec", "n_app", "n_close", "n_hold", "narrowphase"))
def execute_pick_arm(lib: ShapeLib, state: SceneState, params: SceneParams,
                     env_bin: engine.StaticEnv, target: jnp.ndarray,
                     qs: jnp.ndarray, base_in_world: jnp.ndarray,
                     ee_in_grasp: jnp.ndarray, spec: GripperSpec = GripperSpec(),
                     n_app: int = 160, n_close: int = 50, n_hold: int = 80,
                     narrowphase: str = "csg"):
    """Arm-executed pick: approach along ``qs[:n_app]`` (RRT + descent,
    resampled), close, gravity-hold gate, then lift along ``qs[n_app+...:]``
    with the verified object attached (``create_attachment`` semantics,
    ``ss-pybullet/utils.py:3578``) while remaining a collider for the rest
    of the pile.

    ``qs`` (T,7) with T = n_app + n_close + n_hold + n_lift; the close/hold
    span must repeat the grasp config.  Returns
    (picked, final_state, ob_in_grasp, width, center, disturbance) where
    ``center`` is the finger-midline y offset the per-finger close settled
    at (feed it to ``execute_place_arm`` so the release geometry matches)
    and ``disturbance`` is the max displacement of non-target bodies during
    the approach (descent disturbance measure).
    """
    dt = engine.DT
    T = qs.shape[0]
    G = jax.vmap(lambda q: grasp_pose_of(q, base_in_world, ee_in_grasp))(qs)
    G_next = jnp.concatenate([G[1:], G[-1:]], axis=0)
    qs_prev = jnp.concatenate([qs[:1], qs[:-1]], axis=0)

    N = state.pos.shape[0]
    not_target = jnp.arange(N) != target
    pos0 = state.pos

    t_close0 = n_app
    t_hold0 = n_app + n_close
    t_lift0 = n_app + n_close + n_hold

    def step_fn(carry, xs):
        st, w, c, tch, ob_in_grasp, pos_close, disturb = carry
        i, q, q_prev, G_t, G_tn = xs
        closing = (i >= t_close0) & (i < t_hold0)
        lifting = i >= t_lift0

        # per-finger force-limited closing law (reference: two independent
        # POSITION_CONTROL finger motors, env_grasp.py:56-62,127-131)
        # against the CURRENT tool pose
        R = tf.quat_to_matrix(st.quat[target])
        pts_w = st.pos[target] + (lib.surf_pts[params.shape_id[target]]
                                  * params.scale[target]) @ R.T
        pts_g = tf.transform_points(tf.pose_inverse(G_t), pts_w)
        w_new, c_new, tch, v_p, v_n = closing_step(
            pts_g, w, c, tch, closing, spec, dt)

        genv = gripper_env(G_t, w_new, c_new, v_p, v_n, spec,
                           grip=(i >= t_hold0) & tch[0] & tch[1])
        aenv = arm_env(q, q_prev, base_in_world, dt)
        merged = merge_envs(env_bin, genv, aenv)
        st = engine.step(st, params, lib, merged, dt=dt, gravity=-9.8,
                         narrowphase=narrowphase)

        # attachment during lift: the held object rides the gripper frame;
        # its kinematic ride velocity is kept in the state so bystander
        # contacts at the next step see the true relative motion
        ob_pose_att = G_t @ ob_in_grasp
        att_pos = ob_pose_att[:3, 3]
        att_quat = tf.matrix_to_quat(ob_pose_att[:3, :3])
        # forward difference: the velocity the ride will have over the NEXT
        # step (zero at the stop before release — no carried momentum)
        ride_vel = ((G_tn @ ob_in_grasp)[:3, 3] - att_pos) / dt
        st = st.replace(
            pos=jnp.where(lifting, st.pos.at[target].set(att_pos), st.pos),
            quat=jnp.where(lifting, st.quat.at[target].set(att_quat), st.quat),
            linvel=jnp.where(lifting, st.linvel.at[target].set(ride_vel), st.linvel),
            angvel=jnp.where(lifting, st.angvel.at[target].set(0.0), st.angvel),
        )

        # record gate quantities at phase boundaries
        pos_close = jnp.where(i == t_hold0 - 1, st.pos[target], pos_close)
        ob_pose = tf.pose_from_qt(st.quat[target], st.pos[target])
        oig_now = tf.pose_inverse(G_t) @ ob_pose
        ob_in_grasp = jnp.where(i == t_lift0 - 1, oig_now, ob_in_grasp)
        disturb = jnp.where(
            i < t_close0,
            jnp.maximum(disturb, jnp.max(jnp.where(
                not_target & st.active,
                jnp.linalg.norm(st.pos - pos0, axis=-1), 0.0))),
            disturb)
        return (st, w_new, c_new, tch, ob_in_grasp, pos_close, disturb), st.pos[target]

    init = (state, jnp.asarray(spec.max_width), jnp.float32(0.0),
            closing_touched_init(), jnp.eye(4),
            jnp.zeros(3), jnp.float32(0.0))
    (final, w_f, c_f, _, ob_in_grasp, pos_close, disturb), _ = jax.lax.scan(
        step_fn, init, (jnp.arange(T), qs, qs_prev, G, G_next))

    # hold-gate at the END OF HOLD (pre-lift), identical to the floating
    # gripper's verify semantics (env_grasp.py:87-108)
    G_hold = G[t_lift0 - 1]
    ob_hold = G_hold @ ob_in_grasp
    disp = jnp.linalg.norm(ob_hold[:3, 3] - pos_close)
    closed_on_something = w_f > 1e-3
    # the hold may legitimately sit at the finger midline offset c_f, so the
    # lateral bound is measured from there
    centered = jnp.all(jnp.abs(ob_in_grasp[:3, 3]
                               - jnp.stack([0.02, c_f, 0.0]))
                       < jnp.array([0.06, 0.05, 0.05]))
    picked = (disp < 0.02) & closed_on_something & centered
    return picked, final, ob_in_grasp, w_f, c_f, disturb


@partial(jax.jit, static_argnames=("spec", "n_move", "n_drop", "narrowphase"))
def execute_place_arm(lib: ShapeLib, state: SceneState, params: SceneParams,
                      env_bin: engine.StaticEnv, target: jnp.ndarray,
                      qs: jnp.ndarray, base_in_world: jnp.ndarray,
                      ee_in_grasp: jnp.ndarray, ob_in_grasp: jnp.ndarray,
                      width: jnp.ndarray, spec: GripperSpec = GripperSpec(),
                      n_move: int = 160, n_drop: int = 100,
                      narrowphase: str = "csg",
                      center: jnp.ndarray = 0.0):
    """Arm-executed place: transport the attached object along ``qs[:n_move]``
    (RRT to pre-place + Cartesian insertion descent), then hold the arm at
    the final config, open the fingers, and let the object drop under
    gravity for ``n_drop`` steps (the reference's open + 50 gravity steps,
    ``run_grasp_simulation.py:452-463``).

    The fixture must be a body in ``state`` (huge mass) so insertion contact
    is simulated.  Returns (final_state, ob_pose_final (4,4)).
    """
    dt = engine.DT
    qs_prev = jnp.concatenate([qs[:1], qs[:-1]], axis=0)
    G = jax.vmap(lambda q: grasp_pose_of(q, base_in_world, ee_in_grasp))(qs)
    G_next = jnp.concatenate([G[1:], G[-1:]], axis=0)
    T = qs.shape[0]
    # release only once the fingers have opened clear of the (possibly
    # squeezed, possibly off-center) object: dropping the attachment the
    # instant opening STARTS lets the still-touching finger impart an
    # asymmetric lateral impulse that knocks the part off the fixture
    # feature (the reference's position-controlled opening has no such
    # impulse because PyBullet keeps resolving the hold until contact is
    # lost, env_semantic_grasp.py:155-165)
    w_release = jnp.minimum(width + 2.0 * spec.max_squeeze_pen + 0.002,
                            spec.max_width)

    def step_fn(carry, xs):
        st, w = carry
        i, q, q_prev, G_t, G_tn = xs
        moving = i < n_move
        dv = jnp.where(moving, 0.0, spec.close_speed * dt)  # open after move
        w_new = jnp.minimum(w + dv, spec.max_width)
        attached = moving | (w_new < w_release)

        # both fingers retract outward from the (possibly off-center) hold
        # midline at half the opening rate each
        genv = gripper_env(G_t, w_new, center, -dv / (2 * dt), -dv / (2 * dt),
                           spec)
        # once the object has released, the gripper stops being a collider:
        # the reference teleports the gripper far away before the gravity
        # drop (env_semantic_grasp.py:155-160); keeping the finger channel
        # live lets it torque the falling part on tilted holds and impart a
        # slow lateral drift during the fixture slide
        genv = genv.replace(enabled=genv.enabled & attached)
        aenv = arm_env(q, q_prev, base_in_world, dt)
        merged = merge_envs(env_bin, genv, aenv)
        st = engine.step(st, params, lib, merged, dt=dt, gravity=-9.8,
                         narrowphase=narrowphase)

        # attached during transport and until the fingers clear contact
        ob_pose_att = G_t @ ob_in_grasp
        ride_vel = ((G_tn @ ob_in_grasp)[:3, 3] - ob_pose_att[:3, 3]) / dt
        st = st.replace(
            pos=jnp.where(attached, st.pos.at[target].set(ob_pose_att[:3, 3]), st.pos),
            quat=jnp.where(attached, st.quat.at[target].set(
                tf.matrix_to_quat(ob_pose_att[:3, :3])), st.quat),
            linvel=jnp.where(attached, st.linvel.at[target].set(ride_vel), st.linvel),
            angvel=jnp.where(attached, st.angvel.at[target].set(0.0), st.angvel),
        )
        return (st, w_new), (st.pos[target], st.quat[target],
                             st.linvel[target], st.angvel[target])

    (final, _), traj = jax.lax.scan(step_fn, (state, width),
                                    (jnp.arange(T), qs, qs_prev, G, G_next))
    ob_pose_final = tf.pose_from_qt(final.quat[target], final.pos[target])
    return final, ob_pose_final, traj
