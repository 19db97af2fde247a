"""Task-affordance discovery — the TPU ``env_semantic_grasp.py``.

Reference protocol (``EnvSemanticGraspNoArm.try_grasp``,
``env_semantic_grasp.py:76-179``): hold the object at its task pose over the
placement fixture, close the gripper, shake; if stable, kinematically insert
along interpolated poses to the place pose, open, drop, and check
``place_success_func``.  Outcome 0 = grasp fail, 1 = stable but task fail,
2 = task success; contacts (object surface points touched by the fingers)
are recorded for per-point affordance accumulation
(``process_affordance_results``, ``:258-303``).

TPU pipeline per grasp (vmapped over the grasp DB):
  A. stability + in-hand drift + final width = :func:`env_grasp.grasp_rollout`
  B. insertion feasibility = gripper-box sample points AND object surface
     points vs the fixture CSG along interpolated waypoints (pure VPU)
  C. drop = contact rollout of object (post-insert pose) against the fixture
     (modeled as an effectively-infinite-mass body in the same engine)
  D. class-specific placement check (``Utils.py:38-76`` semantics adapted to
     the procedural fixtures).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import transforms as tf
from ..geom import csg as csglib
from . import engine
from .env_grasp import GripperSpec, finger_boxes, finger_contact_points, grasp_rollout
from .types import SceneParams, SceneState, ShapeLib

# Provenance stamp for affordance labels (VERDICT r3 #8): bump whenever
# try_grasp/place semantics change in a way that invalidates existing
# per-instance affordance npz files.
#   v2 = drift-faithful try_grasp (post-close drift carried through insert
#        AND drop, fingers-only insertion sweep; commit 3498151) — every
#        label committed at/after 004d086 was produced by this code.
#   v3 = r5 physics overhaul: latched per-finger closing law (soft landing,
#        bounded squeeze, force-limit yield), motor-backed grip friction
#        (StaticEnv.grip), exact tangential effective mass, split-impulse
#        Baumgarte, friction passivity guard.  All v2 labels were scored by
#        a close law whose own hold test failed and whose dt-sensitivity
#        the self-parity harness flagged (VERDICT r4 #1).
TRY_GRASP_VERSION = 3

# Task poses relative to the fixture origin: (pre-place, place) object poses
# — the ``place_pose_dict`` analog (``Utils.py:15-24``), adapted to the
# procedural fixtures of geom.primitives.place_fixture.
TASK_POSES = {
    # The release (place) pose is already CAPTURED by the fixture feature —
    # matching the reference, whose place_pose_dict[1] puts the part around
    # its fixture before the gripper opens (``Utils.py:15-24``; the nut's
    # ±2 cm z-check at ``Utils.py:45`` is "stayed on the bolt").  Releasing
    # above the feature and hoping gravity threads it is a harder task than
    # the reference's and fails on rim bounces/wedging.
    # nut: peg (tip 0.07) is 4.5 cm through the hole at release
    "nut": (np.array([0, 0, 0.15]), np.array([0, 0, 0.055])),
    # screw: shaft tip 1.5+ cm into the hole (block top 0.03) at release
    "screw": (np.array([0, 0, 0.15]), np.array([0, 0, 0.045])),
    # connector: body bottom inside the socket opening (top 0.025)
    "hnm": (np.array([0, 0, 0.12]), np.array([0, 0, 0.04])),
}

# success bands (meters): object settled INTO the feature, not on top of it
# (max) and not fallen past/through it (min: resting on the fixture base —
# nut plate top 0.01, screw/hnm block base).  The reference instead checks
# |z - place_z| <= 2 cm because its release pose is already at the seated
# depth (``Utils.py:45``); our fixtures thread the part several cm down, so
# the band is fixture-absolute.
_SUCCESS_Z_MAX = {"nut": 0.03, "screw": 0.04, "hnm": 0.035}
_SUCCESS_Z_MIN = {"nut": 0.005, "screw": 0.005, "hnm": 0.005}
# reference xy-center tolerances (``Utils.py:42,52,64``): nut/hnm 5 mm,
# screw 10 mm
_SUCCESS_XY = {"nut": 0.005, "screw": 0.01, "hnm": 0.005}


def place_success(class_name: str, ob_pose: jnp.ndarray, place_pos: jnp.ndarray) -> jnp.ndarray:
    """Class-specific placement check, reference-verbatim semantics
    (``get_place_success_func``, ``Utils.py:38-76``): xy-center proximity
    (5 mm nut/hnm, 10 mm screw); z-axis parallelism for screw/hnm only
    (|dot| >= cos 80°, i.e. not perpendicular — the nut has NO orientation
    check, ``Utils.py:40-48``); plus a height band proving the part actually
    threaded/seated (see _SUCCESS_Z_* above for why the band is absolute)."""
    xy_ok = jnp.linalg.norm(ob_pose[:2, 3] - place_pos[:2]) <= _SUCCESS_XY[class_name]
    if class_name == "nut":
        axis_ok = jnp.bool_(True)
    else:
        axis_ok = jnp.abs(ob_pose[2, 2]) >= jnp.cos(jnp.deg2rad(80.0))
    z_ok = ((ob_pose[2, 3] <= _SUCCESS_Z_MAX[class_name])
            & (ob_pose[2, 3] >= _SUCCESS_Z_MIN[class_name]))
    return xy_ok & z_ok & axis_ok


def _gripper_sample_points(spec: GripperSpec, width: jnp.ndarray, n_per_box: int = 32,
                           n_boxes: int = 3, center: jnp.ndarray = 0.0):
    """Sample points on the gripper's boxes at the given opening, grasp
    frame — for gripper-vs-fixture insertion collision tests.  n_boxes=2
    restricts to the FINGERS (the reference's insertion sweep checks
    ``links1=finger_ids`` only, ``env_semantic_grasp.py:145``)."""
    centers, halves = finger_boxes(width, spec, center)
    centers, halves = centers[:n_boxes], halves[:n_boxes]
    # deterministic low-discrepancy-ish grid on each box surface
    u = (jnp.arange(n_per_box) + 0.5) / n_per_box
    g = jnp.stack(jnp.meshgrid(u, u, u, indexing="ij"), -1).reshape(-1, 3)
    g = g[jax.random.permutation(jax.random.PRNGKey(0), g.shape[0])[:n_per_box]]
    pts = (g * 2 - 1)[None] * halves[:, None, :] + centers[:, None, :]
    return pts.reshape(-1, 3)  # (3*n_per_box, 3)


@partial(jax.jit, static_argnames=("class_name", "spec", "n_waypoints", "drop_steps", "narrowphase"))
def try_grasp(lib: ShapeLib, obj_shape: jnp.ndarray, fixture_shape_idx: jnp.ndarray,
              scale: jnp.ndarray, grasp_in_ob: jnp.ndarray, class_name: str,
              aff_pts: jnp.ndarray, spec: GripperSpec = GripperSpec(),
              n_waypoints: int = 8, drop_steps: int = 60,
              narrowphase: str = "csg"):
    """One grasp -> (ret in {0,1,2}, contact mask over aff_pts (P,)).

    ``lib`` must contain both the object shape (index ``obj_shape``) and the
    fixture shape (index ``fixture_shape_idx``, with its CSG tree).
    ``aff_pts`` (P,3): dense object surface points for affordance labels.
    vmap over grasp_in_ob for the whole DB.
    """
    pre_t, place_t = [jnp.asarray(t, jnp.float32) for t in TASK_POSES[class_name]]

    # --- A: stability (free-space close + gravity test) --------------------
    roll = grasp_rollout(lib, obj_shape, scale, grasp_in_ob, spec,
                         narrowphase=narrowphase)
    width = roll["width"]
    # reference ret-0 gate (``env_semantic_grasp.py:110-115``): the object
    # FELL OUT — moved > 0.2 m from the grasp during the gravity test.
    # (verify_grasp's 2 cm applies to perturbation scoring, not here.)
    held = (~roll["collided"]) & (roll["displacement"] <= 0.2)
    # ...then the reference RESTORES the pre-gravity state
    # (``p.restoreState(tmp_id)``): contacts, the attached in-hand pose,
    # and everything downstream use the post-CLOSE drift only
    drift = roll["ob_pose_close"]

    # contact extraction at the restored post-close state
    # (``get_grasp_contact_area``, surface_tol=0.002, n_side>=2 required:
    # ``env_semantic_grasp.py:122-124``)
    T_ginv = tf.pose_inverse(grasp_in_ob)
    pts_ob = aff_pts * scale
    pts_w = tf.transform_points(drift, pts_ob)
    pts_g = tf.transform_points(T_ginv, pts_w)
    m_pos, m_neg = finger_contact_points(pts_g, width, spec, surface_tol=0.003,
                                         center=roll["center"])
    stable = held & jnp.any(m_pos) & jnp.any(m_neg)
    contact_mask = (m_pos | m_neg) & stable

    # --- B: insertion sweep -------------------------------------------------
    # The GRIPPER translates pre->place; the object rides rigidly at its
    # drifted in-hand pose the whole way (a kinematic insert cannot re-seat
    # the part in the hand), like the reference's attachment-following
    # ``interpolate_poses_matrix`` sweep (``env_semantic_grasp.py:76-179``).
    # So every waypoint — including the final held pose the drop starts
    # from — is ``translate(t) @ drift``; tilted holds stay tilted.
    alphas = jnp.linspace(0.0, 1.0, n_waypoints)
    held0 = tf.pose_from_rt(jnp.eye(3), pre_t) @ drift
    held1 = tf.pose_from_rt(jnp.eye(3), place_t) @ drift
    ob_pose_path = tf.interpolate_poses(held0, held1, alphas)

    fixture_csg = csglib.select_shape(lib.csg, fixture_shape_idx)
    # FINGERS ONLY: the reference's sweep checks finger links vs the
    # fixture (``any_link_pair_collision(links1=finger_ids)``,
    # ``env_semantic_grasp.py:145``); the held OBJECT is free to brush the
    # fixture during the kinematic insert — physics resolves that at drop
    grip_pts_g = _gripper_sample_points(spec, width, n_boxes=2,
                                        center=roll["center"])

    def waypoint_collides(ob_pose):
        # grasp pose in fixture frame when holding the (drifted) object here
        grasp_w = ob_pose @ tf.pose_inverse(drift) @ grasp_in_ob
        gp_w = tf.transform_points(grasp_w, grip_pts_g)
        d_grip = csglib.csg_sdf(fixture_csg, gp_w)
        return jnp.min(d_grip) < 5e-4

    blocked = jnp.any(jax.vmap(waypoint_collides)(ob_pose_path))

    # --- C: drop from the place pose ---------------------------------------
    FIXTURE_MASS = 1e9
    shape_ids = jnp.stack([obj_shape, fixture_shape_idx])
    params = SceneParams.create(lib, shape_ids, jnp.stack([scale, jnp.float32(1.0)]))
    params = params.replace(
        mass=params.mass.at[1].set(FIXTURE_MASS),
        inertia=params.inertia.at[1].set(FIXTURE_MASS),
        # slippery fixture so parts slide into place (reference
        # lateralFriction=0.1, env_semantic_grasp.py:53)
        friction=params.friction.at[1].set(0.1),
    )
    # the drop starts from the ACTUAL held pose after insertion (drifted),
    # matching the reference's open-then-drop of the attached object — NOT
    # from an idealized seated identity pose
    st = SceneState.create(2).replace(
        pos=jnp.stack([held1[:3, 3], jnp.zeros(3)]),
        quat=jnp.stack([tf.matrix_to_quat(held1[:3, :3]), tf.quat_identity()]),
        active=jnp.array([True, True]),
    )
    no_env = engine.StaticEnv.boxes(
        jnp.array([[0.0, 0.0, -0.05]]), jnp.array([[0.5, 0.5, 0.05]]))  # floor
    final = engine.rollout(st, params, lib, no_env, drop_steps, gravity=-9.8,
                           narrowphase=narrowphase)
    ob_pose_final = tf.pose_from_qt(final.quat[0], final.pos[0])
    placed = place_success(class_name, ob_pose_final, place_t)

    ret = jnp.where(stable, jnp.where(blocked | ~placed, 1, 2), 0)
    return ret, contact_mask


@partial(jax.jit, static_argnames=("class_name", "spec", "n_waypoints", "drop_steps", "narrowphase"))
def place_and_drop(lib: ShapeLib, obj_shape: jnp.ndarray,
                   fixture_shape_idx: jnp.ndarray, scale: jnp.ndarray,
                   grasp_in_ob: jnp.ndarray, class_name: str,
                   width: jnp.ndarray, spec: GripperSpec = GripperSpec(),
                   n_waypoints: int = 8, drop_steps: int = 60,
                   narrowphase: str = "csg",
                   grasp_in_ob_cmd: jnp.ndarray | None = None) -> jnp.ndarray:
    """The closed-loop ``place_action`` (``run_grasp_simulation.py:375-463``):
    insert an ALREADY-HELD object along pre->place waypoints (gripper +
    object vs fixture collision sweep), open, drop, class placement check.
    Unlike :func:`try_grasp` there is no free-space close-and-shake — the
    pick already verified the hold physically in the pile.  Returns a bool.

    ``grasp_in_ob`` is the ACTUAL post-close in-hand pose (incl. slip);
    ``grasp_in_ob_cmd`` is the COMMANDED one (the controller believes the
    object still sits where it closed).  The gripper is steered so the
    believed object pose tracks the waypoints — so in-hand slip tilts and
    offsets the real object through the sweep AND the drop, exactly as the
    arm-executed path models it.  Defaults to ``grasp_in_ob`` (no slip).
    """
    pre_t, place_t = [jnp.asarray(t, jnp.float32) for t in TASK_POSES[class_name]]
    if grasp_in_ob_cmd is None:
        grasp_in_ob_cmd = grasp_in_ob
    # believed -> actual object correction: where the object REALLY is,
    # relative to where the controller thinks it holds it
    slip = grasp_in_ob_cmd @ tf.pose_inverse(grasp_in_ob)

    alphas = jnp.linspace(0.0, 1.0, n_waypoints)
    ob_pos_path = pre_t[None] * (1 - alphas[:, None]) + place_t[None] * alphas[:, None]
    fixture_csg = csglib.select_shape(lib.csg, fixture_shape_idx)
    # ALL three gripper boxes here (incl. palm): unlike try_grasp's
    # label-generation sweep (reference-parity fingers-only), this is the
    # closed-loop execution fallback — the reference's analog is full arm
    # motion with planner collision checking, so the conservative gate is
    # the faithful one
    grip_pts_g = _gripper_sample_points(spec, width, n_boxes=3)

    def waypoint_collides(ob_pos):
        believed = jnp.eye(4).at[:3, 3].set(ob_pos)
        grasp_w = believed @ grasp_in_ob_cmd
        gp_w = tf.transform_points(grasp_w, grip_pts_g)
        d_grip = csglib.csg_sdf(fixture_csg, gp_w)
        return jnp.min(d_grip) < 5e-4

    blocked = jnp.any(jax.vmap(waypoint_collides)(ob_pos_path))
    # release pose of the REAL object: believed pose at place_t, composed
    # with the in-hand slip (was: identity orientation at place_t, which
    # silently discarded the tilt try_grasp/execute_pick model)
    ob_release = jnp.eye(4).at[:3, 3].set(place_t) @ slip

    FIXTURE_MASS = 1e9
    shape_ids = jnp.stack([obj_shape, fixture_shape_idx])
    params = SceneParams.create(lib, shape_ids, jnp.stack([scale, jnp.float32(1.0)]))
    params = params.replace(
        mass=params.mass.at[1].set(FIXTURE_MASS),
        inertia=params.inertia.at[1].set(FIXTURE_MASS),
        # slippery fixture so parts slide into place (reference
        # lateralFriction=0.1, env_semantic_grasp.py:53)
        friction=params.friction.at[1].set(0.1),
    )
    st = SceneState.create(2).replace(
        pos=jnp.stack([ob_release[:3, 3], jnp.zeros(3)]),
        quat=jnp.stack([tf.matrix_to_quat(ob_release[:3, :3]),
                        tf.quat_identity()]),
        active=jnp.array([True, True]),
    )
    no_env = engine.StaticEnv.boxes(
        jnp.array([[0.0, 0.0, -0.05]]), jnp.array([[0.5, 0.5, 0.05]]))
    final = engine.rollout(st, params, lib, no_env, drop_steps, gravity=-9.8,
                           narrowphase=narrowphase)
    ob_pose_final = tf.pose_from_qt(final.quat[0], final.pos[0])
    placed = place_success(class_name, ob_pose_final, place_t)
    return ~blocked & placed


def accumulate_affordance(rets: np.ndarray, contact_masks: np.ndarray,
                          min_trials: int = 10):
    """Per-point P(task | stable grasp) from trial outcomes
    (``process_affordance_results``, ``env_semantic_grasp.py:258-303``).

    rets (G,), contact_masks (G, P) -> (affordance (P,), n_stable (P,)).
    """
    stable = rets >= 1
    task = rets == 2
    n_stable = (contact_masks & stable[:, None]).sum(axis=0)
    n_task = (contact_masks & task[:, None]).sum(axis=0)
    # under-sampled points are NEUTRAL 0.5, not bad (reference:
    # ``ob_pts_score[pts_grasp_success<min_valid_trial] = 0.5``,
    # ``env_semantic_grasp.py:291``)
    aff = np.where(n_stable >= min_trials, n_task / np.maximum(n_stable, 1), 0.5)
    return aff.astype(np.float32), n_stable
