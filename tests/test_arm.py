"""sim.arm — kinematic arm execution in the scene."""
import jax
import jax.numpy as jnp
import numpy as np

from catgrasp_tpu.core import transforms as tf
from catgrasp_tpu.geom import csg as csglib
from catgrasp_tpu.geom import primitives as prim
from catgrasp_tpu.grasp.gripper import Gripper
from catgrasp_tpu.kin import iiwa
from catgrasp_tpu.sim import arm as simarm
from catgrasp_tpu.sim import engine
from catgrasp_tpu.sim.types import SceneParams, SceneState, build_shape_lib


def _base():
    b = np.eye(4, dtype=np.float32)
    b[:3, 3] = [-0.559, -0.367, 0.052]
    return b


def test_arm_link_boxes_cover_chain():
    q = jnp.array([0.3, 0.5, -0.2, -1.0, 0.4, 0.8, 0.1])
    base = jnp.asarray(_base())
    c, h, qt = simarm.arm_link_boxes(q, base)
    assert c.shape == (4, 3) and h.shape == (4, 3) and qt.shape == (4, 4)
    # FK anchor midpoints must lie inside their boxes
    T_S, T_E, T_W, T_F = iiwa.fk_frames(q)
    Rb, tb = base[:3, :3], base[:3, 3]
    anchors = jnp.stack([jnp.zeros(3), T_S[:3, 3], T_E[:3, 3],
                         T_W[:3, 3], T_F[:3, 3]]) @ Rb.T + tb
    mids = (anchors[:-1] + anchors[1:]) / 2
    R = tf.quat_to_matrix(qt)
    loc = jnp.einsum("lji,lj->li", R, mids - c)
    d, _ = engine.box_sdf_and_normal(loc, h)
    assert bool(jnp.all(d < 0.0)), f"link midpoints outside boxes: {d}"


def test_resample_traj_endpoints():
    w = np.array([np.zeros(7), np.ones(7) * 0.5, np.ones(7)], np.float32)
    out = simarm.resample_traj(w, 11)
    assert out.shape == (11, 7)
    np.testing.assert_allclose(out[0], w[0], atol=1e-6)
    np.testing.assert_allclose(out[-1], w[-1], atol=1e-6)
    # arc-length uniform: per-step increments equal
    inc = np.linalg.norm(np.diff(out, axis=0), axis=1)
    np.testing.assert_allclose(inc, inc[0], rtol=1e-3)


def test_grasp_pose_roundtrip():
    g = Gripper.default()
    q = jnp.array([0.2, 0.7, 0.1, -1.4, 0.0, 0.5, 0.0])
    base = jnp.asarray(_base())
    G = simarm.grasp_pose_of(q, base, jnp.asarray(g.ee_in_grasp))
    ee = G @ jnp.asarray(g.ee_in_grasp)
    np.testing.assert_allclose(np.asarray(ee),
                               np.asarray(base @ iiwa.fk(q)), atol=1e-5)


def _tiny_world():
    lib = build_shape_lib([prim.make_instance("nut", "train", 0)],
                          [csglib.make_csg_instance("nut", "train", 0)],
                          n_surf=32)
    params = SceneParams.create(lib, jnp.array([0], jnp.int32), jnp.array([1.0]))
    state = SceneState.create(1).replace(
        active=jnp.array([True]), pos=jnp.array([[0.0, 0.0, 0.006]]))
    env_bin = engine.StaticEnv.open_bin((0.3, 0.3, 0.12))
    return lib, params, state, env_bin


def test_execute_pick_arm_runs_and_gates():
    """Arm far from the object: executor must run and report picked=False."""
    lib, params, state, env_bin = _tiny_world()
    g = Gripper.default()
    q0 = np.zeros(7, np.float32)
    q0[1], q0[3] = 0.6, -1.2
    sched = np.repeat(q0[None], 4 + 6 + 6 + 4, axis=0)
    picked, final, oig, w, c, disturb = simarm.execute_pick_arm(
        lib, state, params, env_bin, jnp.int32(0), jnp.asarray(sched),
        jnp.asarray(_base()), jnp.asarray(g.ee_in_grasp), g.spec,
        n_app=4, n_close=6, n_hold=6)
    assert not bool(picked)
    assert np.isfinite(np.asarray(final.pos)).all()
    assert float(disturb) >= 0.0


def test_execute_place_arm_transports_attachment():
    """The attached object must follow the scheduled tool poses during the
    move phase (checked one step before release)."""
    lib, params, state, env_bin = _tiny_world()
    g = Gripper.default()
    base = _base()
    # configs whose FK stays well above the bin
    qa = np.zeros(7, np.float32); qa[1], qa[3] = 0.35, -1.6
    qb = np.zeros(7, np.float32); qb[1], qb[3] = 0.55, -1.4
    # release for a single step only: the ride pose must be intact at the
    # measurement (a long drop is physics, tested elsewhere)
    n_move, n_drop = 12, 1
    sched = simarm.resample_traj(np.stack([qa, qb]), n_move)
    sched = np.concatenate([sched, np.repeat(sched[-1][None], n_drop, 0)])
    ob_in_grasp = np.eye(4, dtype=np.float32)
    ob_in_grasp[:3, 3] = [0.02, 0.0, 0.0]
    final, ob_pose, _ = simarm.execute_place_arm(
        lib, state, params, env_bin, jnp.int32(0), jnp.asarray(sched),
        jnp.asarray(base), jnp.asarray(g.ee_in_grasp),
        jnp.asarray(ob_in_grasp), jnp.asarray(g.spec.max_width), g.spec,
        n_move=n_move, n_drop=n_drop)
    # expected ride pose at the last move step
    G_end = np.asarray(simarm.grasp_pose_of(
        jnp.asarray(sched[n_move - 1]), jnp.asarray(base),
        jnp.asarray(g.ee_in_grasp)))
    expect = (G_end @ ob_in_grasp)[:3, 3]
    # after release it falls; xy should still be near the release point
    got = np.asarray(ob_pose)[:3, 3]
    np.testing.assert_allclose(got[:2], expect[:2], atol=0.03)
    assert got[2] <= expect[2] + 1e-3  # fell or stayed


def test_execute_place_arm_clean_release():
    """An off-center squeezed object must release without a lateral kick:
    the attachment holds until the fingers have opened clear of contact
    (PyBullet's position-controlled opening keeps resolving the hold until
    contact is lost, so release there is impulse-free)."""
    lib, params, state, env_bin = _tiny_world()
    g = Gripper.default()
    base = _base()
    qa = np.zeros(7, np.float32); qa[1], qa[3] = 0.35, -1.6
    n_move, n_drop = 2, 16
    sched = np.repeat(qa[None], n_move + n_drop, axis=0)
    # nut held 1.5 mm off-center along the closing axis (y), squeezed:
    # width < across-flats extent, so one finger penetrates at release time
    ob_in_grasp = np.eye(4, dtype=np.float32)
    ob_in_grasp[:3, 3] = [0.02, 0.0015, 0.0]
    width = jnp.float32(0.014)  # nut y-extent is ~0.0156 at scale 1
    final, ob_pose, _ = simarm.execute_place_arm(
        lib, state, params, env_bin, jnp.int32(0), jnp.asarray(sched),
        jnp.asarray(base), jnp.asarray(g.ee_in_grasp),
        jnp.asarray(ob_in_grasp), width, g.spec,
        n_move=n_move, n_drop=n_drop)
    G_end = np.asarray(simarm.grasp_pose_of(
        jnp.asarray(qa), jnp.asarray(base), jnp.asarray(g.ee_in_grasp)))
    release_xy = (G_end @ ob_in_grasp)[:2, 3]
    got = np.asarray(ob_pose)[:3, 3]
    # free fall for <= 16 steps moves xy ~0; a squeeze impulse moves it cm's
    np.testing.assert_allclose(got[:2], release_xy, atol=0.004)
    v = np.asarray(final.linvel[0])
    assert np.linalg.norm(v[:2]) < 0.12, f"lateral kick at release: {v}"
