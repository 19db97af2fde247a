import jax
import jax.numpy as jnp
import numpy as np
import pytest

from catgrasp_tpu.core import transforms as tf
from catgrasp_tpu.geom import primitives as prim
from catgrasp_tpu.sim import engine
from catgrasp_tpu.sim import env_grasp as eg
from catgrasp_tpu.sim.types import SceneParams, SceneState, build_shape_lib


from catgrasp_tpu.geom import csg as csglib


@pytest.fixture(scope="module")
def lib():
    return build_shape_lib(
        [prim.box((0.03, 0.03, 0.03)), prim.hex_nut()],
        [csglib.csg_box((0.03, 0.03, 0.03)), csglib.csg_hex_nut()],
        n_surf=48,
    )


def top_down_grasp(center):
    # approach -z, closing along ±x (proper rotation)
    R = np.array([[0.0, 1, 0], [0, 0, -1], [-1, 0, 0]], dtype=np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = center
    return jnp.asarray(T)


def test_box_settles_on_floor(lib):
    params = SceneParams.create(lib, jnp.array([0]))
    st = SceneState.create(1).replace(
        pos=jnp.array([[0.0, 0.0, 0.05]]), active=jnp.array([True])
    )
    env = engine.StaticEnv.open_bin()
    out = engine.rollout(st, params, lib, env, 300)
    pos = np.asarray(out.pos[0])
    assert abs(pos[2] - 0.015) < 0.003  # rests at half height
    assert np.linalg.norm(pos[:2]) < 0.01  # no lateral drift
    assert np.linalg.norm(np.asarray(out.linvel[0])) < 0.01  # at rest


def test_two_bodies_settle_without_interpenetration(lib):
    params = SceneParams.create(lib, jnp.array([0, 1]))
    st = SceneState.create(2).replace(
        pos=jnp.array([[0.0, 0.0, 0.05], [0.0, 0.005, 0.1]]),
        active=jnp.array([True, True]),
    )
    env = engine.StaticEnv.open_bin()
    out = engine.rollout(st, params, lib, env, 500)
    pos = np.asarray(out.pos)
    assert (pos[:, 2] > -0.005).all()  # nothing fell through the floor
    assert (np.abs(pos[:, :2]) < 0.16).all()  # nothing left the bin
    # bodies not deeply interpenetrated: center distance above a floor
    assert np.linalg.norm(pos[0] - pos[1]) > 0.01


def test_inactive_bodies_do_not_move(lib):
    params = SceneParams.create(lib, jnp.array([0, 0]))
    st = SceneState.create(2).replace(
        pos=jnp.array([[0.0, 0.0, 0.05], [1.0, 1.0, 1.0]]),
        active=jnp.array([True, False]),
    )
    env = engine.StaticEnv.open_bin()
    out = engine.rollout(st, params, lib, env, 50)
    np.testing.assert_allclose(np.asarray(out.pos[1]), [1.0, 1.0, 1.0], atol=1e-6)


def test_vmapped_scenes(lib):
    B = 4
    params = SceneParams.create(lib, jnp.array([0]))
    env = engine.StaticEnv.open_bin()
    st = SceneState.create(1).replace(active=jnp.array([True]))
    sts = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), st)
    heights = jnp.array([0.04, 0.06, 0.08, 0.1])
    sts = sts.replace(pos=heights[:, None, None] * jnp.array([0.0, 0.0, 1.0]))

    roll = jax.vmap(lambda s: engine.rollout(s, params, lib, env, 200))
    out = roll(sts)
    pos = np.asarray(out.pos)[:, 0]
    assert (np.abs(pos[:, 2] - 0.015) < 0.004).all()


def test_verify_grasp_good_miss_collide(lib):
    batch = jnp.stack(
        [
            top_down_grasp([0, 0, 0.006]),  # straddles the nut -> hold
            top_down_grasp([0.2, 0, 0.006]),  # thin air -> drop
            top_down_grasp([0, 0, -0.002]),  # palm inside nut -> reject
        ]
    )
    s = np.asarray(
        eg.verify_grasp_batch(lib, jnp.int32(1), jnp.float32(1.0), batch, eg.GripperSpec(), 0.9)
    )
    assert s.tolist() == [True, False, False]


def test_perturbation_scores_ranks_grasps(lib):
    key = jax.random.PRNGKey(0)
    grasps = jnp.stack([top_down_grasp([0, 0, 0.006]), top_down_grasp([0.2, 0, 0.006])])
    scores = np.asarray(
        eg.perturbation_scores(key, lib, jnp.int32(1), jnp.float32(1.0), grasps, trials=8)
    )
    assert scores[0] > 0.5  # robust grasp
    assert scores[1] == 0.0  # air grasp never succeeds


def test_finger_contact_points():
    spec = eg.GripperSpec()
    pts = jnp.array(
        [
            [0.01, 0.0119, 0.0],  # at +finger inner face (width 0.024)
            [0.01, 0.0, 0.0],  # mid air between fingers
            [0.1, 0.0119, 0.0],  # beyond finger length
        ]
    )
    m_pos, m_neg = eg.finger_contact_points(pts, jnp.asarray(0.024), spec)
    assert bool(m_pos[0]) and not bool(m_neg[0])
    assert not bool(m_pos[1])
    assert not bool(m_pos[2])


def test_per_finger_close_holds_off_center_object(lib):
    """Per-finger force-limited closing (reference: two independent
    POSITION_CONTROL finger joints, ``env_grasp.py:56-62``): an object
    offset along the closing axis must be pinched IN PLACE — the near
    finger stalls on contact while the far finger keeps moving.  The old
    single-width symmetric law dragged the object to the channel midline
    (here 8 mm), which in-pile ejected rim-pinched parts (the r4
    oracle-nut codebook-grasp regression, ``logs/pickdbg_r4f``)."""
    off = 0.008  # grasp center 8 mm off the cube center along closing y
    # grasp origin z=0.018: the palm extends UP from the grasp origin
    # (finger_boxes), so it must clear the 30 mm cube's top face at z=0.015
    # — at the nut tests' z=0.006 the palm starts inside the cube and
    # open_gripper_collision correctly rejects the pose
    roll = eg.grasp_rollout(lib, jnp.int32(0), jnp.float32(1.0),
                            top_down_grasp([off, 0.0, 0.018]))
    assert bool(roll["success"])
    # pinched in place, not dragged to the midline
    assert float(roll["displacement"]) < 0.005
    # fingers settled on the 30 mm cube faces: width ~ 0.03, midline at
    # -off in the grasp frame
    assert abs(float(roll["width"]) - 0.03) < 0.008
    assert abs(float(roll["center"]) + off) < 0.004


def test_pinched_nut_stable_at_fine_dt(lib):
    """Solver-stability regression (r5): a rim-pinched nut at dt=1/480 must
    hold without the angular channel pumping itself to explosion.  Guards
    two engine properties at once: split-impulse Baumgarte (bias injects no
    momentum, so its 1/dt scaling cannot double the loop gain at fine dt)
    and the friction passivity clamp (a body's summed friction delta may
    never increase its kinetic energy).  Pre-fix this exact setup reached
    6000 rad/s and flew meters (see engine.FRICTION_RELAX note)."""
    roll = eg.grasp_rollout(lib, jnp.int32(1), jnp.float32(1.0),
                            top_down_grasp([0, 0, 0.006]),
                            dt=1.0 / 480.0)
    assert bool(roll["success"])
    assert float(roll["displacement"]) < 0.01
