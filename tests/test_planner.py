import jax.numpy as jnp
import numpy as np
import pytest

from catgrasp_tpu.kin import iiwa
from catgrasp_tpu.kin.planner import RRTConnect, configs_collide, plan_cartesian_waypoints


def test_configs_collide_detects_obstacle():
    # obstacle blob right where the elbow of the zero pose is (z ~ 0.78)
    obs = np.array([[0.0, 0.0, 0.78]], np.float32)
    qs = jnp.zeros((1, 7))
    hit = np.asarray(configs_collide(qs, jnp.asarray(obs), jnp.ones(1, bool), floor_z=-1.0))
    assert hit[0]
    far = np.array([[2.0, 2.0, 2.0]], np.float32)
    hit2 = np.asarray(configs_collide(qs, jnp.asarray(far), jnp.ones(1, bool), floor_z=-1.0))
    assert not hit2[0]


def test_rrt_plans_in_free_space():
    obs = np.array([[5.0, 5.0, 5.0]], np.float32)
    planner = RRTConnect(obs, step=0.5, n_check=4)
    q0 = np.zeros(7, np.float32)
    q1 = np.array([0.5, 0.3, 0.0, -0.4, 0.0, 0.3, 0.0], np.float32)
    path = planner.plan(q0, q1, max_iter=50)
    assert path is not None
    np.testing.assert_allclose(path[0], q0, atol=1e-5)
    np.testing.assert_allclose(path[-1], q1, atol=1e-5)


def test_rrt_refuses_colliding_goal():
    # obstacle at the goal's wrist position
    q1 = np.array([0.5, 0.9, 0.0, -1.2, 0.0, 0.5, 0.0], np.float32)
    wrist = np.asarray(iiwa.fk_frames(jnp.asarray(q1))[2][:3, 3])
    planner = RRTConnect(wrist[None].astype(np.float32), step=0.5)
    path = planner.plan(np.zeros(7, np.float32), q1, max_iter=10)
    assert path is None


def test_cartesian_waypoints_continuity(rng):
    q0 = np.array([0.3, 0.5, 0.1, -1.0, 0.2, 0.8, 0.0], np.float32)
    T0 = np.asarray(iiwa.fk(jnp.asarray(q0)))
    poses = np.stack([T0] * 4)
    poses[:, 2, 3] += np.linspace(0, 0.03, 4)  # small vertical retreat
    qs, ok = plan_cartesian_waypoints(poses, q_seed=q0, n_psi=32)
    assert ok
    # consecutive configs stay close (no branch flips)
    steps = np.linalg.norm(np.diff(qs, axis=0), axis=1)
    assert (steps < 0.6).all()


def test_reference_layout_reachability():
    """Reference geometry (bin 0.56 m in front of the base, env.py:46-49):
    home is collision-free and a top-down pregrasp over the bin is
    reachable + plannable. Regression for the base-at-bin-center bug that
    made the IK gate reject ~85% and for floor_z given in the wrong frame."""
    import numpy as np
    import jax.numpy as jnp
    from catgrasp_tpu.kin import iiwa, planner
    from catgrasp_tpu.grasp.gripper import Gripper

    base_in_world = np.eye(4, dtype=np.float32)
    base_in_world[:3, 3] = [-0.559, -0.367, 0.052]
    g_w = np.eye(4, dtype=np.float32)
    g_w[:3, 0] = [0, 0, -1]
    g_w[:3, 1] = [1, 0, 0]
    g_w[:3, 2] = np.cross(g_w[:3, 0], g_w[:3, 1])
    g_w[:3, 3] = [0.05, 0.0, 0.005]
    g_base = np.linalg.inv(base_in_world) @ g_w
    gr = Gripper.default()
    pre = g_base.copy()
    pre[:3, 3] -= 0.10 * pre[:3, 0]
    q_pre, found = iiwa.ik_best(jnp.asarray(pre @ np.asarray(gr.ee_in_grasp)))
    assert bool(found)

    rng = np.random.default_rng(0)
    obs_w = rng.uniform(-0.15, 0.15, (512, 3)).astype(np.float32) * [1, 1, 0.05]
    T_bw = np.linalg.inv(base_in_world)
    obs_b = obs_w @ T_bw[:3, :3].T + T_bw[:3, 3]
    rrt = planner.RRTConnect(obs_b.astype(np.float32), floor_z=-0.04, seed=0)
    assert rrt._free(np.zeros((1, 7), np.float32))[0]
    assert rrt._free(np.asarray(q_pre)[None])[0]
    assert rrt.plan(np.zeros(7, np.float32), np.asarray(q_pre)) is not None
