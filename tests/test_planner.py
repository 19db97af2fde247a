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
