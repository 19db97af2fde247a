"""Primitives the place fallback ladder relies on
(``pipelines/run_grasp_simulation._place_with_arm`` with
``CATGRASP_PLACE_FALLBACKS=1`` — the analog of the reference's place_action,
which tries every ikfast solution and plans with obstacles=[],
``run_grasp_simulation.py:385-424``)."""
import jax.numpy as jnp
import numpy as np

from catgrasp_tpu.kin import iiwa
from catgrasp_tpu.kin.planner import RRTConnect


def test_ik_yields_multiple_distinct_branches():
    """The ladder enumerates up to 6 distinct valid pre-place configs; for a
    comfortably reachable pose the solver must offer more than one."""
    q = jnp.array([0.3, 0.7, -0.2, -1.1, 0.4, 0.8, 0.1])
    T = iiwa.fk(q)
    qs, valid = iiwa.ik(T)
    sols = np.asarray(qs)[np.asarray(valid)]
    assert sols.shape[0] >= 2
    # distinct: pairwise distance of at least two solutions is large
    d = np.linalg.norm(sols[None] - sols[:, None], axis=-1)
    assert d.max() > 0.5
    # and every valid solution reproduces the pose
    for s in sols[:8]:
        np.testing.assert_allclose(np.asarray(iiwa.fk(jnp.asarray(s))), np.asarray(T),
                                   atol=2e-3)


def test_branch_ordering_prefers_near_config():
    """Fallback orders branches by closeness to the transport start config —
    the first branch must be no farther than any other valid branch."""
    q_cur = np.array([0.1, 0.5, 0.0, -0.9, 0.0, 0.6, 0.0], np.float32)
    T = iiwa.fk(jnp.asarray(q_cur))
    qs, valid = iiwa.ik(T)
    sols = np.asarray(qs)[np.asarray(valid)]
    order = np.argsort(np.linalg.norm(sols - q_cur[None], axis=1))
    dists = np.linalg.norm(sols[order] - q_cur[None], axis=1)
    assert (np.diff(dists) >= -1e-6).all()
    assert dists[0] < 0.1  # the generating config itself is recovered


def test_obstacle_relaxed_rrt_plans_through_blocked_cloud():
    """A goal config colliding with the observed cloud is rejected by the
    strict planner but plannable by the relaxed one (reference place
    transport ignores the scene cloud: obstacles=[])."""
    q1 = np.array([0.5, 0.9, 0.0, -1.2, 0.0, 0.5, 0.0], np.float32)
    wrist = np.asarray(iiwa.fk_frames(jnp.asarray(q1))[2][:3, 3])
    strict = RRTConnect(wrist[None].astype(np.float32), step=0.5, seed=3)
    assert strict.plan(np.zeros(7, np.float32), q1, max_iter=10) is None
    relaxed = RRTConnect(np.float32([[10.0, 10.0, 10.0]]), step=0.5, seed=3,
                         floor_z=-0.04)
    path = relaxed.plan(np.zeros(7, np.float32), q1, max_iter=200)
    assert path is not None
    np.testing.assert_allclose(path[-1], q1, atol=1e-5)
