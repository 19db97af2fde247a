import jax
import jax.numpy as jnp
import numpy as np

from catgrasp_tpu.kin import iiwa


def random_q(rng, n):
    return (rng.uniform(-0.95, 0.95, size=(n, 7)) * iiwa.JOINT_LIMITS).astype(np.float32)


def test_fk_shapes_and_chain(rng):
    q = jnp.asarray(random_q(rng, 4))
    T_S, T_E, T_W, T_F = iiwa.fk_frames(q)
    assert T_F.shape == (4, 4, 4)
    # link lengths preserved
    d_se = np.linalg.norm(np.asarray(T_E[:, :3, 3] - T_S[:, :3, 3]), axis=-1)
    np.testing.assert_allclose(d_se, iiwa.D_SE, atol=1e-5)
    d_ew = np.linalg.norm(np.asarray(T_W[:, :3, 3] - T_E[:, :3, 3]), axis=-1)
    np.testing.assert_allclose(d_ew, iiwa.D_EW, atol=1e-5)


def test_fk_zero_pose():
    T = np.asarray(iiwa.fk(jnp.zeros(7)))
    # straight up arm
    np.testing.assert_allclose(T[:3, 3], [0, 0, iiwa.D_BS + iiwa.D_SE + iiwa.D_EW + iiwa.D_WF], atol=1e-6)
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)


def test_ik_fk_roundtrip(rng):
    """Every FK pose of an in-limits q must be recovered by some IK candidate."""
    q_true = jnp.asarray(random_q(rng, 24))
    T = iiwa.fk(q_true)
    qs, valid = iiwa.ik_batch(T, 64)
    T_back = iiwa.fk(qs.reshape(-1, 7)).reshape(24, -1, 4, 4)
    pos_err = jnp.linalg.norm(T_back[..., :3, 3] - T[:, None, :3, 3], axis=-1)
    rot_err = jnp.linalg.norm((T_back[..., :3, :3] - T[:, None, :3, :3]).reshape(24, -1, 9), axis=-1)
    err = pos_err + rot_err
    err = jnp.where(valid, err, jnp.inf)
    best = np.asarray(jnp.min(err, axis=-1))
    # at least one candidate per pose reproduces it accurately
    assert (best < 5e-3).all(), best


def test_ik_solutions_are_consistent(rng):
    """All VALID solutions must reproduce the target pose (not just exist)."""
    q_true = jnp.asarray(random_q(rng, 8))
    T = iiwa.fk(q_true)
    qs, valid = iiwa.ik_batch(T, 16)
    T_back = iiwa.fk(qs.reshape(-1, 7)).reshape(8, -1, 4, 4)
    pos_err = np.asarray(jnp.linalg.norm(T_back[..., :3, 3] - T[:, None, :3, 3], axis=-1))
    v = np.asarray(valid)
    assert (pos_err[v] < 5e-3).all(), pos_err[v].max()


def test_ik_unreachable():
    T = np.eye(4)
    T[:3, 3] = [2.0, 0.0, 0.0]  # far out of the ~1.3 m workspace
    qs, valid = iiwa.ik(jnp.asarray(T))
    assert not bool(jnp.any(valid))


def test_ik_feasible_batch(rng):
    q_true = jnp.asarray(random_q(rng, 6))
    T_good = iiwa.fk(q_true)
    T_bad = jnp.tile(jnp.eye(4), (2, 1, 1)).at[:, 0, 3].set(3.0)
    Ts = jnp.concatenate([T_good, T_bad])
    feas = np.asarray(iiwa.ik_feasible(Ts))
    assert feas[:6].all()
    assert not feas[6:].any()


def test_ik_respects_limits(rng):
    q_true = jnp.asarray(random_q(rng, 4))
    T = iiwa.fk(q_true)
    qs, valid = iiwa.ik_batch(T, 16)
    q_v = np.asarray(qs)[np.asarray(valid)]
    assert (np.abs(q_v) <= iiwa.JOINT_LIMITS + 1e-5).all()
