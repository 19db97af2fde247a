import jax
import jax.numpy as jnp
import numpy as np
import pytest

from catgrasp_tpu.core import transforms as tf
from catgrasp_tpu.core.symmetry import get_symmetry_tfs
from catgrasp_tpu.core.sampling import icosphere_directions, cone_directions


def random_rotations(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return q


def test_quat_matrix_roundtrip(rng):
    q = jnp.asarray(random_rotations(rng, 64))
    R = tf.quat_to_matrix(q)
    # R must be orthonormal with det +1
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    q2 = tf.matrix_to_quat(R)
    # quaternion double cover: q == ±q2
    dot = np.abs(np.sum(np.asarray(q) * np.asarray(q2), axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    q = jnp.asarray(random_rotations(rng, 16))
    v = jnp.asarray(rng.normal(size=(16, 3)))
    r1 = tf.quat_rotate(q, v)
    r2 = jnp.einsum("bij,bj->bi", tf.quat_to_matrix(q), v)
    np.testing.assert_allclose(r1, r2, atol=1e-5)


def test_quat_mul_composition(rng):
    a = jnp.asarray(random_rotations(rng, 8))
    b = jnp.asarray(random_rotations(rng, 8))
    R1 = tf.quat_to_matrix(tf.quat_mul(a, b))
    R2 = tf.quat_to_matrix(a) @ tf.quat_to_matrix(b)
    np.testing.assert_allclose(R1, R2, atol=1e-5)


def test_pose_inverse(rng):
    q = jnp.asarray(random_rotations(rng, 8))
    t = jnp.asarray(rng.normal(size=(8, 3)))
    T = tf.pose_from_qt(q, t)
    eye = T @ tf.pose_inverse(T)
    np.testing.assert_allclose(eye, np.tile(np.eye(4), (8, 1, 1)), atol=1e-5)


def test_euler_sxyz_matches_reference_convention():
    # transformations.euler_matrix(ax,ay,az,'sxyz') == Rz(az)@Ry(ay)@Rx(ax)
    ax, ay, az = 0.3, -0.7, 1.1
    T = np.asarray(tf.euler_matrix_sxyz(ax, ay, az))
    Rx = np.asarray(tf.rotation_x(ax))[:3, :3]
    Ry = np.asarray(tf.rotation_y(ay))[:3, :3]
    Rz = np.asarray(tf.rotation_z(az))[:3, :3]
    np.testing.assert_allclose(T[:3, :3], Rz @ Ry @ Rx, atol=1e-6)


def test_direction_vec_to_rotation(rng):
    dirs = rng.normal(size=(32, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    ref = jnp.array([1.0, 0.0, 0.0])
    R = tf.direction_vec_to_rotation(jnp.asarray(dirs), jnp.broadcast_to(ref, (32, 3)))
    mapped = np.einsum("bij,j->bi", np.asarray(R), np.array([1.0, 0, 0]))
    np.testing.assert_allclose(mapped, dirs, atol=1e-4)
    # antiparallel edge case
    R = tf.direction_vec_to_rotation(jnp.array([-1.0, 0, 0]), ref)
    np.testing.assert_allclose(np.asarray(R) @ np.array([1.0, 0, 0]), [-1, 0, 0], atol=1e-5)


def test_geodesic_distance():
    R1 = np.asarray(tf.rotation_z(0.0))[:3, :3]
    R2 = np.asarray(tf.rotation_z(0.5))[:3, :3]
    d = tf.geodesic_distance(jnp.asarray(R1), jnp.asarray(R2))
    np.testing.assert_allclose(d, 0.5, atol=1e-5)


def test_random_uniform_magnitude_bounds():
    key = jax.random.PRNGKey(0)
    T = tf.random_uniform_magnitude(key, max_t=0.005, max_r_deg=10.0, shape=(256,))
    t_mag = np.linalg.norm(np.asarray(T[:, :3, 3]), axis=-1)
    assert (t_mag <= 0.005 + 1e-6).all()
    ang = np.asarray(tf.geodesic_distance(jnp.asarray(T[:, :3, :3]), jnp.eye(3)))
    assert (ang <= np.deg2rad(10.0) + 1e-4).all()


@pytest.mark.parametrize("cls,count", [("nut", 12), ("hnm", 2), ("screw", 72)])
def test_symmetry_tables(cls, count):
    tfs = get_symmetry_tfs(cls)
    assert tfs.shape == (count, 4, 4)
    # proper rotations
    np.testing.assert_allclose(np.linalg.det(tfs[:, :3, :3]), 1.0, atol=1e-5)
    # group closure under composition for z-rotation subgroup (screw)
    if cls == "screw":
        prod = tfs[1] @ tfs[1]
        assert min(np.abs(tfs - prod).sum(axis=(1, 2))) < 1e-4


def test_icosphere_directions():
    pts = icosphere_directions(1000)
    assert len(pts) >= 1000
    np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), 1.0, atol=1e-5)
    cone = cone_directions(1000, 60.0)  # axis +x
    # all within 60 deg of +x
    assert (cone[:, 0] >= np.cos(np.deg2rad(60)) - 1e-5).all()


def test_depth_to_xyzmap_roundtrip(rng):
    from catgrasp_tpu.core.camera import depth_to_xyzmap, project_points
    K = jnp.array([[200.0, 0, 32], [0, 200.0, 24], [0, 0, 1]])
    depth = jnp.asarray(rng.uniform(0.5, 2.0, size=(48, 64)).astype(np.float32))
    xyz = depth_to_xyzmap(depth, K)
    np.testing.assert_allclose(xyz[..., 2], depth, atol=1e-5)
    uv = project_points(xyz.reshape(-1, 3), K).reshape(48, 64, 2)
    us, vs = np.meshgrid(np.arange(64), np.arange(48))
    np.testing.assert_allclose(np.asarray(uv[..., 0]), us, atol=1e-2)
    np.testing.assert_allclose(np.asarray(uv[..., 1]), vs, atol=1e-2)


def test_quat_slerp_endpoints_and_midpoint():
    axis = jnp.array([0.0, 0.0, 1.0])
    q0 = tf.quat_identity()
    q1 = tf.quat_from_axis_angle(axis, jnp.float32(np.pi / 2))
    a = jnp.array([0.0, 0.5, 1.0])
    q = tf.quat_slerp(jnp.broadcast_to(q0, (3, 4)), jnp.broadcast_to(q1, (3, 4)), a)
    np.testing.assert_allclose(np.abs(np.sum(np.asarray(q[0]) * np.asarray(q0))), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.sum(np.asarray(q[2]) * np.asarray(q1))), 1.0, atol=1e-5)
    # midpoint = 45 deg about z
    q_mid = tf.quat_from_axis_angle(axis, jnp.float32(np.pi / 4))
    np.testing.assert_allclose(np.abs(np.sum(np.asarray(q[1]) * np.asarray(q_mid))), 1.0, atol=1e-5)


def test_quat_slerp_shortest_arc():
    # q and -q are the same rotation; slerp must not take the long way
    axis = jnp.array([1.0, 0.0, 0.0])
    q0 = tf.quat_from_axis_angle(axis, jnp.float32(0.1))
    q1 = -tf.quat_from_axis_angle(axis, jnp.float32(0.3))
    q = tf.quat_slerp(q0, q1, jnp.float32(0.5))
    expect = tf.quat_from_axis_angle(axis, jnp.float32(0.2))
    assert float(jnp.abs(jnp.sum(q * expect))) > 1 - 1e-5


def test_interpolate_poses_matches_reference_semantics(rng):
    # translation lerps, rotation slerps, endpoints exact
    T0 = np.eye(4, dtype=np.float32)
    T0[:3, 3] = [0.1, -0.2, 0.3]
    T1 = np.asarray(tf.pose_from_rt(tf.quat_to_matrix(
        tf.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), jnp.float32(1.0))),
        jnp.array([-0.1, 0.0, 0.5])))
    alphas = jnp.linspace(0.0, 1.0, 7)
    Ts = np.asarray(tf.interpolate_poses(jnp.asarray(T0), jnp.asarray(T1), alphas))
    np.testing.assert_allclose(Ts[0], T0, atol=1e-5)
    np.testing.assert_allclose(Ts[-1], T1, atol=1e-5)
    np.testing.assert_allclose(Ts[3][:3, 3], (T0[:3, 3] + T1[:3, 3]) / 2, atol=1e-5)
    # orthonormal rotations throughout
    for T in Ts:
        np.testing.assert_allclose(T[:3, :3] @ T[:3, :3].T, np.eye(3), atol=1e-5)
