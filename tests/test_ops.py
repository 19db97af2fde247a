"""Cross-checks of the Pallas hot-op kernels against their XLA reference
implementations (run in interpret mode on the CPU test mesh)."""
import jax
import jax.numpy as jnp
import numpy as np

from catgrasp_tpu.core import transforms as tf
from catgrasp_tpu.grasp import filter as gfilter
from catgrasp_tpu.ops import collision
from catgrasp_tpu.sim.env_grasp import GripperSpec


def random_poses(rng, n):
    T = np.zeros((n, 4, 4), np.float32)
    for i in range(n):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        T[i, :3, :3] = np.asarray(tf.quat_to_matrix(jnp.asarray(q)))
        T[i, :3, 3] = rng.uniform(-0.08, 0.08, 3)
        T[i, 3, 3] = 1.0
    return T


def test_box_hits_matches_xla_reference(rng):
    spec = GripperSpec()
    n_pose, n_pts = 37, 40  # deliberately unaligned with the tile sizes
    T = jnp.asarray(random_poses(rng, n_pose))
    cloud = jnp.asarray(rng.uniform(-0.15, 0.15, (n_pts, 3)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=n_pts) > 0.2)
    offsets = tuple(float(o) for o in gfilter.ADJUST_OFFSETS)
    margin = 5e-4

    boxes = gfilter._static_open_boxes(spec)
    T_inv = collision.pose_inverse_batch(T)
    hit = collision.box_hits(T_inv, cloud, mask, boxes, offsets, margin,
                             interpret=True)

    # XLA reference: per-pose transform + _hits_per_offset
    from catgrasp_tpu.sim.env_grasp import finger_boxes
    centers, halves = finger_boxes(jnp.asarray(spec.max_width), spec)
    offs = jnp.asarray(np.array(offsets, np.float32))

    def one(T_i):
        pts = tf.transform_points(tf.pose_inverse(T_i), cloud)
        return gfilter._hits_per_offset(pts, centers, halves, mask, offs, margin)

    ref = jax.vmap(one)(T)
    assert np.asarray(hit).shape == (n_pose, len(offsets))
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(ref))
    # the random scene must actually exercise both outcomes
    assert 0 < np.asarray(hit).sum() < hit.size


def test_filter_backends_agree(rng):
    spec = GripperSpec()
    G, S = 23, 2
    grasps = jnp.asarray(random_poses(rng, G))
    sym = jnp.stack([jnp.eye(4), jnp.diag(jnp.asarray([-1.0, -1.0, 1.0, 1.0]))])
    nocs_pose = jnp.eye(4)
    cam_in_world = jnp.eye(4)
    ee_in_grasp = jnp.eye(4)
    cloud = jnp.asarray(rng.uniform(-0.12, 0.12, (256, 3)).astype(np.float32))
    bg = jnp.asarray(rng.uniform(-0.2, 0.2, (128, 3)).astype(np.float32))
    m1 = jnp.ones((256,), bool)
    m2 = jnp.ones((128,), bool)

    out = {}
    for backend in ("xla", "pallas"):
        T, valid, stats = gfilter.filter_grasp_poses(
            grasps, sym, nocs_pose, cam_in_world, ee_in_grasp,
            cloud, bg, m1, m2, spec=spec,
            filter_approach=True, filter_ik=False, backend=backend)
        out[backend] = (np.asarray(T), np.asarray(valid))
    np.testing.assert_array_equal(out["xla"][1], out["pallas"][1])
    np.testing.assert_allclose(out["xla"][0], out["pallas"][0], atol=1e-6)
    assert out["xla"][1].sum() > 0
