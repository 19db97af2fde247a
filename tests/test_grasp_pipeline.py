"""End-to-end grasp sampling/filtering/scoring slice (tiny sizes for CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from catgrasp_tpu.core import transforms as tf
from catgrasp_tpu.grasp.filter import filter_grasp_poses
from catgrasp_tpu.grasp.gripper import Gripper
from catgrasp_tpu.grasp.sampler import PointConeGraspSampler, darboux_frames
from catgrasp_tpu.geom import primitives as prim
from catgrasp_tpu.sim.env_grasp import GripperSpec


@pytest.fixture(scope="module")
def gripper():
    return Gripper.default()


def test_darboux_frames_orthonormal(rng):
    mesh = prim.hex_nut()
    pts, nrm = mesh.sample_surface(256, rng, return_normals=True)
    ids = jnp.arange(16)
    R = np.asarray(darboux_frames(jnp.asarray(pts), jnp.asarray(nrm), ids, 0.004))
    eye = np.einsum("mij,mkj->mik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-4)
    # approach column opposes the surface normal
    dots = np.einsum("mi,mi->m", R[:, :, 0], nrm[:16])
    np.testing.assert_allclose(dots, -1.0, atol=1e-4)


def test_sampler_produces_candidates(gripper, rng):
    mesh = prim.hex_nut()
    pts, nrm = mesh.sample_surface(128, rng, return_normals=True)
    s = PointConeGraspSampler(gripper, max_num_samples=4, n_sphere_dir=3,
                              approach_step=0.01)
    poses = s.sample_grasp_poses(jax.random.PRNGKey(0), pts, nrm)
    assert poses.ndim == 3 and poses.shape[1:] == (4, 4)
    R = np.asarray(poses[:, :3, :3])
    eye = np.einsum("mij,mkj->mik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (len(R), 1, 1)), atol=1e-3)


def test_filter_gates(gripper):
    """Hand-built candidates exercise each gate of the filter."""
    spec = gripper.spec
    # camera convention: +z looks INTO the scene; the gate keeps grasps whose
    # approach points along +z (toward the scene, away from the camera),
    # common.cpp:199-212.
    R_toward = np.array([[0, 1, 0], [0, 0, 1], [1, 0, 0]], np.float32)  # x_g=+z_w
    R_away = np.array([[0, 1, 0], [0, 0, -1], [-1, 0, 0]], np.float32)  # x_g=-z_w
    # grasp A: approach toward the camera -> approach-rejected
    Ta = np.eye(4, dtype=np.float32)
    Ta[:3, :3] = R_away
    # grasp B: approach into the scene, far from cloud -> passes
    Tb = np.eye(4, dtype=np.float32)
    Tb[:3, :3] = R_toward
    Tb[:3, 3] = [0.5, 0.5, 0.5]
    # grasp C: approach into the scene, fingers at the cloud -> collision-rejected
    Tc = Tb.copy()
    Tc[:3, 3] = [0, 0.0, -0.03]

    cloud = np.zeros((64, 3), np.float32)  # dense blob at origin
    cloud += np.random.default_rng(0).normal(0, 0.002, (64, 3)).astype(np.float32)

    poses = jnp.asarray(np.stack([Ta, Tb, Tc]))
    T, valid, stats = filter_grasp_poses(
        poses, jnp.eye(4)[None], jnp.eye(4), jnp.eye(4),
        jnp.asarray(gripper.ee_in_grasp),
        jnp.asarray(cloud), jnp.asarray(cloud),
        jnp.ones(64, bool), jnp.ones(64, bool),
        spec=spec, filter_ik=False,
    )
    v = np.asarray(valid)
    assert not v[0]  # approach gate
    assert v[1]  # free
    assert not v[2]  # enclosed-volume collision (cloud inside closing region)
    assert int(stats["n_approach_dir_rej"]) == 1
    assert int(stats["n_collision_rej"]) >= 1


def test_filter_lateral_adjust(gripper):
    """A grasp whose finger barely clips the cloud should be saved by the
    ±1-3 mm lateral adjust, with its pose shifted accordingly."""
    spec = gripper.spec
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array([[0, 1, 0], [0, 0, 1], [1, 0, 0]], np.float32)  # x_g=+z_w
    T[:3, 3] = [0.3, 0.0, 0.0]
    # single cloud point just inside the +y finger inner face:
    # finger inner face at y_grasp = width/2 = 0.025 (world x offset)
    p_grasp = np.array([0.01, 0.0253, 0.0], np.float32)
    p_world = (T[:3, :3] @ p_grasp) + T[:3, 3]
    cloud = p_world[None].astype(np.float32)
    far = np.full((1, 3), 999.0, np.float32)  # enclosed volume vs background

    poses = jnp.asarray(T)[None]
    out, valid, _ = filter_grasp_poses(
        poses, jnp.eye(4)[None], jnp.eye(4), jnp.eye(4),
        jnp.asarray(gripper.ee_in_grasp),
        jnp.asarray(cloud), jnp.asarray(far),
        jnp.ones(1, bool), jnp.ones(1, bool),
        spec=spec, filter_ik=False, margin=1e-4,
    )
    assert bool(valid[0])
    shift = np.asarray(out[0, :3, 3]) - T[:3, 3]
    # shifted along closing axis (world -x is grasp +y ... verify nonzero)
    assert 5e-4 < np.linalg.norm(shift) <= 3.2e-3


def test_filter_ik_gate(gripper):
    """Pose out of the arm workspace must be IK-rejected."""
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array([[0, 1, 0], [0, 0, 1], [1, 0, 0]], np.float32)
    T[:3, 3] = [5.0, 0, 0]  # unreachable
    far = np.full((1, 3), 999.0, np.float32)
    _, valid, stats = filter_grasp_poses(
        jnp.asarray(T)[None], jnp.eye(4)[None], jnp.eye(4), jnp.eye(4),
        jnp.asarray(gripper.ee_in_grasp), jnp.asarray(far), jnp.asarray(far),
        jnp.ones(1, bool), jnp.ones(1, bool),
        spec=gripper.spec, filter_ik=True, n_psi=8,
    )
    assert not bool(valid[0])
    assert int(stats["n_ik_rej"]) == 1
