"""Renderer output conventions — frames and orientations.

Regression for the world/camera normal-frame mismatch that starved the
closed-loop pipeline of grasp candidates (approach gate rejected ~96%)."""
import jax
import jax.numpy as jnp
import numpy as np

from catgrasp_tpu.geom import csg as csglib, primitives as prim
from catgrasp_tpu.render import raymarch
from catgrasp_tpu.sim import engine
from catgrasp_tpu.sim.types import SceneParams, SceneState, build_shape_lib


def _one_object_scene():
    meshes = [prim.make_instance("nut", "train", 0)]
    csgs = [csglib.make_csg_instance("nut", "train", 0)]
    lib = build_shape_lib(meshes, csgs, n_surf=32)
    shape_id = jnp.zeros((1,), jnp.int32)
    scale = jnp.ones((1,), jnp.float32)
    params = SceneParams.create(lib, shape_id, scale)
    state = SceneState(
        pos=jnp.zeros((1, 3)).at[0, 2].set(0.05),
        quat=jnp.tile(jnp.array([1.0, 0, 0, 0]), (1, 1)),
        linvel=jnp.zeros((1, 3)), angvel=jnp.zeros((1, 3)),
        active=jnp.ones((1,), bool),
    )
    return lib, state, params


def _cam(z=0.5):
    cam = np.eye(4, dtype=np.float32)
    cam[:3, :3] = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32)
    cam[:3, 3] = [0, 0, z]
    return jnp.asarray(cam)


def test_render_normals_cam_frame_toward_camera():
    lib, state, params = _one_object_scene()
    H = W = 96
    K = jnp.array([[450.0, 0, W / 2], [0, 450.0, H / 2], [0, 0, 1.0]])
    out = raymarch.render(lib, state, params, K, _cam(0.35), H, W)
    seg = np.asarray(out["seg"])
    xyz = np.asarray(out["xyz"])
    nrm = np.asarray(out["normal"])
    m = seg == 0
    assert m.sum() > 50

    # cam-frame cloud: everything in front of the camera
    assert (xyz[m][:, 2] > 0).all()
    # unit normals
    np.testing.assert_allclose(np.linalg.norm(nrm[m], axis=-1), 1.0, atol=1e-3)
    # oriented toward the camera: n . viewdir(pixel ray) < 0 for all hits
    dots = np.sum(nrm[m] * xyz[m], axis=-1) / np.linalg.norm(xyz[m], axis=-1)
    assert (dots < 1e-4).all()
    # top-down view of the nut's flat top face: dominant normal is -z (cam)
    flat = nrm[m][:, 2] < -0.99
    assert flat.mean() > 0.3


def test_render_rgb_shaded():
    lib, state, params = _one_object_scene()
    H = W = 64
    K = jnp.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1.0]])
    out = raymarch.render(lib, state, params, K, _cam(0.35), H, W)
    rgb = np.asarray(out["rgb"])
    seg = np.asarray(out["seg"])
    assert rgb.shape == (H, W, 3)
    assert (rgb >= 0).all() and (rgb <= 1).all()
    assert rgb[seg == -1].max() == 0.0           # misses are black
    assert rgb[seg == 0].mean() > 0.1            # object lit
    # flat top face brighter than grazing side pixels (Lambertian)
    m = seg == 0
    nz = np.asarray(out["normal"])[..., 2]
    flat = m & (nz < -0.95)
    side = m & (nz > -0.5)
    if flat.any() and side.any():
        assert rgb[flat].mean() > rgb[side].mean()


def test_render_depth_matches_xyz_z():
    lib, state, params = _one_object_scene()
    H = W = 64
    K = jnp.array([[180.0, 0, W / 2], [0, 180.0, H / 2], [0, 0, 1.0]])
    out = raymarch.render(lib, state, params, K, _cam(), H, W)
    m = np.asarray(out["seg"]) >= 0
    np.testing.assert_allclose(np.asarray(out["depth"])[m],
                               np.asarray(out["xyz"])[m][:, 2], atol=1e-4)
