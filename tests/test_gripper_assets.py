"""Gripper asset import/export (reference RobotGripper.load format) and
add_duplicate_object_on_pile."""
import jax
import jax.numpy as jnp
import numpy as np

from catgrasp_tpu.geom import csg as csglib
from catgrasp_tpu.geom import primitives as prim
from catgrasp_tpu.grasp.gripper import Gripper
from catgrasp_tpu.sim import engine, env_pile
from catgrasp_tpu.sim.types import build_shape_lib


def test_gripper_save_load_roundtrip(tmp_path):
    g = Gripper.default()
    d = str(tmp_path / "gripper")
    g.save(d)
    g2 = Gripper.load(d)
    s, s2 = g.spec, g2.spec
    assert abs(s.max_width - s2.max_width) < 1e-6
    assert abs(s.finger_len - s2.finger_len) < 1e-5
    assert abs(s.finger_thickness - s2.finger_thickness) < 1e-5
    assert abs(s.finger_depth - s2.finger_depth) < 1e-5
    np.testing.assert_allclose(g2.ee_in_grasp, g.ee_in_grasp, atol=1e-6)
    # meshes round-trip through the gripper-base frame
    assert len(g2.mesh_open.vertices) == len(g.mesh_open.vertices)


def test_add_duplicate_object_on_pile():
    lib = build_shape_lib(
        [prim.make_instance("nut", "train", i) for i in range(2)],
        [csglib.make_csg_instance("nut", "train", i) for i in range(2)],
        n_surf=32)
    cfg = env_pile.PileConfig(max_bodies=6)
    env = engine.StaticEnv.open_bin(cfg.bin_inner)
    state, params = env_pile.reset(jax.random.PRNGKey(0), lib, cfg,
                                   n_objects=jnp.int32(3))
    state = state.replace(active=jnp.arange(6) < 3)
    n0 = int(np.asarray(state.active).sum())
    state, params = env_pile.add_duplicate_object_on_pile(
        jax.random.PRNGKey(1), state, params, jnp.int32(1), jnp.float32(1.1),
        jnp.int32(2), cfg, lib)
    act = np.asarray(state.active)
    assert act.sum() == n0 + 2
    new = np.where(act & (np.arange(6) >= 3))[0]
    assert (np.asarray(params.shape_id)[new] == 1).all()
    np.testing.assert_allclose(np.asarray(params.scale)[new], 1.1)
    # spawned above the pile, inside the bin footprint
    pos = np.asarray(state.pos)[new]
    assert (pos[:, 2] >= 0.05).all() and (np.abs(pos[:, :2]) <= 0.16).all()
    # settles without blowup
    st = env_pile.settle_fixed(state, params, lib, env, cfg, 200)
    assert np.isfinite(np.asarray(st.pos)).all()
