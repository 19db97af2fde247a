"""Scene snapshot/restore: exact rollback and dataset-record round trips."""
import jax
import jax.numpy as jnp
import numpy as np

from catgrasp_tpu.geom import csg as csglib, primitives as prim
from catgrasp_tpu.sim import engine, env_pile, snapshot
from catgrasp_tpu.sim.types import build_shape_lib


def _scene():
    lib = build_shape_lib([prim.make_instance("nut", "train", 0)],
                          [csglib.make_csg_instance("nut", "train", 0)],
                          n_surf=32)
    cfg = env_pile.PileConfig(max_bodies=3)
    env = engine.StaticEnv.open_bin(cfg.bin_inner)
    state, params = env_pile.reset(jax.random.PRNGKey(0), lib, cfg)
    return lib, cfg, env, state, params


def test_rollback_is_exact():
    lib, cfg, env, state, params = _scene()
    state = env_pile.settle_fixed(state, params, lib, env, cfg, 50)
    snap = snapshot.save_state(state)
    # speculative action: keep stepping
    later = env_pile.settle_fixed(state, params, lib, env, cfg, 100)
    assert not np.allclose(np.asarray(later.pos), np.asarray(snap.pos))
    restored = snapshot.restore_state(snap)
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(snap)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resuming from the restored state reproduces the same future exactly
    later2 = env_pile.settle_fixed(restored, params, lib, env, cfg, 100)
    np.testing.assert_array_equal(np.asarray(later.pos), np.asarray(later2.pos))


def test_scene_file_roundtrip(tmp_path):
    lib, cfg, env, state, params = _scene()
    state = env_pile.settle_fixed(state, params, lib, env, cfg, 50)
    path = str(tmp_path / "scene.npz")
    snapshot.save_scene_npz(path, state, params, note="x")
    rec = dict(np.load(path))
    st2, pr2 = snapshot.scene_from_record(rec, lib)
    np.testing.assert_allclose(np.asarray(st2.pos), np.asarray(state.pos),
                               atol=1e-6)
    # quaternion sign is gauge; compare rotations via the pose matrices
    from catgrasp_tpu.core import transforms as tf
    R1 = np.asarray(jax.vmap(tf.quat_to_matrix)(state.quat))
    R2 = np.asarray(jax.vmap(tf.quat_to_matrix)(st2.quat))
    np.testing.assert_allclose(R1, R2, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(pr2.shape_id),
                                  np.asarray(params.shape_id))
    # pile-data records (no velocities) restore at rest
    rec.pop("linvel"); rec.pop("angvel")
    st3, _ = snapshot.scene_from_record(rec, lib)
    assert float(jnp.abs(st3.linvel).max()) == 0.0
