"""Sharded rollout on the 8-device CPU mesh: placement + parity with the
unsharded path."""
import jax
import jax.numpy as jnp
import numpy as np

from catgrasp_tpu.geom import csg as csglib, primitives as prim
from catgrasp_tpu.parallel.mesh import make_mesh
from catgrasp_tpu.parallel.rollout import sharded_map, sharded_rollout
from catgrasp_tpu.sim import engine, env_pile
from catgrasp_tpu.sim.types import build_shape_lib


def test_sharded_rollout_matches_local():
    lib = build_shape_lib([prim.make_instance("nut", "train", 0)],
                          [csglib.make_csg_instance("nut", "train", 0)],
                          n_surf=16)
    cfg = env_pile.PileConfig(max_bodies=2)
    env = engine.StaticEnv.open_bin(cfg.bin_inner)
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states, params = jax.vmap(lambda k: env_pile.reset(k, lib, cfg))(keys)

    mesh = make_mesh(8)
    out = sharded_rollout(mesh, states, params, lib, env, n_steps=10)
    # sharded over dp
    assert len(out.pos.sharding.device_set) == 8
    ref = jax.vmap(lambda s, p: engine.rollout(s, p, lib, env, 10))(states, params)
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               atol=1e-5)


def test_sharded_map():
    mesh = make_mesh(8)
    x = jnp.arange(16.0).reshape(16, 1)
    y = sharded_map(mesh, lambda v: v * 2 + 1, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) * 2 + 1)
    assert len(y.sharding.device_set) == 8


def test_multislice_mesh_rollout_parity():
    """2 slices x (dp=2, mp=2): batch shards over ("slice","dp") — the DCN
    x ICI layout — and the physics matches the unsharded path exactly."""
    from catgrasp_tpu.parallel.mesh import make_multislice_mesh

    lib = build_shape_lib([prim.make_instance("nut", "train", 0)],
                          [csglib.make_csg_instance("nut", "train", 0)],
                          n_surf=16)
    cfg = env_pile.PileConfig(max_bodies=2)
    env = engine.StaticEnv.open_bin(cfg.bin_inner)
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states, params = jax.vmap(lambda k: env_pile.reset(k, lib, cfg))(keys)

    mesh = make_multislice_mesh(2, mp=2)
    assert mesh.axis_names == ("slice", "dp", "mp")
    out = sharded_rollout(mesh, states, params, lib, env, n_steps=10)
    ref = jax.vmap(lambda s, p: engine.rollout(s, p, lib, env, 10))(states, params)
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               atol=1e-5)


def test_multislice_gradient_reduction():
    """Data-parallel gradients over the ("slice","dp") axes equal the
    single-device gradient: XLA's hierarchical all-reduce (ICI then DCN)
    is numerically the same mean."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from catgrasp_tpu.parallel.mesh import make_multislice_mesh, dp_sharding

    mesh = make_multislice_mesh(2, mp=1)  # slice=2, dp=4
    w = jnp.array([[0.5, -1.0], [2.0, 0.25]])
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 2))

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_local = jax.grad(loss)(w, x)
    gfn = jax.jit(jax.grad(loss),
                  in_shardings=(NamedSharding(mesh, P()), dp_sharding(mesh)),
                  out_shardings=NamedSharding(mesh, P()))
    g_sharded = gfn(w, jax.device_put(x, dp_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_local),
                               rtol=1e-6)
