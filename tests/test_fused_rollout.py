"""Fused Pallas rollout vs the reference XLA engine.

Same algorithm, different storage (bf16 narrowphase slabs, finite-diff
normals), so the contract is trajectory agreement within a loose tolerance
over a short horizon plus tight agreement on the things the pipelines
consume: resting heights, active masks, energy decay.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from catgrasp_tpu.geom import primitives as prim
from catgrasp_tpu.geom.csg import make_csg_instance
from catgrasp_tpu.ops.fused_rollout import rollout_fused
from catgrasp_tpu.sim import engine, env_pile
from catgrasp_tpu.sim.types import build_shape_lib


@pytest.fixture(scope="module")
def setup():
    cfg = env_pile.PileConfig(max_bodies=4)
    specs = [("nut", 0), ("screw", 0)]
    meshes = [prim.make_instance(c, "train", i) for c, i in specs]
    csgs = [make_csg_instance(c, "train", i) for c, i in specs]
    lib = build_shape_lib(meshes, csgs, n_surf=16)
    env = engine.StaticEnv.open_bin(cfg.bin_inner)
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states, params = jax.vmap(lambda k: env_pile.reset(k, lib, cfg))(keys)
    return cfg, lib, env, states, params


def test_fused_matches_engine_short_horizon(setup):
    cfg, lib, env, states, params = setup
    n = 20
    ref = jax.vmap(lambda s, p: engine.rollout(s, p, lib, env, n, dt=cfg.dt))(
        states, params)
    fused = rollout_fused(states, params, lib, env, n, dt=cfg.dt,
                          interpret=True)
    act = np.asarray(ref.active)
    dp = np.linalg.norm(np.asarray(ref.pos - fused.pos), axis=-1)
    dp = np.where(act, dp, 0.0)
    # bf16 slabs + FD normals: mm-scale divergence over 20 contact-rich steps
    assert dp.max() < 0.01, f"max pos divergence {dp.max()*1e3:.2f} mm"
    dq = np.abs(np.asarray(ref.quat) - np.asarray(fused.quat)).max()
    assert dq < 0.05, f"quat divergence {dq}"


def test_fused_settles_like_engine(setup):
    """Long-horizon: trajectories may diverge chaotically, but the pile must
    settle to the same statistics — every body inside the bin, resting near
    the floor, velocities damped out."""
    cfg, lib, env, states, params = setup
    n = 150
    ref = jax.vmap(lambda s, p: engine.rollout(s, p, lib, env, n, dt=cfg.dt))(
        states, params)
    fused = rollout_fused(states, params, lib, env, n, dt=cfg.dt,
                          interpret=True)
    act = np.asarray(ref.active)
    zr = np.asarray(ref.pos[..., 2])[act]
    zf = np.asarray(fused.pos[..., 2])[act]
    assert abs(zr.mean() - zf.mean()) < 0.01
    assert np.asarray(fused.pos[..., 2])[act].min() > -0.02  # nothing tunneled
    vf = np.linalg.norm(np.asarray(fused.linvel), axis=-1)[act]
    vr = np.linalg.norm(np.asarray(ref.linvel), axis=-1)[act]
    assert vf.mean() < max(2 * vr.mean(), 0.05)


def test_fused_settle_is_dt_robust(setup):
    """Split-impulse guard: halving dt (doubling steps over the same
    horizon) must not change settle statistics.  Under the r4
    bias-in-velocity Baumgarte the bias scaled with 1/dt and injected
    momentum every step, so dt halving visibly pumped the pile (the same
    mechanism the engine self-parity dt sweep flagged at KS 0.58); in the
    pseudo-velocity channel the positional correction is dt-invariant."""
    cfg, lib, env, states, params = setup
    a = rollout_fused(states, params, lib, env, 120, dt=cfg.dt,
                      interpret=True)
    b = rollout_fused(states, params, lib, env, 240, dt=cfg.dt / 2,
                      interpret=True)
    act = np.asarray(a.active)
    za = np.asarray(a.pos[..., 2])[act]
    zb = np.asarray(b.pos[..., 2])[act]
    assert abs(za.mean() - zb.mean()) < 0.01, (
        f"settle height drifted under dt halving: {za.mean():.4f} vs "
        f"{zb.mean():.4f}")
    vb = np.linalg.norm(np.asarray(b.linvel), axis=-1)[act]
    assert vb.mean() < 0.1, f"pile still live at dt/2: {vb.mean():.3f} m/s"


def test_fused_static_bodies_do_not_move(setup):
    cfg, lib, env, states, params = setup
    params = params.replace(
        mass=params.mass.at[:, 0].set(1e9),
        inertia=params.inertia.at[:, 0].set(1e9))
    p0 = states.pos[:, 0].copy()
    fused = rollout_fused(states, params, lib, env, 30, dt=cfg.dt,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(fused.pos[:, 0]), np.asarray(p0),
                               atol=1e-6)


def test_fused_pads_ragged_batch(setup):
    cfg, lib, env, states, params = setup
    # B=8 is not a multiple of 128: exercises the pad path end-to-end
    out = rollout_fused(states, params, lib, env, 5, dt=cfg.dt, interpret=True)
    assert out.pos.shape == states.pos.shape


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
