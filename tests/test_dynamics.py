"""Articulated iiwa dynamics (kin/dynamics.py): invariants, not URDF
numbers — FK chain identity, M(q) SPD + RNEA consistency, energy
conservation, gravity passivity, force-limited PD tracking."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from catgrasp_tpu.kin import dynamics as dyn
from catgrasp_tpu.kin import iiwa

Q0 = jnp.asarray(np.deg2rad([10.0, 30.0, -20.0, -60.0, 15.0, 45.0, 5.0]))


def test_chain_matches_iiwa_fk():
    for q in [jnp.zeros(7), Q0, -Q0 * 0.7]:
        T_dyn = np.asarray(dyn.fk_flange(q))
        T_kin = np.asarray(iiwa.fk(q))
        assert np.allclose(T_dyn, T_kin, atol=1e-6)


def test_mass_matrix_spd_and_symmetric():
    M = np.asarray(dyn.mass_matrix(Q0))
    assert np.allclose(M, M.T, atol=1e-8)
    eig = np.linalg.eigvalsh(M)
    assert eig.min() > 0


def test_rnea_decomposition():
    # rnea(q, qd, qdd) == M(q) qdd + bias(q, qd) for arbitrary qdd
    rng = np.random.default_rng(0)
    qd = jnp.asarray(rng.uniform(-1, 1, 7))
    qdd = jnp.asarray(rng.uniform(-3, 3, 7))
    lhs = dyn.rnea(Q0, qd, qdd)
    rhs = dyn.mass_matrix(Q0) @ qdd + dyn.bias_forces(Q0, qd)
    # f32 chain: torques reach ~20 Nm, so the identity holds to relative
    # precision, not an absolute 1e-8
    assert np.allclose(lhs, rhs, rtol=1e-4, atol=1e-5)


def test_energy_conserved_unforced():
    # zero gravity, zero torque: kinetic energy is an invariant
    h = 1e-3
    qd0 = jnp.asarray([0.3, -0.2, 0.4, 0.1, -0.3, 0.2, 0.5])

    def step(carry, _):
        q, qd = carry
        qdd = dyn.forward_dynamics(q, qd, jnp.zeros(7), gravity=jnp.zeros(3))
        qd = qd + h * qdd
        q = q + h * qd
        return (q, qd), None

    (q1, qd1), _ = jax.lax.scan(jax.jit(step), (Q0, qd0), None, length=300)
    e0 = float(dyn.kinetic_energy(Q0, qd0))
    e1 = float(dyn.kinetic_energy(q1, qd1))
    assert e1 == pytest.approx(e0, rel=0.02)


def test_gravity_passivity():
    # released from rest under gravity: total energy conserved, potential
    # converted to kinetic (arm falls)
    h = 5e-4

    def step(carry, _):
        q, qd = carry
        qdd = dyn.forward_dynamics(q, qd, jnp.zeros(7))
        qd = qd + h * qdd
        q = q + h * qd
        return (q, qd), None

    (q1, qd1), _ = jax.lax.scan(jax.jit(step), (Q0, jnp.zeros(7)), None,
                                length=200)
    pe0, pe1 = float(dyn.potential_energy(Q0)), float(dyn.potential_energy(q1))
    ke1 = float(dyn.kinetic_energy(q1, qd1))
    assert pe1 < pe0  # fell
    assert pe0 == pytest.approx(pe1 + ke1, abs=0.05 * max(ke1, 1e-3) + 1e-3)


def test_pd_holds_posture_under_gravity():
    traj = jnp.tile(Q0, (30, 1))
    qs, taus = dyn.track_schedule(Q0, traj)
    err = np.abs(np.asarray(qs[-1]) - np.asarray(Q0))
    assert err.max() < np.deg2rad(3.0)
    # applied torques stay inside the rated limits
    assert np.all(np.abs(np.asarray(taus)) <= dyn.TORQUE_LIMITS + 1e-6)


def test_force_limit_saturates():
    # absurdly low torque limit: the arm cannot hold the posture and sags
    traj = jnp.tile(Q0, (30, 1))
    qs, _ = dyn.track_schedule(Q0, traj, tau_max=jnp.full(7, 1.0))
    err = np.abs(np.asarray(qs[-1]) - np.asarray(Q0))
    assert err.max() > np.deg2rad(5.0)


def test_tracks_slow_schedule():
    # slow joint-space ramp tracked within a few degrees at every waypoint
    T = 60
    goal = Q0 + jnp.asarray(np.deg2rad([20, -10, 15, 10, -20, 15, 30]))
    alphas = jnp.linspace(0.0, 1.0, T)[:, None]
    ramp = Q0[None] * (1 - alphas) + goal[None] * alphas
    # schedules end with a short settle hold (as the pipeline's do)
    traj = jnp.concatenate([ramp, jnp.tile(goal, (15, 1))])
    qs, _ = dyn.track_schedule(Q0, traj)
    err = np.abs(np.asarray(qs) - np.asarray(traj))
    assert err.max() < np.deg2rad(4.0)  # bounded lag while moving
    assert np.abs(np.asarray(qs[-1]) - np.asarray(goal)).max() < np.deg2rad(1.0)


def test_dynamicize_schedule_roundtrip():
    from catgrasp_tpu.sim.arm import dynamicize_schedule, resample_traj
    path = np.stack([np.asarray(Q0), np.asarray(Q0) + 0.1])
    sched = resample_traj(path, 40)
    out = dynamicize_schedule(sched)
    assert out.shape == sched.shape and out.dtype == np.float32
    # achieved trajectory tracks the commanded one
    assert np.abs(out - sched).max() < np.deg2rad(4.0)
