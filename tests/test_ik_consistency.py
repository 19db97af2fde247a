"""Gate/solver consistency: `ik_feasible` (the branch-free filter gate) vs
`ik` (the solution enumerator) must agree — a pose that passes the filter
but yields no executable solution would fail only at arm-execution time
(and vice versa wastes candidates).  SURVEY §7.6 called for validating IK
against an oracle on sampled poses; the reference's gate IS its solver
(``my_cpp/common.cpp:9-72`` calls ikfast and checks limits), so gate ==
solver there by construction.  Here they are separate programs, and this
test bounds their disagreement below 1% on 10k+ poses (VERDICT r2 #7).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from catgrasp_tpu.kin import iiwa


def _fk_reachable_poses(n, seed):
    """Poses guaranteed reachable: FK of uniformly sampled in-limit q."""
    rng = np.random.default_rng(seed)
    q = rng.uniform(iiwa.LOWER, iiwa.UPPER, (n, 7)).astype(np.float32)
    return np.asarray(jax.vmap(iiwa.fk)(jnp.asarray(q)))


def _random_workspace_poses(n, seed):
    """Random rotation x position in the reachable shell — a mix of
    feasible, limit-straddling, and unreachable poses."""
    rng = np.random.default_rng(seed)
    pos = rng.normal(size=(n, 3))
    pos /= np.linalg.norm(pos, axis=1, keepdims=True)
    r = rng.uniform(0.1, 1.4, (n, 1))  # beyond max reach ~1.18 m included
    pos = pos * r + np.array([0.0, 0.0, iiwa.D_BS])
    qr = rng.normal(size=(n, 4))
    qr /= np.linalg.norm(qr, axis=1, keepdims=True)
    from catgrasp_tpu.core import transforms as tf
    R = np.asarray(jax.vmap(tf.quat_to_matrix)(jnp.asarray(qr)))
    T = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    T[:, :3, :3] = R
    T[:, :3, 3] = pos
    return T


def _solver_any_valid(Ts, chunk=512):
    out = []
    f = jax.jit(jax.vmap(lambda T: jnp.any(iiwa.ik(T)[1])))
    for i in range(0, len(Ts), chunk):
        out.append(np.asarray(f(jnp.asarray(Ts[i:i + chunk]))))
    return np.concatenate(out)


def test_gate_matches_solver_on_reachable_poses():
    Ts = _fk_reachable_poses(6144, seed=0)
    gate = np.asarray(iiwa.ik_feasible(jnp.asarray(Ts)))
    sol = _solver_any_valid(Ts)
    # FK poses are exactly solvable, so both should overwhelmingly accept;
    # disagreement = grid/limit edge effects only
    mismatch = (gate != sol).mean()
    assert mismatch < 0.01, f"gate/solver mismatch {mismatch:.3%} on reachable poses"
    # neither direction may dominate pathologically
    assert (gate & ~sol).mean() < 0.01   # gate accepts, solver empty
    assert (~gate & sol).mean() < 0.01   # solver finds, gate rejects


def test_gate_matches_solver_on_workspace_mix():
    Ts = _random_workspace_poses(6144, seed=1)
    gate = np.asarray(iiwa.ik_feasible(jnp.asarray(Ts)))
    sol = _solver_any_valid(Ts)
    mismatch = (gate != sol).mean()
    assert mismatch < 0.01, f"gate/solver mismatch {mismatch:.3%} on workspace poses"


def test_valid_solutions_reproduce_pose():
    """FK error of every valid ik() branch: position < 2 mm, rotation
    geodesic < 0.5 deg (the solver must not emit unexecutable branches)."""
    Ts = _fk_reachable_poses(256, seed=2)

    @jax.jit
    @jax.vmap
    def errs(T):
        qs, valid = iiwa.ik(T)
        Tr = jax.vmap(iiwa.fk)(qs)
        perr = jnp.linalg.norm(Tr[:, :3, 3] - T[:3, 3], axis=-1)
        tr = jnp.einsum("nij,ij->n", Tr[:, :3, :3], T[:3, :3])
        rerr = jnp.arccos(jnp.clip((tr - 1) / 2, -1, 1))
        big = jnp.where(valid, perr, 0.0), jnp.where(valid, rerr, 0.0)
        return big[0].max(), big[1].max(), valid.any()

    pe, re, any_valid = errs(jnp.asarray(Ts))
    pe, re = np.asarray(pe), np.asarray(re)
    assert np.asarray(any_valid).mean() > 0.95
    assert pe.max() < 2e-3, f"worst valid-branch position error {pe.max()*1e3:.2f} mm"
    assert np.rad2deg(re.max()) < 0.5, f"worst rotation error {np.rad2deg(re.max()):.3f} deg"


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
