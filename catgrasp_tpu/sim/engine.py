"""Vmapped rigid-body contact engine.

This is the TPU replacement for PyBullet stepping (SURVEY.md N8): a pure
function ``step(state, params, lib, env) -> state`` with static shapes, so
``vmap`` runs thousands of scenes per chip and ``shard_map`` spreads the
scene batch over a mesh.  Design choices:

* **Narrowphase = SDF queries.** Every body carries P surface sample points;
  a contact candidate is (point of body i, collider m).  Colliders are the
  other bodies (their baked SDF grids, scaled) and a set of analytic boxes
  (bin walls, floor, kinematic gripper fingers).  Candidates form a dense
  (N, P, M) tensor — no variable-length lists, no scatter: reaction forces
  on body j are a transpose-sum.

* **Velocity-level Jacobi impulse solver** (a parallel PGS approximation,
  Brax-style) with Baumgarte stabilization: stiff, stack-stable contacts and
  true static friction via the velocity-level Coulomb cone clamp — the
  properties grasp hold/shake tests (``env_grasp.py:87-119``) depend on.

* **Semi-implicit Euler** at PyBullet's default dt=1/240 s.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from ..core import transforms as tf
from .types import SceneParams, SceneState, ShapeLib

DT = 1.0 / 240.0
BAUMGARTE = 0.2
SLOP = 2e-4
N_ITER = 4
# Friction passivity guard: a Jacobi solver applying every contact's full
# tangential velocity-cancellation impulse simultaneously can diverge
# through angular cross-coupling (measured on a rim-pinched nut: the spin
# grew x1.4-1.9 PER ITERATION regardless of dt, reaching 6000 rad/s).
# Physical friction is passive — it can redistribute kinetic energy
# between the linear and angular channels (rolling) but never increase the
# total.  Each iteration therefore scales every body's summed friction
# delta by the largest alpha in [0,1] for which its kinetic energy does
# not increase (closed form: the energy change is a quadratic in alpha).
# When the iteration is stable the full delta already dissipates and
# alpha == 1, so converged behavior is untouched.
FRICTION_RELAX = 0.5
# bodies at/above this mass are "static fixtures": they collide (with an
# effectively infinite inertia) but receive no gravity, the convention used
# for placement fixtures (the reference loads *_place.obj with baseMass=0)
STATIC_MASS = 1e8


@struct.dataclass
class StaticEnv:
    """Analytic box colliders (bin, floor, gripper fingers).  Kinematic:
    infinite mass, optional linear velocity (for moving fingers)."""

    center: jnp.ndarray  # (M, 3)
    half: jnp.ndarray  # (M, 3)
    quat: jnp.ndarray  # (M, 4)
    vel: jnp.ndarray  # (M, 3)
    friction: jnp.ndarray  # (M,)
    enabled: jnp.ndarray  # (M,) bool
    # per-step normal-impulse budget (N·s) each collider may deliver across
    # all its contacts — the force limit of the reference's POSITION_CONTROL
    # finger motors (``env_grasp.py:56-62``: maxForce 100 N -> budget
    # 100·dt).  inf = unbounded (bin walls, floor).
    imp_budget: jnp.ndarray  # (M,)
    # gripping collider: its static-friction cap is backed by the motor
    # force (mu * imp_budget split over its contacts) instead of the
    # per-iteration normal impulse.  A frozen kinematic finger at rest
    # delivers only the Baumgarte bias as jn (~ mu*m*0.2*pen/dt of friction
    # — ~1.3x gravity for a steel cube, which slid out of a geometrically
    # perfect pinch), while the reference's POSITION_CONTROL pinch presses
    # at up to 100 N whether or not it is moving (env_grasp.py:56-62,127).
    # Consumers raise this only while a closed gripper is HOLDING
    # (both fingers latched, close phase over) — never for bin walls, the
    # arm, or fingers still travelling.
    grip: jnp.ndarray  # (M,) bool

    @staticmethod
    def boxes(centers, halves, quats=None, friction=0.7, imp_budget=None):
        import numpy as np

        centers = jnp.asarray(centers, jnp.float32)
        m = centers.shape[0]
        halves = jnp.asarray(halves, jnp.float32)
        if quats is None:
            quats = jnp.zeros((m, 4)).at[:, 0].set(1.0)
        if imp_budget is None:
            imp_budget = jnp.full((m,), jnp.inf)
        return StaticEnv(
            center=centers,
            half=halves,
            quat=jnp.asarray(quats, jnp.float32),
            vel=jnp.zeros((m, 3)),
            friction=jnp.full((m,), friction),
            enabled=jnp.ones((m,), bool),
            imp_budget=jnp.asarray(imp_budget, jnp.float32),
            grip=jnp.zeros((m,), bool),
        )

    @staticmethod
    def open_bin(inner=(0.3, 0.3, 0.12), wall=0.01, friction=0.7):
        """Floor + 4 walls forming an open-top bin, interior floor at z=0
        centered at origin (matches geom.primitives.open_bin)."""
        ix, iy, iz = inner
        centers = [
            (0, 0, -wall / 2),
            (ix / 2 + wall / 2, 0, iz / 2),
            (-ix / 2 - wall / 2, 0, iz / 2),
            (0, iy / 2 + wall / 2, iz / 2),
            (0, -iy / 2 - wall / 2, iz / 2),
        ]
        halves = [
            (ix / 2 + wall, iy / 2 + wall, wall / 2),
            (wall / 2, iy / 2 + wall, iz / 2),
            (wall / 2, iy / 2 + wall, iz / 2),
            (ix / 2, wall / 2, iz / 2),
            (ix / 2, wall / 2, iz / 2),
        ]
        return StaticEnv.boxes(centers, halves, friction=friction)


def box_sdf_and_normal(p_local: jnp.ndarray, half: jnp.ndarray):
    """Analytic box SDF + outward normal for local points (..., 3)."""
    q = jnp.abs(p_local) - half
    outside_vec = jnp.maximum(q, 0.0)
    d_out = jnp.linalg.norm(outside_vec, axis=-1)
    d_in = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    d = d_out + d_in
    # normal: outside -> direction from closest point; inside -> axis of max
    # q via a one-hot contraction (take_along_axis would compile to a gather
    # and serialize the vmapped narrowphase)
    n_out = outside_vec * jnp.sign(p_local)
    qmax = jnp.max(q, axis=-1, keepdims=True)
    oh = (q >= qmax).astype(p_local.dtype)
    oh = oh / jnp.sum(oh, axis=-1, keepdims=True)
    n_in = oh * jnp.sign(p_local)
    n = jnp.where((d_out > 0)[..., None], n_out, n_in)
    return d, n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)


def _body_surface_points(state: SceneState, params: SceneParams, lib: ShapeLib):
    """World-frame surface sample points of every body: (N, P, 3)."""
    pts_local = lib.surf_pts[params.shape_id] * params.scale[:, None, None]
    R = tf.quat_to_matrix(state.quat)  # (N,3,3)
    return jnp.einsum("nij,npj->npi", R, pts_local) + state.pos[:, None, :]


def _sdf_vs_bodies(w_pts, state, params, lib):
    """φ and world normal of every point vs every body: (N,P,NB), (N,P,NB,3).

    Analytic CSG evaluation (geom.csg) — pure VPU arithmetic, no gathers:
    the design decision that makes the solver scale on TPU (grid-SDF gathers
    serialize into dynamic-slice loops in XLA)."""
    from ..geom import csg as csglib

    R = tf.quat_to_matrix(state.quat)
    # local coords of all points in all body frames: (N,P,NB,3)
    rel = w_pts[:, :, None, :] - state.pos[None, None, :, :]
    loc = jnp.einsum("bji,npbj->npbi", R, rel) / params.scale[None, None, :, None]

    def q_one(shape_id, scale, pts):
        # pts (N,P,3) in this body's local unit frame
        shape = csglib.select_shape(lib.csg, shape_id)
        phi, n = csglib.csg_sdf_and_normal(shape, pts)
        return phi * scale, n

    phi, n_loc = jax.vmap(q_one, in_axes=(0, 0, 2), out_axes=(2, 2))(params.shape_id, params.scale, loc)
    n_world = jnp.einsum("bij,npbj->npbi", R, n_loc)
    return phi, n_world


def _sdf_vs_bodies_grid(w_pts, state, params, lib):
    """Grid-narrowphase variant of :func:`_sdf_vs_bodies`: trilinear lookup
    + analytic gradient in each body's baked SDF grid (``lib.sdf_values``,
    built with ``build_shape_lib(bake_grids=True)``).

    This is the arbitrary-mesh path (any watertight .obj simulates without a
    CSG tree — the reference's FCL/VHACD/SDF route,
    ``my_cpp/collision_manager.cpp:15-52``, ``meshpy/meshpy/sdf.py:345-361``).
    Slower than CSG on TPU (the 8-corner fetch is a gather), so CSG stays
    the default for procedural shapes."""
    from ..geom import sdf as sdflib

    R = tf.quat_to_matrix(state.quat)
    rel = w_pts[:, :, None, :] - state.pos[None, None, :, :]
    loc = jnp.einsum("bji,npbj->npbi", R, rel) / params.scale[None, None, :, None]

    def q_one(shape_id, scale, pts):
        phi, n = sdflib.query_and_grad(
            lib.sdf_values[shape_id], lib.sdf_lower[shape_id],
            lib.sdf_spacing[shape_id], pts)
        return phi * scale, n

    phi, n_loc = jax.vmap(q_one, in_axes=(0, 0, 2), out_axes=(2, 2))(
        params.shape_id, params.scale, loc)
    n_world = jnp.einsum("bij,npbj->npbi", R, n_loc)
    return phi, n_world


def _sdf_vs_env(w_pts, env: StaticEnv):
    """φ and world normal of every point vs every env box: (N,P,M), (N,P,M,3)."""
    Rm = tf.quat_to_matrix(env.quat)  # (M,3,3)
    rel = w_pts[:, :, None, :] - env.center[None, None, :, :]
    loc = jnp.einsum("mji,npmj->npmi", Rm, rel)
    d, n_loc = box_sdf_and_normal(loc, env.half[None, None])
    n_world = jnp.einsum("mij,npmj->npmi", Rm, n_loc)
    d = jnp.where(env.enabled[None, None], d, 1e9)
    return d, n_world


def _solve_contacts(state: SceneState, params: SceneParams, lib: ShapeLib,
                    env: StaticEnv, dt: float, n_iter: int,
                    narrowphase: str = "csg"):
    """Jacobi impulse iteration; returns new (linvel, angvel)."""
    N = state.pos.shape[0]
    w_pts = _body_surface_points(state, params, lib)  # (N,P,3)
    P = w_pts.shape[1]

    body_sdf = _sdf_vs_bodies_grid if narrowphase == "grid" else _sdf_vs_bodies
    phi_b, n_b = body_sdf(w_pts, state, params, lib)  # (N,P,N[,3])
    phi_e, n_e = _sdf_vs_env(w_pts, env)  # (N,P,M[,3])

    # mask invalid pairs
    active = state.active
    eye = jnp.eye(N, dtype=bool)
    pair_ok = active[:, None] & active[None, :] & ~eye  # (N,N)
    phi_b = jnp.where(pair_ok[:, None, :], phi_b, 1e9)
    phi_e = jnp.where(active[:, None, None], phi_e, 1e9)

    phi = jnp.concatenate([phi_b, phi_e], axis=2)  # (N,P,M_tot)
    nrm = jnp.concatenate([n_b, n_e], axis=2)  # (N,P,M_tot,3)
    M_tot = phi.shape[2]

    pen = jnp.maximum(-phi, 0.0)
    in_contact = pen > 0.0  # (N,P,M)

    dyn = active & (params.mass < STATIC_MASS)  # static: collide, never move
    inv_mass = jnp.where(dyn, 1.0 / params.mass, 0.0)
    inv_inertia = jnp.where(dyn[:, None], 1.0 / params.inertia, 0.0)  # (N,3) body-diag
    R = tf.quat_to_matrix(state.quat)
    # world-frame inverse inertia (diagonal in body frame)
    inv_I_world = jnp.einsum("nij,nj,nkj->nik", R, inv_inertia, R)  # (N,3,3)
    # forward inertia for the friction passivity guard's energy form
    I_world = jnp.einsum("nij,nj,nkj->nik", R, params.inertia, R)  # (N,3,3)

    r_i = w_pts[:, :, None, :] - state.pos[:, None, None, :]  # (N,P,1->M,3) lever on i
    r_i = jnp.broadcast_to(r_i, (N, P, M_tot, 3))
    # lever on colliding body j (only for body colliders)
    r_j_b = w_pts[:, :, None, :] - state.pos[None, None, :, :]  # (N,P,NB,3)

    # effective mass along normal: K = 1/mi + 1/mj + n·[(Ii^-1 (ri×n))×ri] + (j term)
    rixn = jnp.cross(r_i, nrm)
    term_i = jnp.einsum("npmk,nkl,npml->npm", rixn, inv_I_world, rixn)
    inv_mass_j = jnp.concatenate([inv_mass, jnp.zeros(M_tot - N)])  # env = infinite mass
    rjxn = jnp.cross(r_j_b, n_b)
    term_j_b = jnp.einsum("npbk,bkl,npbl->npb", rjxn, inv_I_world, rjxn)
    term_j = jnp.concatenate([term_j_b, jnp.zeros((N, P, M_tot - N))], axis=2)
    K_n = inv_mass[:, None, None] + inv_mass_j[None, None, :] + term_i + term_j
    K_n = jnp.maximum(K_n, 1e-9)

    mu_j = jnp.concatenate([params.friction, env.friction])
    # PyBullet combines lateral friction by MULTIPLICATION (btManifoldResult
    # calculateCombinedFriction) — calibration to the reference's
    # changeDynamics values assumes the same rule
    mu = params.friction[:, None, None] * mu_j[None, None, :]

    # desired normal-velocity bias (Baumgarte)
    bias = BAUMGARTE / dt * jnp.maximum(pen - SLOP, 0.0)

    # per-body contact counts for Jacobi averaging
    cnt_i = jnp.sum(in_contact, axis=(1, 2))  # (N,)
    cnt_j = jnp.sum(in_contact[:, :, :N], axis=(0, 1))  # (N,)
    denom = jnp.maximum(cnt_i + cnt_j, 1.0)  # scale of simultaneous impulses per body

    # grip colliders: static-friction cap backed by the motor force budget,
    # split evenly over the collider's contacts (see StaticEnv.grip)
    cnt_m = jnp.sum(in_contact, axis=(0, 1))  # (M_tot,) contacts per collider
    grip_j = jnp.concatenate([jnp.zeros(N, bool), env.grip])
    budget_j = jnp.concatenate([jnp.full(N, jnp.inf), env.imp_budget])
    jt_grip_cap = jnp.where(
        grip_j, (budget_j / n_iter) / jnp.maximum(cnt_m, 1.0), 0.0)

    env_vel = jnp.concatenate([jnp.zeros((N, 3)), env.vel])  # (M_tot,3) vel of collider
    # collider angular velocity (bodies only)
    ang_j = jnp.concatenate([state.angvel, jnp.zeros((M_tot - N, 3))])

    def iteration(carry, _):
        linvel, angvel, plin, pang = carry
        v_pt_i = linvel[:, None, None, :] + jnp.cross(angvel[:, None, None, :], r_i)
        v_pt_j_b = linvel[None, None, :, :] + jnp.cross(angvel[None, None, :, :], r_j_b)
        v_pt_j = jnp.concatenate([v_pt_j_b, jnp.broadcast_to(env_vel[None, None, N:], (N, P, M_tot - N, 3))], axis=2)
        v_rel = v_pt_i - v_pt_j
        v_n = jnp.einsum("npmk,npmk->npm", v_rel, nrm)

        # SPLIT IMPULSE (PyBullet's default, btContactSolverInfo
        # m_splitImpulse): the velocity channel resolves only the real
        # relative approach; penetration recovery lives in a separate
        # pseudo-velocity channel that moves POSITIONS this step and is
        # then discarded.  Folding the Baumgarte bias into the persistent
        # velocity (rounds 1-4) injects momentum every step — and since
        # bias ~ pen/dt, halving dt doubled the per-iteration gain and a
        # pinched nut's angular channel pumped itself from 4.5 rad/s to
        # explosion within 3 steps at dt=1/480 (the self-parity dt sweep's
        # KS 0.58 failure).  Positionally the pseudo channel corrects
        # BAUMGARTE*(pen-slop) per step at ANY dt.
        jn = (-v_n) / K_n
        jn = jnp.where(in_contact, jnp.maximum(jn, 0.0), 0.0)

        # impulse-budget clamp for kinematic colliders (finger motors): each
        # env collider may deliver at most imp_budget/n_iter of normal
        # impulse per iteration across all its contacts.  The budget bounds
        # the impulse actually APPLIED — i.e. after the Jacobi 1/denom
        # averaging (r4 compared the budget against the raw per-contact sum,
        # which made the effective force limit ~budget/denom: a 100 N motor
        # gripped like a ~6 N one and shake-phase holds failed).  Bin
        # walls/floor ship budget=inf so this is a no-op for them.
        env_tot = jnp.sum(jn[:, :, N:] / denom[:, None, None],
                          axis=(0, 1))  # (M_env,) delivered impulse
        env_fac = jnp.minimum(1.0, (env.imp_budget / n_iter)
                              / jnp.maximum(env_tot, 1e-12))
        fac = jnp.concatenate([jnp.ones(N), env_fac])
        jn = jn * fac[None, None, :]

        v_t = v_rel - v_n[..., None] * nrm
        vt_norm = jnp.linalg.norm(v_t, axis=-1)
        t_dir = v_t / (vt_norm[..., None] + 1e-9)
        # Exact tangential effective mass, recomputed per iteration (t_dir
        # is velocity-dependent).  The K_t ~= K_n approximation of rounds
        # 1-4 was safe only because the mu*jn cone clamp bounded the
        # mis-sizing (true K_t/K_n tails to ~25x on elongated bodies,
        # tests/test_tangential_mass.py); with motor-backed grip friction
        # (StaticEnv.grip) the clamp is lifted and the overshoot ejected
        # held objects at m/s scale.  The fused Pallas pile kernel
        # (ops/fused_rollout.py) keeps the approximation — it has no grip
        # colliders, so its cone clamp still bounds the error.
        rixt = jnp.cross(r_i, t_dir)
        term_i_t = jnp.einsum("npmk,nkl,npml->npm", rixt, inv_I_world, rixt)
        rjxt = jnp.cross(r_j_b, t_dir[:, :, :N, :])
        term_j_t_b = jnp.einsum("npbk,bkl,npbl->npb", rjxt, inv_I_world, rjxt)
        term_j_t = jnp.concatenate(
            [term_j_t_b, jnp.zeros((N, P, M_tot - N))], axis=2)
        K_t = inv_mass[:, None, None] + inv_mass_j[None, None, :] \
            + term_i_t + term_j_t
        K_t = jnp.maximum(K_t, 1e-9)
        jt_mag = FRICTION_RELAX * vt_norm / K_t
        jt_cap = mu * jnp.maximum(jn, jt_grip_cap[None, None, :])
        jt_mag = jnp.minimum(jt_mag, jt_cap)
        jt = -jt_mag[..., None] * t_dir

        imp_n = jn[..., None] * nrm  # (N,P,M,3) normal impulse ON body i

        # pseudo channel: normal-only, driven by the Baumgarte bias against
        # the current pseudo velocities (env colliders carry none)
        p_pt_i = plin[:, None, None, :] + jnp.cross(pang[:, None, None, :], r_i)
        p_pt_j_b = plin[None, None, :, :] + jnp.cross(pang[None, None, :, :], r_j_b)
        p_pt_j = jnp.concatenate(
            [p_pt_j_b, jnp.zeros((N, P, M_tot - N, 3))], axis=2)
        p_n = jnp.einsum("npmk,npmk->npm", p_pt_i - p_pt_j, nrm)
        jp = (-p_n + bias) / K_n
        jp = jnp.where(in_contact, jnp.maximum(jp, 0.0), 0.0)
        imp_p = jp[..., None] * nrm

        # Jacobi averaging: each body's simultaneous impulses are scaled by
        # its own contact count so the parallel update cannot overshoot.
        scale = 1.0 / denom  # (N,)

        def deltas(impulse):
            dlin_i = jnp.einsum("npmk->nk", impulse) * inv_mass[:, None] * scale[:, None]
            dang_i = jnp.einsum("nij,npmj->ni", inv_I_world,
                                jnp.cross(r_i, impulse)) * scale[:, None]
            imp_on_j = -impulse[:, :, :N, :]  # reaction on body colliders
            dlin_j = jnp.einsum("npbk->bk", imp_on_j) * inv_mass[:, None] * scale[:, None]
            dang_j = jnp.einsum("bij,npbj->bi", inv_I_world,
                                jnp.cross(r_j_b, imp_on_j)) * scale[:, None]
            return dlin_i + dlin_j, dang_i + dang_j

        dlin_n, dang_n = deltas(imp_n)
        linvel = linvel + dlin_n
        angvel = angvel + dang_n

        # friction passivity guard (see FRICTION_RELAX note): per body,
        # scale the friction delta by the largest alpha in [0,1] that does
        # not increase its kinetic energy.  dKE(alpha) = alpha*B + alpha^2*C
        # with C >= 0; roots 0 and -B/C.
        dlin_f, dang_f = deltas(jt)
        Iw_dang = jnp.einsum("nij,nj->ni", I_world, dang_f)
        B = params.mass * jnp.sum(linvel * dlin_f, axis=-1) \
            + jnp.sum(jnp.einsum("nij,nj->ni", I_world, angvel) * dang_f, axis=-1)
        C = 0.5 * (params.mass * jnp.sum(dlin_f * dlin_f, axis=-1)
                   + jnp.sum(dang_f * Iw_dang, axis=-1))
        alpha = jnp.where(B + C <= 0.0, 1.0,
                          jnp.clip(-B / jnp.maximum(C, 1e-20), 0.0, 1.0))
        linvel = linvel + alpha[:, None] * dlin_f
        angvel = angvel + alpha[:, None] * dang_f

        dplin, dpang = deltas(imp_p)
        plin = plin + dplin
        pang = pang + dpang
        return (linvel, angvel, plin, pang), None

    zero = jnp.zeros_like(state.linvel)
    (linvel, angvel, plin, pang), _ = jax.lax.scan(
        iteration, (state.linvel, state.angvel, zero, zero), None,
        length=n_iter)
    return linvel, angvel, plin, pang


@partial(jax.jit, static_argnames=("n_iter", "narrowphase"))
def step(state: SceneState, params: SceneParams, lib: ShapeLib, env: StaticEnv,
         dt: float = DT, gravity: float = -9.8, n_iter: int = N_ITER,
         linear_damping: float = 0.0095, angular_damping: float = 0.0095,
         narrowphase: str = "csg") -> SceneState:
    """One physics step — replaces ``p.stepSimulation()``.

    Damping default calibration: the reference sets PyBullet
    linearDamping=angularDamping=0.9 on every pile object
    (``env.py:267,295``), which PyBullet applies per second as
    v *= (1-0.9)^dt -> 0.95% velocity loss per 240 Hz step; 0.0095/step
    here reproduces it (round 1's 0.02/0.05 over-damped by 2-5x).  The
    damping argument is interpreted PER 1/240 s step and rescaled to the
    actual dt — a fixed per-step loss would double the per-second damping
    at dt=1/480 (caught by the self-parity harness's dt sweep).
    """
    g = jnp.array([0.0, 0.0, gravity])
    dynamic = state.active & (params.mass < STATIC_MASS)
    linvel = state.linvel + jnp.where(dynamic[:, None], g * dt, 0.0)
    st = state.replace(linvel=linvel)

    linvel, angvel, plin, pang = _solve_contacts(
        st, params, lib, env, dt, n_iter, narrowphase)
    lin_keep = (1.0 - linear_damping) ** (dt / DT)
    ang_keep = (1.0 - angular_damping) ** (dt / DT)
    linvel = linvel * lin_keep
    angvel = angvel * ang_keep
    # static bodies collide but NEVER move (PyBullet baseMass=0 semantics —
    # the huge mass does not protect against kinematic env colliders, whose
    # contacts have K_n ~ 1/m_static and push at full Baumgarte bias speed)
    linvel = jnp.where(dynamic[:, None], linvel, 0.0)
    angvel = jnp.where(dynamic[:, None], angvel, 0.0)
    plin = jnp.where(dynamic[:, None], plin, 0.0)
    pang = jnp.where(dynamic[:, None], pang, 0.0)

    # positions integrate real + pseudo velocities; only the real ones
    # persist into the next step (split impulse — no Baumgarte momentum)
    pos = state.pos + jnp.where(dynamic[:, None], (linvel + plin) * dt, 0.0)
    ang_int = angvel + pang
    dq = tf.quat_mul(jnp.concatenate([jnp.zeros_like(ang_int[..., :1]), ang_int], axis=-1), state.quat)
    quat = tf.quat_normalize(state.quat + 0.5 * dt * dq)
    quat = jnp.where(dynamic[:, None], quat, state.quat)
    return state.replace(pos=pos, quat=quat, linvel=linvel, angvel=angvel)


@partial(jax.jit, static_argnames=("n_steps", "n_iter", "narrowphase"))
def rollout(state: SceneState, params: SceneParams, lib: ShapeLib, env: StaticEnv,
            n_steps: int, dt: float = DT, gravity: float = -9.8, n_iter: int = N_ITER,
            narrowphase: str = "csg") -> SceneState:
    """Step n_steps with lax.scan (one compiled loop, no host round trips)."""

    def body(s, _):
        return step(s, params, lib, env, dt, gravity, n_iter,
                    narrowphase=narrowphase), None

    out, _ = jax.lax.scan(body, state, None, length=n_steps)
    return out


def max_body_motion(prev: SceneState, cur: SceneState) -> jnp.ndarray:
    """Max positional movement across active bodies — the stability signal
    used by ``simulation_until_stable`` (``env.py:299-344``)."""
    d = jnp.linalg.norm(cur.pos - prev.pos, axis=-1)
    return jnp.max(jnp.where(cur.active, d, 0.0))
