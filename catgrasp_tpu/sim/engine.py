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

    env_vel = jnp.concatenate([jnp.zeros((N, 3)), env.vel])  # (M_tot,3) vel of collider
    # collider angular velocity (bodies only)
    ang_j = jnp.concatenate([state.angvel, jnp.zeros((M_tot - N, 3))])

    def iteration(carry, _):
        linvel, angvel = carry
        v_pt_i = linvel[:, None, None, :] + jnp.cross(angvel[:, None, None, :], r_i)
        v_pt_j_b = linvel[None, None, :, :] + jnp.cross(angvel[None, None, :, :], r_j_b)
        v_pt_j = jnp.concatenate([v_pt_j_b, jnp.broadcast_to(env_vel[None, None, N:], (N, P, M_tot - N, 3))], axis=2)
        v_rel = v_pt_i - v_pt_j
        v_n = jnp.einsum("npmk,npmk->npm", v_rel, nrm)

        jn = (-v_n + bias) / K_n
        jn = jnp.where(in_contact, jnp.maximum(jn, 0.0), 0.0)

        # impulse-budget clamp for kinematic colliders (finger motors): each
        # env collider may deliver at most imp_budget/n_iter of normal
        # impulse per iteration across all its contacts (conservative: the
        # Jacobi 1/denom averaging only shrinks what is delivered).  Bin
        # walls/floor ship budget=inf so this is a no-op for them.
        env_tot = jnp.sum(jn[:, :, N:], axis=(0, 1))  # (M_env,)
        env_fac = jnp.minimum(1.0, (env.imp_budget / n_iter)
                              / jnp.maximum(env_tot, 1e-12))
        fac = jnp.concatenate([jnp.ones(N), env_fac])
        jn = jn * fac[None, None, :]

        v_t = v_rel - v_n[..., None] * nrm
        vt_norm = jnp.linalg.norm(v_t, axis=-1)
        t_dir = v_t / (vt_norm[..., None] + 1e-9)
        # Tangential effective mass approximated by the normal-direction K.
        # Measured on the real instance inertias (tests/test_tangential_mass.py)
        # the true K_t/K_n is median ~1.0 but tails to ~25x on elongated
        # bodies (screw): the resulting friction-impulse mis-sizing is (a)
        # hard-clamped by the mu*jn cone below, and (b) damped by the Jacobi
        # contact-count averaging, so it shifts stick/slip CONVERGENCE RATE,
        # not contact equilibria.  Exact K_t would need per-iteration
        # cross+quadratic-form recompute (t_dir is velocity-dependent) in
        # both this solver and the fused Pallas kernel (ops/fused_rollout.py)
        # which mirrors it.
        jt_mag = vt_norm / K_n
        jt_mag = jnp.minimum(jt_mag, mu * jn)
        jt = -jt_mag[..., None] * t_dir

        imp = jn[..., None] * nrm + jt  # (N,P,M,3) impulse ON body i

        # Jacobi averaging: each body's simultaneous impulses are scaled by
        # its own contact count so the parallel update cannot overshoot.
        scale = 1.0 / denom  # (N,)
        dlin_i = jnp.einsum("npmk->nk", imp) * inv_mass[:, None] * scale[:, None]
        dang_i = jnp.einsum("nij,npmj->ni", inv_I_world, jnp.cross(r_i, imp)) * scale[:, None]

        imp_on_j = -imp[:, :, :N, :]  # reaction on body colliders
        dlin_j = jnp.einsum("npbk->bk", imp_on_j) * inv_mass[:, None] * scale[:, None]
        dang_j = jnp.einsum("bij,npbj->bi", inv_I_world, jnp.cross(r_j_b, imp_on_j)) * scale[:, None]

        linvel = linvel + dlin_i + dlin_j
        angvel = angvel + dang_i + dang_j
        return (linvel, angvel), None

    (linvel, angvel), _ = jax.lax.scan(iteration, (state.linvel, state.angvel), None, length=n_iter)
    return linvel, angvel


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
    here reproduces it (round 1's 0.02/0.05 over-damped by 2-5x).
    """
    g = jnp.array([0.0, 0.0, gravity])
    dynamic = state.active & (params.mass < STATIC_MASS)
    linvel = state.linvel + jnp.where(dynamic[:, None], g * dt, 0.0)
    st = state.replace(linvel=linvel)

    linvel, angvel = _solve_contacts(st, params, lib, env, dt, n_iter, narrowphase)
    linvel = linvel * (1.0 - linear_damping)
    angvel = angvel * (1.0 - angular_damping)
    # static bodies collide but NEVER move (PyBullet baseMass=0 semantics —
    # the huge mass does not protect against kinematic env colliders, whose
    # contacts have K_n ~ 1/m_static and push at full Baumgarte bias speed)
    linvel = jnp.where(dynamic[:, None], linvel, 0.0)
    angvel = jnp.where(dynamic[:, None], angvel, 0.0)

    pos = state.pos + jnp.where(dynamic[:, None], linvel * dt, 0.0)
    dq = tf.quat_mul(jnp.concatenate([jnp.zeros_like(angvel[..., :1]), angvel], axis=-1), state.quat)
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
