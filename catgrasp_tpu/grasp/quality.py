"""Analytic grasp quality — friction cones and wrench-space metrics.

TPU re-design of the dexnet legacy quality stack the reference vendors
(``dexnet/grasping/contacts.py:224-311``: friction-cone construction at SDF
contacts; dexnet's epsilon/Ferrari-Canny quality on the cone-edge wrench
hull).  The reference pipeline ultimately scores grasps by perturbation
physics instead (``env_grasp.py:111``), but the analytic metrics remain part
of its surface (`Contact3D`, `quality.py` in upstream dexnet) and are cheap
prefilters — so we provide them batched: everything below vmaps over
thousands of grasps and runs as two matmuls + reductions on the MXU, no
convex-hull libraries.

Metrics:
  * ``antipodal_score`` — cos of the worst contact-normal-vs-closing-line
    angle (force-closure iff both angles inside the friction cone).
  * ``force_closure``   — boolean Nguyen antipodality test.
  * ``epsilon_quality`` — lower bound of the Ferrari-Canny L1 metric: the
    radius of the largest origin-centred ball inside the convex hull of the
    contact cone-edge wrenches, computed as min over sampled 6-D directions
    of the hull support function (exact as n_dirs -> inf; a few hundred
    directions separate good/bad grasps cleanly).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def friction_cone_edges(normals: jnp.ndarray, mu: float, n_edges: int = 8) -> jnp.ndarray:
    """Discretize the friction cone at each contact into force edges.

    normals (C, 3) inward contact normals -> (C, n_edges, 3) unit forces on
    the cone boundary (``contacts.py:224-281`` equivalent, batched).
    """
    n = normals / (jnp.linalg.norm(normals, axis=-1, keepdims=True) + 1e-12)
    # tangent basis per contact
    a = jnp.where(jnp.abs(n[..., :1]) < 0.9,
                  jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), n.shape),
                  jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), n.shape))
    t1 = jnp.cross(n, a)
    t1 = t1 / (jnp.linalg.norm(t1, axis=-1, keepdims=True) + 1e-12)
    t2 = jnp.cross(n, t1)
    ang = jnp.arange(n_edges) * (2 * np.pi / n_edges)
    tang = (jnp.cos(ang)[None, :, None] * t1[:, None, :]
            + jnp.sin(ang)[None, :, None] * t2[:, None, :])  # (C,E,3)
    e = n[:, None, :] + mu * tang
    return e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-12)


def contact_wrenches(points: jnp.ndarray, normals: jnp.ndarray, mu: float,
                     n_edges: int = 8, torque_scale: float | None = None,
                     soft_fingers: bool = True) -> jnp.ndarray:
    """Cone-edge wrenches of a contact set: (C*n_edges [+2C], 6).

    points (C,3) about the object centroid; normals inward.  Torques are
    scaled by 1/max||p|| (dexnet convention) so forces and torques are
    comparable.  ``soft_fingers`` adds +-normal torsional wrenches.
    """
    forces = friction_cone_edges(normals, mu, n_edges)  # (C,E,3)
    if torque_scale is None:
        torque_scale = 1.0 / (jnp.max(jnp.linalg.norm(points, axis=-1)) + 1e-9)
    torques = jnp.cross(points[:, None, :], forces) * torque_scale  # (C,E,3)
    w = jnp.concatenate([forces, torques], axis=-1).reshape(-1, 6)
    if soft_fingers:
        n = normals / (jnp.linalg.norm(normals, axis=-1, keepdims=True) + 1e-12)
        tor = mu * torque_scale * n
        zeros = jnp.zeros_like(n)
        w_soft = jnp.concatenate([
            jnp.concatenate([zeros, tor], axis=-1),
            jnp.concatenate([zeros, -tor], axis=-1),
        ], axis=0)
        w = jnp.concatenate([w, w_soft], axis=0)
    return w


def _fibonacci_sphere_6d(n: int, key) -> jnp.ndarray:
    """n approximately-uniform unit directions in R^6 (gaussian normalize)."""
    u = jax.random.normal(key, (n, 6))
    return u / (jnp.linalg.norm(u, axis=-1, keepdims=True) + 1e-12)


@partial(jax.jit, static_argnames=("n_edges", "n_dirs", "soft_fingers"))
def epsilon_quality(points: jnp.ndarray, normals: jnp.ndarray, mask: jnp.ndarray,
                    mu: float = 0.5, n_edges: int = 8, n_dirs: int = 512,
                    soft_fingers: bool = True, key=None) -> jnp.ndarray:
    """Ferrari-Canny L1 lower bound for one contact set.

    points/normals (C,3) with validity mask (C,).  Returns a scalar >= 0;
    0 means no force closure.  The support function of conv(wrenches) is
    evaluated on ``n_dirs`` sampled directions: Q = max(0, min_u max_j w_j.u)
    — one (n_dirs,6)x(6,W) matmul.  vmap over grasps for batches.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    w = contact_wrenches(points, normals, mu, n_edges, soft_fingers=soft_fingers)
    C = points.shape[0]
    E = n_edges + (2 if soft_fingers else 0)
    wmask = jnp.repeat(mask, n_edges)
    if soft_fingers:
        wmask = jnp.concatenate([wmask, mask, mask])
    dirs = _fibonacci_sphere_6d(n_dirs, key)  # (U,6)
    s = dirs @ w.T  # (U, W) — MXU
    s = jnp.where(wmask[None, :], s, -jnp.inf)
    support = jnp.max(s, axis=-1)  # (U,)
    q = jnp.min(support)
    q = jnp.where(jnp.sum(mask) >= 2, q, -1.0)
    return jnp.maximum(q, 0.0)


@partial(jax.jit, static_argnames=("n_edges", "n_dirs", "soft_fingers"))
def epsilon_quality_batch(points: jnp.ndarray, normals: jnp.ndarray,
                          mask: jnp.ndarray, mu: float = 0.5, n_edges: int = 8,
                          n_dirs: int = 512, soft_fingers: bool = True,
                          key=None) -> jnp.ndarray:
    """(G,C,3)/(G,C) batched Ferrari-Canny lower bound -> (G,)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    fn = lambda p, n, m: epsilon_quality(p, n, m, mu, n_edges, n_dirs,
                                         soft_fingers, key)
    return jax.vmap(fn)(points, normals, mask)


def antipodal_score(p1: jnp.ndarray, n1: jnp.ndarray,
                    p2: jnp.ndarray, n2: jnp.ndarray) -> jnp.ndarray:
    """cos of the worse normal-vs-closing-line angle for a contact pair.

    1.0 = perfectly antipodal; force closure iff score >= cos(atan(mu))
    (Nguyen's condition; dexnet ``ParallelJawPtGrasp3D`` axis test).
    Broadcasts over leading batch dims.
    """
    axis = p2 - p1
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-12)
    c1 = jnp.sum(n1 * axis, axis=-1)    # inward n1 points along +axis
    c2 = jnp.sum(-n2 * axis, axis=-1)   # inward n2 points along -axis
    return jnp.minimum(c1, c2)


def force_closure(p1, n1, p2, n2, mu: float = 0.5) -> jnp.ndarray:
    """Boolean antipodality force-closure test (two-contact, Nguyen)."""
    return antipodal_score(p1, n1, p2, n2) >= jnp.cos(jnp.arctan(mu))


@partial(jax.jit, static_argnames=("spec", "n_pts"))
def parallel_jaw_quality(cloud: jnp.ndarray, normals: jnp.ndarray,
                         grasps: jnp.ndarray, spec, n_pts: int = 512,
                         mu: float = 0.5, surface_tol: float = 0.004) -> jnp.ndarray:
    """Analytic grasp-quality proxy for a batch of parallel-jaw grasps.

    For each grasp: transform the object cloud into the grasp frame,
    estimate the closing width from the y-extent of points inside the
    closing region, take the points each finger would touch as contacts
    (inward normals = -/+ closing axis), and score with the Ferrari-Canny
    lower bound about the contact centroid.  Zero when a finger touches
    nothing.  This is the ranking the reference gets from its trained
    PointNet quality net (p_G); analytically it is dexnet's wrench metric
    on the same contact model.
    """
    cloud = cloud[:n_pts]
    normals = normals[:n_pts]

    def one(T):
        R = T[:3, :3]
        t = T[:3, 3]
        pg = (cloud - t) @ R  # grasp frame
        inside_x = (pg[:, 0] > 0.0) & (pg[:, 0] < spec.finger_len)
        inside_z = jnp.abs(pg[:, 2]) < spec.finger_depth / 2
        between = inside_x & inside_z & (jnp.abs(pg[:, 1]) < spec.max_width / 2)
        y = jnp.where(between, pg[:, 1], 0.0)
        w_hi = jnp.max(jnp.where(between, y, -1e9))
        w_lo = jnp.min(jnp.where(between, y, 1e9))
        m_pos = between & (pg[:, 1] > w_hi - surface_tol)
        m_neg = between & (pg[:, 1] < w_lo + surface_tol)
        c = jnp.sum(jnp.where((m_pos | m_neg)[:, None], pg, 0.0), axis=0) \
            / jnp.maximum(jnp.sum(m_pos | m_neg), 1)
        n_in = jnp.where(m_pos[:, None],
                         jnp.broadcast_to(jnp.array([0.0, -1.0, 0.0]), pg.shape),
                         jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), pg.shape))
        q = epsilon_quality(pg - c, n_in, m_pos | m_neg, mu=mu, n_dirs=256)
        ok = m_pos.any() & m_neg.any() & (jnp.sum(m_pos | m_neg) >= 4)
        # engagement: how deep the contact patch sits toward the palm
        # (palm at x=0, tips at finger_len) — tip-held objects (contacts
        # only near x=finger_len, so fl - min_x ~ 0) shake loose under
        # perturbation; that is the signal the reference's physics-trained
        # quality net encodes.  NOTE: filter.engagement_depth has since
        # hardened to a robust 3rd-smallest-x with a palm-face bound; the
        # single-min here stays valid because the >=4-contact ``ok`` gate
        # already screens out flying-pixel contact sets.
        contacts = m_pos | m_neg
        depth = (spec.finger_len
                 - jnp.min(jnp.where(contacts, pg[:, 0], spec.finger_len))
                 ) / spec.finger_len
        q = q * (0.4 + 0.6 * jnp.clip(depth, 0.0, 1.0))
        return jnp.where(ok, q, 0.0)

    return jax.lax.map(one, grasps, batch_size=64)


@partial(jax.jit, static_argnames=("n_edges",))
def grasp_isotropy(points: jnp.ndarray, normals: jnp.ndarray,
                   mask: jnp.ndarray, mu: float = 0.5,
                   n_edges: int = 8) -> jnp.ndarray:
    """Grasp-matrix isotropy index sigma_min/sigma_max (dexnet
    ``grasp_isotropy`` analog) from the cone-edge wrench matrix."""
    w = contact_wrenches(points, normals, mu, n_edges, soft_fingers=False)
    wmask = jnp.repeat(mask, n_edges)
    G = jnp.where(wmask[:, None], w, 0.0)  # (C*E, 6)
    s = jnp.linalg.svd(G, compute_uv=False)
    return jnp.where(s[0] > 1e-9, s[-1] / s[0], 0.0)
