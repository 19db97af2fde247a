"""Legacy dexnet surface-window / curvature features, TPU-first.

Functional, batched re-design of the reference's ``Contact3D`` window math
(``dexnet/grasping/contacts.py:116-186`` tangents, ``:311-341``
surface_window_sdf, ``:343-460`` projection windows, ``:583-660``
``SurfaceWindow``).  The reference pipeline imports but never calls these —
grasp quality comes from the perturbation sim (P3) — so this module exists
for API completeness and offline analysis.  Differences by design:

* no per-contact Python objects: every function is ``vmap``-able over a
  contact batch and jit-compiles to fixed shapes;
* the reference's 1000-sample in-plane rotation search for the aligned
  tangent axis (``contacts.py:170-181``) is replaced by its closed form —
  the argmax of ``cos(t)x + sin(t)y . e_x`` over t is the normalized
  projection of ``e_x`` onto the tangent plane;
* contact search along the projection direction uses a fixed-count sampled
  first-zero-crossing of the trilinear SDF instead of the reference's
  data-dependent grid walk (``graspable._find_projection``);
* the bilateral window filter (scikit ``denoise_bilateral`` in the
  reference) is a fixed 5x5 Gaussian range x spatial kernel.

Conventions match the reference: projection direction defaults to the
*inward* normal, no-contact cells read ``NO_CONTACT_DIST`` (0.2,
``dexnet/constants.py:23``), out-of-grid cells read -1e-2 in the SDF window
(``contacts.py:338``).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geom import sdf as sdflib

NO_CONTACT_DIST = 0.2  # dexnet/constants.py:23
WIN_DIST_LIM = 0.02  # dexnet/constants.py:24


def tangent_frame(normal: jnp.ndarray, direction: jnp.ndarray | None = None,
                  align_axes: bool = True):
    """Right-handed contact frame (direction, t1, t2); ``contacts.py:116``.

    ``direction`` defaults to the inward normal (-normal) and is flipped
    inward if it points along the outward normal.  With ``align_axes`` the
    first tangent is the in-plane direction closest to the object x axis
    (exact solution of the reference's discrete search); the y-axis
    projection is the fallback when the plane is perpendicular to x.
    """
    n = normal / jnp.maximum(jnp.linalg.norm(normal), 1e-12)
    d = -n if direction is None else direction
    d = jnp.where(jnp.dot(n, d) > 0, -d, d)
    d = d / jnp.maximum(jnp.linalg.norm(d), 1e-12)

    if align_axes:
        ex = jnp.array([1.0, 0.0, 0.0])
        ey = jnp.array([0.0, 1.0, 0.0])
        px = ex - jnp.dot(ex, d) * d
        py = ey - jnp.dot(ey, d) * d
        use_y = jnp.linalg.norm(px) < 1e-6
        t1 = jnp.where(use_y, py, px)
    else:
        # any stable perpendicular: cross with the axis least aligned with d
        a = jnp.argmin(jnp.abs(d))
        t1 = jnp.cross(jnp.eye(3)[a], d)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-12)
    t2 = jnp.cross(d, t1)  # right-handed: cross(t1, t2) == d
    return d, t1, t2


def _window_grid(point, t1, t2, width, num_steps, cell_centered):
    if cell_centered:  # projection windows: contacts.py:380-381
        res = width / num_steps
        s = jnp.linspace(-width / 2 + res / 2, width / 2 - res / 2, num_steps)
    else:  # SDF window: contacts.py:331
        s = jnp.linspace(-width / 2, width / 2, num_steps)
    c1, c2 = jnp.meshgrid(s, s, indexing="ij")
    locs = (point[None, None]
            + c1[..., None] * t1[None, None]
            + c2[..., None] * t2[None, None])
    return c1, c2, locs


def _in_bounds(grid: sdflib.SdfGrid, pts):
    g = (pts - grid.lower) / grid.spacing
    dims = jnp.array(grid.values.shape, jnp.float32)
    return jnp.all((g >= 0) & (g <= dims - 1), axis=-1)


def surface_window_sdf(grid: sdflib.SdfGrid, point: jnp.ndarray,
                       normal: jnp.ndarray, width: float = 1e-2,
                       num_steps: int = 21) -> jnp.ndarray:
    """(S, S) window of SDF values on the tangent plane; ``contacts.py:311``.
    Out-of-grid cells read -1e-2 as in the reference."""
    _, t1, t2 = tangent_frame(normal)
    _, _, locs = _window_grid(point, t1, t2, width, num_steps, False)
    vals = sdflib.query_grid(grid, locs)
    return jnp.where(_in_bounds(grid, locs), vals, -1e-2)


def _first_crossing(phis, ts):
    """t of the first +→- SDF sign change along a sampled ray, linearly
    interpolated; (found, t*)."""
    a, b = phis[:-1], phis[1:]
    crossing = (a >= 0) & (b < 0)
    found = jnp.any(crossing)
    i = jnp.argmax(crossing)  # first True
    frac = a[i] / jnp.maximum(a[i] - b[i], 1e-12)
    t = ts[i] + frac * (ts[i + 1] - ts[i])
    return found, t


def surface_window_projection(grid: sdflib.SdfGrid, point: jnp.ndarray,
                              normal: jnp.ndarray, width: float = 1e-2,
                              num_steps: int = 21,
                              max_projection: float = 0.1,
                              back_up: float = 0.0,
                              num_samples: int = 64,
                              align_pca: bool = True,
                              filter_sigma_range: float = 0.1,
                              filter_sigma_spatial: float = 1.0) -> jnp.ndarray:
    """(S, S) orthographic depth window: signed distance from the tangent
    plane to the surface along the inward normal, per window cell
    (``contacts.py:343-460``).  No-contact cells read ``NO_CONTACT_DIST``.

    ``align_pca`` reproduces ``surface_window_projection``'s second pass: the
    window is recomputed in the basis of the SHOT-weighted covariance's
    principal axis and rotated 180 deg so the right half is the nearer one.
    """
    d, t1, t2 = tangent_frame(normal)

    def project(u1, u2):
        c1, c2, locs = _window_grid(point, u1, u2, width, num_steps, True)
        starts = locs - back_up * d
        ts = jnp.linspace(0.0, max_projection + back_up, num_samples)
        rays = starts[..., None, :] + ts[:, None] * d  # (S,S,K,3)
        phis = sdflib.query_grid(grid, rays)  # (S,S,K)
        found, t = jax.vmap(jax.vmap(_first_crossing))(
            phis, jnp.broadcast_to(ts, phis.shape))
        proj = jnp.clip(t - back_up, -max_projection, max_projection)
        ok = found & _in_bounds(grid, locs)
        window = jnp.where(ok, proj, NO_CONTACT_DIST)
        # SHOT-weighted covariance of the found contact points around the
        # center contact (contacts.py:419-424)
        w = jnp.where(ok, width / jnp.sqrt(2.0)
                      - jnp.sqrt(c1 ** 2 + c2 ** 2), 0.0)
        diff = (locs + t[..., None] * d) - point
        cov = jnp.einsum("ij,ijk,ijl->kl", w, diff, diff)
        cov = cov / jnp.maximum(jnp.sum(w), 1e-12)
        # transpose: reference makes the x scale run along columns
        return window.T, cov

    window, cov = project(t1, t2)
    if align_pca:
        _, vecs = jnp.linalg.eigh(cov)
        pa = vecs[:, -1]  # principal axis (largest eigenvalue)
        pa = jnp.where(jnp.abs(jnp.dot(pa, d)) > 0.999, vecs[:, -2], pa)
        u1 = jnp.dot(pa, t1) * t1 + jnp.dot(pa, t2) * t2
        u1 = u1 / jnp.maximum(jnp.linalg.norm(u1), 1e-12)
        u2 = jnp.cross(d, u1)
        window, _ = project(u1, u2)
        h = num_steps // 2
        flip = jnp.mean(window[:, :h]) > jnp.mean(window[:, h:])
        window = jnp.where(flip, jnp.rot90(window, k=2), window)
    if filter_sigma_range > 0 and filter_sigma_spatial > 0:
        window = bilateral_filter(window, filter_sigma_range,
                                  filter_sigma_spatial)
    return window


def bilateral_filter(img: jnp.ndarray, sigma_range: float,
                     sigma_spatial: float, radius: int = 2) -> jnp.ndarray:
    """Fixed (2r+1)^2 bilateral filter — the reference applies scikit's
    ``denoise_bilateral`` to the positive-shifted window
    (``contacts.py:441-447``); same shift here so range weights match."""
    shift = jnp.min(img)
    x = img - shift
    acc = jnp.zeros_like(x)
    norm = jnp.zeros_like(x)
    for di in range(-radius, radius + 1):
        for dj in range(-radius, radius + 1):
            sh = jnp.roll(jnp.roll(x, di, 0), dj, 1)
            w = jnp.exp(-(di * di + dj * dj)
                        / (2.0 * sigma_spatial ** 2)
                        - (sh - x) ** 2 / (2.0 * sigma_range ** 2))
            acc = acc + w * sh
            norm = norm + w
    return acc / jnp.maximum(norm, 1e-12) + shift


class SurfaceWindow(NamedTuple):
    """Pytree analog of the reference struct (``contacts.py:583-660``)."""
    proj_win: jnp.ndarray  # (S, S)
    grad_x: jnp.ndarray
    grad_y: jnp.ndarray
    hess_x: jnp.ndarray  # (2, S, S): d/dx and d/dy of grad_x
    hess_y: jnp.ndarray
    gauss_curvature: jnp.ndarray

    def asarray(self, proj_win_weight=0.0, grad_x_weight=0.0,
                grad_y_weight=0.0, curvature_weight=0.0) -> jnp.ndarray:
        return jnp.concatenate([
            proj_win_weight * self.proj_win.ravel(),
            grad_x_weight * self.grad_x.ravel(),
            grad_y_weight * self.grad_y.ravel(),
            curvature_weight * self.gauss_curvature.ravel()])


def window_features(window: jnp.ndarray, res: float) -> SurfaceWindow:
    """Gradients, Hessian rows, and Gauss curvature of a depth window
    (Monge patch z = f(x, y): K = (f_xx f_yy - f_xy^2) /
    (1 + f_x^2 + f_y^2)^2)."""
    gx, gy = jnp.gradient(window, res)
    hxx, hxy = jnp.gradient(gx, res)
    hyx, hyy = jnp.gradient(gy, res)
    K = (hxx * hyy - hxy * hyx) / (1.0 + gx ** 2 + gy ** 2) ** 2
    return SurfaceWindow(window, gx, gy, jnp.stack([hxx, hxy]),
                         jnp.stack([hyx, hyy]), K)


def surface_windows_batch(grid: sdflib.SdfGrid, points: jnp.ndarray,
                          normals: jnp.ndarray, width: float = 1e-2,
                          num_steps: int = 21, **kw) -> SurfaceWindow:
    """All contacts of a grasp batch in one program: (C, 3) x2 -> SurfaceWindow
    with a leading C axis."""
    def one(p, n):
        w = surface_window_projection(grid, p, n, width, num_steps, **kw)
        return window_features(w, width / num_steps)

    return jax.vmap(one)(points, normals)
