"""Legacy dexnet surface-window features (grasp/contacts.py) on analytic
SDF grids — sphere (known curvature / cap profile) and half-space (flat)."""
import jax.numpy as jnp
import numpy as np
import pytest

from catgrasp_tpu.geom.sdf import SdfGrid
from catgrasp_tpu.grasp import contacts as ct

R = 0.03


def _grid(fn, lo=-0.05, hi=0.05, n=96):
    xs = np.linspace(lo, hi, n)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    return SdfGrid(values=jnp.asarray(fn(X, Y, Z), jnp.float32),
                   lower=jnp.array([lo] * 3, jnp.float32),
                   spacing=jnp.float32(xs[1] - xs[0]))


@pytest.fixture(scope="module")
def sphere():
    return _grid(lambda x, y, z: np.sqrt(x**2 + y**2 + z**2) - R)


@pytest.fixture(scope="module")
def halfspace():
    return _grid(lambda x, y, z: z)


def test_tangent_frame_right_handed_and_aligned():
    d, t1, t2 = ct.tangent_frame(jnp.array([0.0, 0.0, 1.0]))
    assert np.allclose(d, [0, 0, -1])  # inward
    assert np.allclose(t1, [1, 0, 0], atol=1e-6)  # aligned with object x
    assert np.allclose(np.cross(t1, t2), d, atol=1e-6)
    # plane perpendicular to x: falls back to the y projection
    d, t1, t2 = ct.tangent_frame(jnp.array([1.0, 0.0, 0.0]))
    assert np.allclose(t1, [0, 1, 0], atol=1e-6)
    assert np.allclose(np.cross(t1, t2), d, atol=1e-6)


def test_window_sdf_sphere(sphere):
    p = jnp.array([0.0, 0.0, R])
    w = np.asarray(ct.surface_window_sdf(sphere, p, jnp.array([0.0, 0.0, 1.0]),
                                         width=0.02, num_steps=11))
    # tangent-plane SDF: center ~0, rises as sqrt(R^2+rho^2)-R off-center
    assert abs(w[5, 5]) < 2e-3
    rho = 0.01
    assert w[0, 5] == pytest.approx(np.hypot(R, rho) - R, abs=2e-3)


def test_projection_window_flat(halfspace):
    p = jnp.zeros(3)
    w = np.asarray(ct.surface_window_projection(
        halfspace, p, jnp.array([0.0, 0.0, 1.0]), width=0.02, num_steps=11,
        back_up=0.005, align_pca=False, filter_sigma_range=0.0))
    assert np.all(np.abs(w) < 1e-3)  # plane == tangent plane
    feats = ct.window_features(jnp.asarray(w), 0.02 / 11)
    assert float(jnp.max(jnp.abs(feats.gauss_curvature))) < 1e-2


def test_projection_window_sphere_profile(sphere):
    p = jnp.array([0.0, 0.0, R])
    w = np.asarray(ct.surface_window_projection(
        sphere, p, jnp.array([0.0, 0.0, 1.0]), width=0.02, num_steps=11,
        back_up=0.005, num_samples=256, align_pca=False,
        filter_sigma_range=0.0))
    # spherical-cap depth: R - sqrt(R^2 - rho^2) below the tangent plane
    res = 0.02 / 11
    s = np.linspace(-0.01 + res / 2, 0.01 - res / 2, 11)
    c1, c2 = np.meshgrid(s, s, indexing="ij")
    rho2 = c1**2 + c2**2
    expect = (R - np.sqrt(np.maximum(R**2 - rho2, 0.0))).T
    assert np.allclose(w, expect, atol=1.5e-3)


def test_projection_window_no_contact(sphere):
    # window far wider than the sphere: peripheral rays never hit
    p = jnp.array([0.0, 0.0, R])
    w = np.asarray(ct.surface_window_projection(
        sphere, p, jnp.array([0.0, 0.0, 1.0]), width=0.2, num_steps=11,
        back_up=0.005, align_pca=False, filter_sigma_range=0.0))
    assert w[0, 0] == pytest.approx(ct.NO_CONTACT_DIST)
    assert abs(w[5, 5]) < 1e-3


def test_sphere_gauss_curvature(sphere):
    p = jnp.array([0.0, 0.0, R])
    w = ct.surface_window_projection(
        sphere, p, jnp.array([0.0, 0.0, 1.0]), width=0.016, num_steps=21,
        back_up=0.005, num_samples=256, align_pca=False,
        filter_sigma_range=0.0)
    feats = ct.window_features(w, 0.016 / 21)
    K_center = float(feats.gauss_curvature[10, 10])
    assert K_center == pytest.approx(1.0 / R**2, rel=0.25)


def test_batch_and_asarray(sphere):
    pts = jnp.array([[0.0, 0.0, R], [0.0, 0.0, R]])
    nrm = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    sw = ct.surface_windows_batch(sphere, pts, nrm, width=0.02, num_steps=9,
                                  align_pca=False, filter_sigma_range=0.0)
    assert sw.proj_win.shape == (2, 9, 9)
    v = sw.asarray(proj_win_weight=1.0, curvature_weight=1.0)
    # reference asarray appends all four blocks (zero-weighted included)
    assert v.shape == (4 * 2 * 81,)


def test_pca_alignment_flip_invariant(sphere):
    # rotationally symmetric surface: PCA pass must still return a finite
    # window with the same center depth
    p = jnp.array([0.0, 0.0, R])
    w = np.asarray(ct.surface_window_projection(
        sphere, p, jnp.array([0.0, 0.0, 1.0]), width=0.02, num_steps=11,
        back_up=0.005, align_pca=True, filter_sigma_range=0.0))
    assert np.isfinite(w).all()
    assert abs(w[5, 5]) < 1e-3
