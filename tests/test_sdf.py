import jax.numpy as jnp
import numpy as np
import pytest

from catgrasp_tpu.geom import primitives as prim
from catgrasp_tpu.geom import sdf as sdflib
from catgrasp_tpu.geom.mesh import TriMesh


def analytic_box_sdf(p, half):
    q = np.abs(p) - half
    outside = np.linalg.norm(np.maximum(q, 0.0), axis=-1)
    inside = np.minimum(np.max(q, axis=-1), 0.0)
    return outside + inside


def test_mesh_sdf_box_matches_analytic(rng):
    m = prim.box((0.04, 0.06, 0.02))
    pts = rng.uniform(-0.06, 0.06, size=(512, 3)).astype(np.float32)
    d = np.asarray(sdflib.mesh_sdf_points(jnp.asarray(pts), m.vertices, m.faces, chunk=256))
    expected = analytic_box_sdf(pts, np.array([0.02, 0.03, 0.01]))
    np.testing.assert_allclose(d, expected, atol=2e-4)


def test_bake_and_query_box(rng):
    m = prim.box((0.04, 0.04, 0.04))
    grid = sdflib.bake_sdf(m.vertices, m.faces, dims=32, padding=0.01, chunk=512)
    pts = rng.uniform(-0.035, 0.035, size=(256, 3)).astype(np.float32)
    d = np.asarray(sdflib.query_grid(grid, jnp.asarray(pts)))
    expected = analytic_box_sdf(pts, np.array([0.02, 0.02, 0.02]))
    # trilinear grid accuracy ~ spacing/2
    atol = float(grid.spacing) * 0.8
    np.testing.assert_allclose(d, expected, atol=atol)


def test_bake_sign_inside_outside():
    m = prim.cylinder(0.01, 0.02, n=24)
    grid = sdflib.bake_sdf(m.vertices, m.faces, dims=32, chunk=512)
    inside = sdflib.query_grid(grid, jnp.array([[0.0, 0.0, 0.0]]))
    outside = sdflib.query_grid(grid, jnp.array([[0.03, 0.0, 0.0]]))
    assert float(inside[0]) < 0
    assert float(outside[0]) > 0
    # exterior correction: far point distance roughly euclidean to surface
    far = sdflib.query_grid(grid, jnp.array([[0.2, 0.0, 0.0]]))
    assert abs(float(far[0]) - 0.19) < 0.02


def test_nut_hole_is_outside():
    """Concavity: the through-hole of a nut must be OUTSIDE (positive sdf).
    This is what VHACD in the reference gets wrong and SDFs get right
    (SURVEY.md §7 'Hard parts')."""
    m = prim.hex_nut(outer_r=0.012, inner_r=0.006, height=0.008)
    grid = sdflib.bake_sdf(m.vertices, m.faces, dims=40, chunk=512)
    hole_center = sdflib.query_grid(grid, jnp.array([[0.0, 0.0, 0.0]]))
    assert float(hole_center[0]) > 0  # hole is free space
    body = sdflib.query_grid(grid, jnp.array([[0.0085, 0.0, 0.0]]))
    assert float(body[0]) < 0  # ring material is solid


def test_union_mesh_sign_overlap():
    """Screw = shaft ∪ head with overlapping volumes; winding-number sign
    must keep the overlap interior negative (ray parity would flip it)."""
    m = prim.screw()
    # point in the overlap region (just below head, inside shaft)
    d = np.asarray(sdflib.mesh_sdf_points(jnp.array([[0.0, 0.0, 0.0005]]), m.vertices, m.faces, chunk=8))
    assert d[0] < 0


def test_sdf_grad_is_outward():
    m = prim.box((0.04, 0.04, 0.04))
    grid = sdflib.bake_sdf(m.vertices, m.faces, dims=32, chunk=512)
    pts = jnp.array([[0.03, 0.0, 0.0], [0.0, 0.03, 0.0]])
    g = np.asarray(sdflib.grad(grid.values, grid.lower, grid.spacing, pts))
    assert g[0, 0] > 0.9
    assert g[1, 1] > 0.9


def test_query_shapes_select():
    m1 = prim.box((0.02, 0.02, 0.02))
    m2 = prim.box((0.08, 0.08, 0.08))
    g1 = sdflib.bake_sdf(m1.vertices, m1.faces, dims=24, chunk=512)
    g2 = sdflib.bake_sdf(m2.vertices, m2.faces, dims=24, chunk=512)
    values = jnp.stack([g1.values, g2.values])
    lowers = jnp.stack([g1.lower, g2.lower])
    spacings = jnp.stack([g1.spacing, g2.spacing])
    p = jnp.array([[0.03, 0.0, 0.0]])
    d_small = sdflib.query_shapes(values, lowers, spacings, 0, p)
    d_big = sdflib.query_shapes(values, lowers, spacings, 1, p)
    assert float(d_small[0]) > 0  # outside the small box
    assert float(d_big[0]) < 0  # inside the big box


def test_surface_sampling_on_surface(rng):
    m = prim.hex_nut()
    pts, normals = m.sample_surface(256, rng, return_normals=True)
    d = np.asarray(sdflib.mesh_sdf_points(jnp.asarray(pts), m.vertices, m.faces, chunk=256))
    np.testing.assert_allclose(d, 0.0, atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(normals, axis=-1), 1.0, atol=1e-4)


@pytest.mark.parametrize("cls", ["nut", "screw", "hnm"])
def test_procedural_instances(cls):
    from catgrasp_tpu.geom.primitives import make_instance, num_instances
    assert num_instances(cls, "train") >= 2
    m = make_instance(cls, "train", 0)
    assert isinstance(m, TriMesh)
    assert m.extents.max() < 0.2  # sane physical size
    assert m.extents.min() > 0.001
