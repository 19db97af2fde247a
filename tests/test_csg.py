"""CSG analytic SDFs must agree with the mesh-based oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from catgrasp_tpu.geom import csg as csglib
from catgrasp_tpu.geom import primitives as prim
from catgrasp_tpu.geom import sdf as sdflib


@pytest.mark.parametrize(
    "mesh,shape,tol",
    [
        (prim.box((0.04, 0.06, 0.02)), csglib.csg_box((0.04, 0.06, 0.02)), 5e-4),
        (prim.cylinder(0.01, 0.02, n=48), csglib.csg_cylinder(0.01, 0.02), 1e-3),
        (prim.hex_nut(), csglib.csg_hex_nut(), 1.5e-3),
        (prim.screw(n=48), csglib.csg_screw(), 1.5e-3),
        (prim.hnm_connector(), csglib.csg_hnm(), 1.5e-3),
    ],
)
def test_csg_matches_mesh_sdf(mesh, shape, tol, rng):
    ext = mesh.extents.max()
    pts = rng.uniform(-ext, ext, size=(256, 3)).astype(np.float32)
    d_csg = np.asarray(csglib.csg_sdf(shape, jnp.asarray(pts)))
    d_mesh = np.asarray(sdflib.mesh_sdf_points(jnp.asarray(pts), mesh.vertices, mesh.faces, chunk=256))
    np.testing.assert_allclose(d_csg, d_mesh, atol=tol)


def test_csg_normals_unit_and_outward(rng):
    shape = csglib.csg_hex_nut()
    pts = rng.uniform(-0.02, 0.02, size=(128, 3)).astype(np.float32)
    phi, n = csglib.csg_sdf_and_normal(shape, jnp.asarray(pts))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(n), axis=-1), 1.0, atol=1e-4)
    # stepping along the normal increases the SDF
    phi2 = csglib.csg_sdf(shape, jnp.asarray(pts) + 1e-4 * n)
    assert (np.asarray(phi2) > np.asarray(phi) - 1e-6).all()


def test_csg_nut_hole():
    shape = csglib.csg_hex_nut(outer_r=0.012, inner_r=0.006, height=0.008)
    d = csglib.csg_sdf(shape, jnp.array([[0.0, 0.0, 0.0], [0.0085, 0.0, 0.0], [0.03, 0.0, 0.0]]))
    d = np.asarray(d)
    assert d[0] > 0  # hole interior is free space
    assert d[1] < 0  # ring material
    assert d[2] > 0  # outside


def test_stack_and_select():
    a = csglib.csg_hex_nut()
    b = csglib.csg_screw()
    stacked = csglib.stack_shapes([a, b])
    sel = csglib.select_shape(stacked, 1)
    p = jnp.array([[0.0, 0.0, -0.01]])  # inside screw shaft
    np.testing.assert_allclose(
        np.asarray(csglib.csg_sdf(sel, p)), np.asarray(csglib.csg_sdf(b, p)), atol=1e-7
    )


def test_make_csg_instance_matches_mesh(rng):
    for cls in ("nut", "screw", "hnm"):
        mesh = prim.make_instance(cls, "train", 1)
        shape = csglib.make_csg_instance(cls, "train", 1)
        pts = rng.uniform(-0.03, 0.03, size=(128, 3)).astype(np.float32)
        d_csg = np.asarray(csglib.csg_sdf(shape, jnp.asarray(pts)))
        d_mesh = np.asarray(sdflib.mesh_sdf_points(jnp.asarray(pts), mesh.vertices, mesh.faces, chunk=128))
        np.testing.assert_allclose(d_csg, d_mesh, atol=2e-3)


def test_analytic_normals_match_autodiff():
    """csg_sdf_and_normal (analytic, hot path) vs autodiff oracle."""
    import numpy as np
    import jax.numpy as jnp
    from catgrasp_tpu.geom import csg as csglib

    rng = np.random.default_rng(0)
    shapes = [csglib.make_csg_instance(c, "train", i)
              for c in ("nut", "screw", "hnm") for i in (0, 1)]
    shapes.append(csglib.csg_place_fixture("nut"))
    for shape in shapes:
        pts = jnp.asarray(rng.uniform(-0.05, 0.05, (512, 3)).astype(np.float32))
        d1, n1 = csglib.csg_sdf_and_normal(shape, pts)
        d2, n2 = csglib.csg_sdf_and_normal_ad(shape, pts)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                                   atol=1e-5, rtol=1e-4)
        # normals: compare away from CSG seams/edges where argmax ties flip
        dots = np.sum(np.asarray(n1) * np.asarray(n2), axis=-1)
        assert (dots > 0.999).mean() > 0.97, f"normal mismatch {(dots <= 0.999).mean()}"
        # and the analytic phi matches the plain evaluator exactly
        d3 = csglib.csg_sdf(shape, pts)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d3), atol=2e-6)
