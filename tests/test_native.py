"""Native C++ SDF voxelizer vs the JAX implementation (cross-oracle)."""
import jax.numpy as jnp
import numpy as np
import pytest

from catgrasp_tpu import native
from catgrasp_tpu.geom import primitives as prim
from catgrasp_tpu.geom import sdf as sdflib

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib build failed")


def test_native_mesh_sdf_matches_jax(rng):
    m = prim.hex_nut()
    pts = rng.uniform(-0.02, 0.02, (256, 3)).astype(np.float32)
    d_native = native.mesh_sdf(m.vertices, m.faces, pts)
    d_jax = np.asarray(sdflib.mesh_sdf_points(jnp.asarray(pts), m.vertices, m.faces, chunk=256))
    np.testing.assert_allclose(d_native, d_jax, atol=1e-4)


def test_native_bake_matches_jax():
    m = prim.box((0.03, 0.04, 0.02))
    values, lower, spacing = native.bake_sdf(m.vertices, m.faces, dims=24, padding=0.005)
    g = sdflib.bake_sdf(m.vertices, m.faces, dims=24, padding=0.005, chunk=512)
    np.testing.assert_allclose(lower, np.asarray(g.lower), atol=1e-5)
    np.testing.assert_allclose(spacing, float(g.spacing), rtol=1e-5)
    np.testing.assert_allclose(values, np.asarray(g.values), atol=2e-4)


def test_native_bake_sign_concavity():
    m = prim.hex_nut(outer_r=0.012, inner_r=0.006, height=0.008)
    values, lower, spacing = native.bake_sdf(m.vertices, m.faces, dims=32)
    # hole center voxel positive, ring material negative
    c = (np.array([0.0, 0, 0]) - lower) / spacing
    i, j, k = np.round(c).astype(int)
    assert values[i, j, k] > 0
    c2 = (np.array([0.0085, 0, 0]) - lower) / spacing
    i, j, k = np.round(c2).astype(int)
    assert values[i, j, k] < 0
