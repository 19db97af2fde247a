"""SDFGen .sdf file-format round trips and make_sdf pipeline semantics."""
import jax.numpy as jnp
import numpy as np

from catgrasp_tpu.geom import primitives as prim, sdf as sdflib
from catgrasp_tpu.geom.sdf_io import grid_from_file, grid_to_file, read_sdf, write_sdf
from catgrasp_tpu.pipelines.make_sdf import make_sdf_one


def test_sdf_file_roundtrip(tmp_path, rng):
    values = rng.normal(size=(5, 6, 7)).astype(np.float32)
    origin = np.array([-0.01, 0.02, -0.03], np.float32)
    path = str(tmp_path / "x.sdf")
    write_sdf(path, values, origin, 0.001)
    v2, o2, dx2 = read_sdf(path)
    assert v2.shape == (5, 6, 7)
    np.testing.assert_allclose(v2, values, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(o2, origin, rtol=1e-5)
    assert abs(dx2 - 0.001) < 1e-9


def test_file_layout_x_fastest(tmp_path):
    # values[i,j,k] = i + 10j + 100k; on disk x must vary fastest
    i, j, k = np.meshgrid(np.arange(2), np.arange(2), np.arange(2), indexing="ij")
    values = (i + 10 * j + 100 * k).astype(np.float32)
    path = str(tmp_path / "x.sdf")
    write_sdf(path, values, np.zeros(3), 1.0)
    lines = open(path).read().splitlines()
    data = [float(x) for x in lines[3:]]
    assert data == [0, 1, 10, 11, 100, 101, 110, 111]


def test_grid_roundtrip_preserves_queries(tmp_path):
    mesh = prim.make_instance("nut", "train", 0)
    grid = sdflib.bake_sdf(np.asarray(mesh.vertices), np.asarray(mesh.faces),
                           dims=24)
    path = str(tmp_path / "nut.sdf")
    grid_to_file(path, grid)
    grid2 = grid_from_file(path)
    pts = jnp.asarray(np.random.default_rng(0).uniform(-0.02, 0.02, (64, 3))
                      .astype(np.float32))
    d1 = sdflib.query_grid(grid, pts)
    d2 = sdflib.query_grid(grid2, pts)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)


def test_make_sdf_one_reference_semantics():
    mesh = prim.make_instance("nut", "train", 0)
    v = np.asarray(mesh.vertices)
    values, lower, spacing = make_sdf_one(v, np.asarray(mesh.faces),
                                          resolution=0.001, padding=5)
    extent = float((v.max(0) - v.min(0)).max())
    assert values.shape[0] == int(np.ceil(extent / 0.001)) + 10
    # interior exists and boundary ring is outside
    assert (values < 0).any()
    assert (values[0].min() > 0) and (values[-1].min() > 0)
    # grid covers mesh bbox with the padding
    assert (lower <= v.min(0)).all()
