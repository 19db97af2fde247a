"""SDFGen ``.sdf`` file-format interop.

The reference stores per-mesh signed-distance grids as text files produced by
the external ``SDFGen`` binary (``make_sdf.py:30-36``) and read by
``meshpy.sdf_file.SdfFile._read_3d`` (``meshpy/meshpy/sdf_file.py:48-88``):

    line 1:  nx ny nz
    line 2:  ox oy oz            (grid origin, mesh coords)
    line 3:  dx                  (cell size)
    then nx*ny*nz values, one per line, x fastest, then y, then z,
    read into an array indexed [i][j][k] = [x][y][z].

This module reads/writes that exact format so grasp DBs, gripper SDFs and
canonical models are exchangeable with the reference, and converts to/from
our :class:`~catgrasp_tpu.geom.sdf.SdfGrid`.
"""
from __future__ import annotations

import numpy as np

from .sdf import SdfGrid


def read_sdf(path: str):
    """Read an SDFGen file -> (values[x,y,z] float32, origin (3,), dx)."""
    with open(path) as f:
        dims = np.array(f.readline().split(), dtype=int)
        origin = np.array(f.readline().split(), dtype=np.float32)
        dx = float(f.readline())
        data = np.loadtxt(f, dtype=np.float32)
    nx, ny, nz = dims
    if data.size != nx * ny * nz:
        raise ValueError(f"{path}: expected {nx*ny*nz} values, got {data.size}")
    # file order: x fastest, then y, then z -> reshape (z,y,x) and transpose
    values = data.reshape(nz, ny, nx).transpose(2, 1, 0)
    return np.ascontiguousarray(values), origin, dx


def write_sdf(path: str, values: np.ndarray, origin, dx: float):
    """Write an SDFGen-format file from values indexed [x,y,z]."""
    values = np.asarray(values, np.float32)
    nx, ny, nz = values.shape
    flat = values.transpose(2, 1, 0).reshape(-1)  # x fastest on disk
    with open(path, "w") as f:
        f.write(f"{nx} {ny} {nz}\n")
        ox, oy, oz = np.asarray(origin, np.float64)
        f.write(f"{ox:.8g} {oy:.8g} {oz:.8g}\n")
        f.write(f"{dx:.8g}\n")
        np.savetxt(f, flat, fmt="%.6g")


def grid_to_file(path: str, grid: SdfGrid):
    """Write an :class:`SdfGrid` as an SDFGen file."""
    write_sdf(path, np.asarray(grid.values), np.asarray(grid.lower),
              float(grid.spacing))


def grid_from_file(path: str) -> SdfGrid:
    """Load an SDFGen file into an :class:`SdfGrid` (requires cubic cells,
    which SDFGen always produces)."""
    import jax.numpy as jnp

    values, origin, dx = read_sdf(path)
    return SdfGrid(values=jnp.asarray(values), lower=jnp.asarray(origin),
                   spacing=jnp.float32(dx))
