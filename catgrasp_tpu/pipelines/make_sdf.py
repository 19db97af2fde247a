"""Per-object SDF grid generation — TPU ``make_sdf.py``.

The reference shells out to the ``SDFGen`` binary per mesh
(``make_sdf.py:30-36``: dim = ceil(maxdim/0.001) + 2*5 voxels) and stores
``.sdf`` text files next to the models.  Here the bake is the C++/OpenMP
voxelizer (``catgrasp_tpu.native``) when built, else the JAX winding-number
bake — and the output is both an ``.npz`` grid (fast load) and an optional
reference-compatible ``.sdf`` file (``--write_sdf 1``).
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from .. import native
from ..config.loader import load_config
from ..geom import primitives as prim
from ..geom import sdf as sdflib
from ..geom.sdf_io import write_sdf


def make_sdf_one(vertices: np.ndarray, faces: np.ndarray,
                 resolution: float = 0.001, padding: int = 5,
                 max_dims: int = 128):
    """Bake one mesh at reference semantics: cell ~= ``resolution``,
    ``padding`` empty voxels on each side (``make_sdf.py:30-36``)."""
    extent = float((vertices.max(0) - vertices.min(0)).max())
    dims = int(np.ceil(extent / resolution)) + 2 * padding
    dims = min(max(dims, 8), max_dims)
    pad_m = padding * resolution
    if native.available():
        values, lower, spacing = native.bake_sdf(vertices, faces, dims, pad_m)
        return np.asarray(values), np.asarray(lower), float(spacing)
    grid = sdflib.bake_sdf(vertices, faces, dims=dims, padding=pad_m)
    return (np.asarray(grid.values), np.asarray(grid.lower),
            float(grid.spacing))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--class_name", default="nut")
    ap.add_argument("--splits", default="train,test")
    ap.add_argument("--resolution", type=float, default=0.001)
    ap.add_argument("--padding", type=int, default=5)
    ap.add_argument("--max_dims", type=int, default=128)
    ap.add_argument("--out_dir", default="dataset/sdf")
    ap.add_argument("--write_sdf", type=int, default=0,
                    help="also write reference-format .sdf text files")
    args = ap.parse_args()

    load_config("config.yml")  # validates config presence / class names
    os.makedirs(args.out_dir, exist_ok=True)
    for split in args.splits.split(","):
        for i in range(prim.num_instances(args.class_name, split)):
            mesh = prim.make_instance(args.class_name, split, i)
            values, lower, spacing = make_sdf_one(
                np.asarray(mesh.vertices), np.asarray(mesh.faces),
                args.resolution, args.padding, args.max_dims)
            stem = f"{args.out_dir}/{args.class_name}_{split}_{i}"
            np.savez_compressed(f"{stem}.npz", values=values, lower=lower,
                                spacing=spacing)
            if args.write_sdf:
                write_sdf(f"{stem}.sdf", values, lower, spacing)
            print(f"{stem}: dims={values.shape} spacing={spacing*1e3:.2f}mm "
                  f"inside_frac={(values < 0).mean():.3f}")


if __name__ == "__main__":
    main()
