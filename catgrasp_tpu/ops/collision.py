"""Fused Pallas kernel for the grasp-filter collision gate.

The reference's hottest loop (``my_cpp/common.cpp:156-321``) collision-checks
every candidate grasp pose against the scene: per pose x symmetry x ±1-3 mm
lateral adjust it runs an FCL gripper-mesh-vs-octree query.  The XLA rewrite
(`grasp/filter.py`) flips the direction — transform the scene cloud into each
grasp frame and test against the gripper's analytic boxes — but still
materializes a (poses, points) intermediate per chunk in HBM.

This kernel fuses the whole gate on-chip: for a tile of poses and a tile of
cloud points it does the frame transform as one MXU matmul, the box interval
tests for every box x lateral offset on the VPU, and OR-reduces the hit mask
into a (poses, offsets) accumulator that lives in VMEM across cloud tiles.
HBM traffic is exactly one read of the cloud per pose-tile and one
(poses, 8) write — nothing quadratic ever leaves the chip.

Layout choices (see pallas_guide.md):
  * cloud is passed as (8, C): rows x,y,z,1,0.. so the per-pose transform is
    ``T_rows (TP,8) @ cloud (8,TC)`` — lanes along C, MXU-friendly.
  * the hit accumulator is (8, TP): offsets (7, padded to 8 sublanes) by
    poses (128 lanes) — exactly one min f32 tile.
  * boxes / offsets / margin are compile-time constants (the gripper spec is
    a static dataclass), so the K x A interval tests unroll with no gathers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TP = 128   # pose tile (lanes of the accumulator)
TC = 1024  # cloud-point tile (lanes of the transform matmul)
A_PAD = 8  # offsets padded to one sublane tile

_FAR = 1e6  # sentinel for masked / padding points: outside every box


def _kernel(tx_ref, ty_ref, tz_ref, cloud_ref, out_ref, *, boxes, offsets, margin):
    """One (pose-tile, cloud-tile) grid cell.

    tx/ty/tz: (TP, 8) rows of the world->grasp transforms.
    cloud:    (8, TC) homogeneous points (pre-masked with _FAR).
    out:      (A_PAD, TP) f32 accumulator; >0 means some point hits a box.
    """
    j = pl.program_id(1)
    pts = cloud_ref[:]
    x = jnp.dot(tx_ref[:], pts, preferred_element_type=jnp.float32)  # (TP, TC)
    y = jnp.dot(ty_ref[:], pts, preferred_element_type=jnp.float32)
    z = jnp.dot(tz_ref[:], pts, preferred_element_type=jnp.float32)

    rows = []
    # xz interval tests are offset-independent: compute once per box.
    ok_xz = [
        (jnp.abs(x - cx) - hx < margin) & (jnp.abs(z - cz) - hz < margin)
        for (cx, cy, cz), (hx, hy, hz) in boxes
    ]
    for off in offsets:
        hit = None
        for ((cx, cy, cz), (hx, hy, hz)), oxz in zip(boxes, ok_xz):
            h = oxz & (jnp.abs(y - cy - off) - hy < margin)
            hit = h if hit is None else (hit | h)
        # reduce in f32 — Mosaic can't lay out 1-D i1 vectors for the stack
        rows.append(jnp.max(hit.astype(jnp.float32), axis=1))  # (TP,)
    for _ in range(A_PAD - len(offsets)):
        rows.append(jnp.zeros((x.shape[0],), jnp.float32))
    tile = jnp.stack(rows)  # (A_PAD, TP)

    @pl.when(j == 0)
    def _():
        out_ref[:] = tile

    @pl.when(j > 0)
    def _():
        out_ref[:] = jnp.maximum(out_ref[:], tile)


@functools.partial(jax.jit, static_argnames=("boxes", "offsets", "margin", "interpret"))
def box_hits(t_inv: jnp.ndarray, cloud: jnp.ndarray, mask: jnp.ndarray,
             boxes: tuple, offsets: tuple, margin: float,
             interpret: bool = False) -> jnp.ndarray:
    """For P world->grasp transforms, which lateral offsets collide?

    t_inv:  (P, 4, 4) world(/camera)->grasp-frame transforms.
    cloud:  (C, 3) points in the world(/camera) frame.
    mask:   (C,) bool — invalid points never hit.
    boxes:  static ((center_xyz), (half_xyz)) pairs in the grasp frame.
    offsets: static lateral +y gripper shifts (``common.cpp:253-287``).

    Returns hit: (P, len(offsets)) bool.
    """
    P = t_inv.shape[0]
    C = cloud.shape[0]
    p_pad = -P % TP
    c_pad = -C % TC

    rows = jnp.pad(t_inv[:, :3, :], ((0, p_pad), (0, 0), (0, 4)))  # (P', 3, 8)
    tx, ty, tz = rows[:, 0], rows[:, 1], rows[:, 2]

    pts = jnp.where(mask[:, None], cloud, _FAR)
    pts_h = jnp.concatenate(
        [pts, jnp.ones((C, 1), pts.dtype), jnp.zeros((C, 4), pts.dtype)], axis=1)
    pts_h = jnp.pad(pts_h, ((0, c_pad), (0, 0)), constant_values=0.0)
    # padding points: set x row to FAR so they miss every box
    if c_pad:
        pts_h = pts_h.at[C:, 0].set(_FAR)
    cloud_t = pts_h.T  # (8, C')

    n_p, n_c = (P + p_pad) // TP, (C + c_pad) // TC
    kern = functools.partial(_kernel, boxes=boxes, offsets=offsets, margin=margin)
    out = pl.pallas_call(
        kern,
        grid=(n_p, n_c),
        in_specs=[
            pl.BlockSpec((TP, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TP, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TC), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((A_PAD, TP), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((A_PAD, (P + p_pad) // TP * TP), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * 8 * (P + p_pad) * (C + c_pad),
            bytes_accessed=4 * (8 * (C + c_pad) * n_p + 3 * 8 * (P + p_pad)),
            transcendentals=0,
        ),
    )(tx, ty, tz, cloud_t)
    return out[: len(offsets), :P].T > 0.0


def pose_inverse_batch(T: jnp.ndarray) -> jnp.ndarray:
    """(N,4,4) rigid-pose inverse: [R^T, -R^T t]."""
    R = T[:, :3, :3]
    t = T[:, :3, 3]
    Rt = jnp.swapaxes(R, 1, 2)
    ti = -jnp.einsum("nij,nj->ni", Rt, t)
    out = jnp.zeros_like(T).at[:, :3, :3].set(Rt).at[:, :3, 3].set(ti)
    return out.at[:, 3, 3].set(1.0)


def as_static_boxes(centers, halves) -> tuple:
    """Convert (K,3) center/half arrays to the static nested-tuple form."""
    c = np.asarray(centers, dtype=np.float64)
    h = np.asarray(halves, dtype=np.float64)
    return tuple((tuple(map(float, ci)), tuple(map(float, hi))) for ci, hi in zip(c, h))
