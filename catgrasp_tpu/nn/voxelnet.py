"""Instance-segmentation network: dense voxel U-Net + per-point offset head.

TPU replacement for PointGroup's sparse-conv stack (SURVEY.md N5/N6, P19):
at CaTGrasp's scene scale (a 30 cm bin at 3-5 mm voxels -> <= 96x96x48
grid) a *dense* 3-D U-Net on the MXU beats sparse gather/scatter conv
kernels on TPU by a wide margin, and XLA fuses it end to end.  Voxelization
is one segment-mean scatter; per-point features come back with one gather.

Head layout follows ``pointgroup.py:156-161``: per-point 3-DoF offset to the
instance center + objectness logit; clustering happens in
:mod:`catgrasp_tpu.nn.cluster` (MeanShift on shifted points, matching the
reference's inference path ``predicter.py:317-338``).
"""
from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def voxelize(xyz: jnp.ndarray, feats: jnp.ndarray, origin: jnp.ndarray,
             voxel_size: float, grid_dims: tuple):
    """Mean-pool point features into a dense grid.

    xyz (N,3), feats (N,C) -> grid (D,H,W,C+1) (last channel = occupancy),
    flat voxel index per point (N,).  Equivalent of PG_OP
    ``voxelization_idx``/``voxelization`` (``voxelize.cpp:1-201``) as one
    scatter-add.
    """
    D, H, W = grid_dims
    ijk = jnp.floor((xyz - origin) / voxel_size).astype(jnp.int32)
    ijk = jnp.clip(ijk, 0, jnp.array([D - 1, H - 1, W - 1]))
    flat = (ijk[:, 0] * H + ijk[:, 1]) * W + ijk[:, 2]
    n_vox = D * H * W
    ones = jnp.ones((xyz.shape[0], 1), feats.dtype)
    f = jnp.concatenate([feats, ones], axis=-1)
    sums = jax.ops.segment_sum(f, flat, num_segments=n_vox)
    count = jnp.maximum(sums[:, -1:], 1.0)
    grid = jnp.concatenate([sums[:, :-1] / count, jnp.minimum(sums[:, -1:], 1.0)], axis=-1)
    return grid.reshape(D, H, W, -1), flat


class ConvBlock(nn.Module):
    features: int
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3, 3), dtype=self.compute_dtype)(x)
        x = nn.GroupNorm(num_groups=min(8, self.features), dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3, 3), dtype=self.compute_dtype)(x)
        x = nn.GroupNorm(num_groups=min(8, self.features), dtype=jnp.float32)(x)
        return nn.relu(x)


class VoxelUNet(nn.Module):
    """3-level dense U-Net over (D,H,W,C) — the ``UBlock [m..7m]`` analog
    (``pointgroup.py:65-110``) built from dense MXU convs."""

    base: int = 16
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, grid):
        x = grid[None]  # add batch
        e1 = ConvBlock(self.base, self.compute_dtype)(x)
        d1 = nn.max_pool(e1, (2, 2, 2), strides=(2, 2, 2))
        e2 = ConvBlock(self.base * 2, self.compute_dtype)(d1)
        d2 = nn.max_pool(e2, (2, 2, 2), strides=(2, 2, 2))
        e3 = ConvBlock(self.base * 4, self.compute_dtype)(d2)

        u2 = nn.ConvTranspose(self.base * 2, (2, 2, 2), strides=(2, 2, 2),
                              dtype=self.compute_dtype)(e3)
        u2 = ConvBlock(self.base * 2, self.compute_dtype)(jnp.concatenate([u2, e2], -1))
        u1 = nn.ConvTranspose(self.base, (2, 2, 2), strides=(2, 2, 2),
                              dtype=self.compute_dtype)(u2)
        u1 = ConvBlock(self.base, self.compute_dtype)(jnp.concatenate([u1, e1], -1))
        return u1[0]  # (D,H,W,base)


class SegNet(nn.Module):
    """Full per-scene model: voxel U-Net backbone + per-point heads.

    __call__(xyz (N,3), feats (N,C), origin, voxel_size, grid_dims) ->
    (offsets (N,3), objectness logits (N,)).
    """

    base: int = 16
    voxel_size: float = 0.004
    grid_dims: tuple = (96, 96, 48)
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, xyz, feats, origin):
        grid, flat = voxelize(xyz, feats, origin, self.voxel_size, self.grid_dims)
        vox_feat = VoxelUNet(self.base, self.compute_dtype)(grid)
        per_pt_vox = vox_feat.reshape(-1, vox_feat.shape[-1])[flat]  # one gather
        h = jnp.concatenate([xyz - origin, feats, per_pt_vox.astype(jnp.float32)], axis=-1)
        h = nn.Dense(64)(h)
        h = nn.relu(nn.GroupNorm(num_groups=8)(h))
        h = nn.Dense(64)(h)
        h = nn.relu(h)
        # offsets bounded to the physical object scale (CaTGrasp parts are
        # 1-5 cm): an unbounded head starts at O(1 m) predictions and the
        # shifted points are garbage until late in training
        offsets = 0.05 * nn.tanh(nn.Dense(3)(h))
        objectness = nn.Dense(1)(h)[:, 0]
        return offsets, objectness
