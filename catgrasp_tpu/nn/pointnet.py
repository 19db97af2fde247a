"""PointNet heads in Flax — grasp-quality classifier and NUNOCS regressor.

Functional rebuild of the reference's ``pointnet2.py:153-329`` (which is
plain PointNet despite the filename): input-space STN, shared-MLP encoder
with global max pooling, classification head (grasp quality, 10 score bins,
``PointNetCls``) and per-point segmentation head (NUNOCS, 3 axes x 100 bins,
``PointNetSeg``).

TPU-first deviations from the torch original:
* GroupNorm instead of BatchNorm — identical accuracy regime for point
  clouds, but stateless and data-parallel-safe without cross-replica stat
  sync (BatchNorm under ``nn.DataParallel`` is exactly what the reference
  relied on, ``trainer_grasp.py:33``).
* ``compute_dtype`` lets the big shared-MLP matmuls run in bfloat16 on the
  MXU while parameters and logits stay float32.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _gn(x, groups: int = 8):
    g = min(groups, x.shape[-1])
    while x.shape[-1] % g:
        g -= 1
    return nn.GroupNorm(num_groups=g, dtype=jnp.float32)(x)


class MLPStack(nn.Module):
    features: tuple
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for f in self.features:
            x = nn.Dense(f, dtype=self.compute_dtype)(x)
            x = _gn(x)
            x = nn.relu(x)
        return x


class STN(nn.Module):
    """Spatial transformer predicting a k x k alignment matrix
    (``pointnet2.py:153-223``)."""

    k: int = 3
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, N, k)
        h = MLPStack((64, 128, 1024), self.compute_dtype)(x)
        h = jnp.max(h, axis=1)  # (B, 1024)
        h = MLPStack((512, 256), self.compute_dtype)(h)
        m = nn.Dense(self.k * self.k, kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros)(h)
        eye = jnp.eye(self.k, dtype=m.dtype).reshape(-1)
        return (m + eye).reshape(-1, self.k, self.k)


class PointNetEncoder(nn.Module):
    """Shared-MLP encoder (``pointnet2.py:226-271``): xyz STN + feature STN,
    returns (global 1024-d feature, per-point 64-d feature, transforms)."""

    feature_transform: bool = True
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, N, D); first 3 dims are xyz
        xyz, feats = x[..., :3], x[..., 3:]
        trans = STN(3, self.compute_dtype)(x)
        xyz = jnp.einsum("bnj,bjk->bnk", xyz, trans)
        x = jnp.concatenate([xyz, feats], axis=-1)

        x = MLPStack((64,), self.compute_dtype)(x)
        trans_feat = None
        if self.feature_transform:
            trans_feat = STN(64, self.compute_dtype)(x)
            x = jnp.einsum("bnj,bjk->bnk", x, trans_feat)
        point_feat = x  # (B,N,64)
        x = MLPStack((128,), self.compute_dtype)(x)
        x = nn.Dense(1024, dtype=self.compute_dtype)(x)
        x = _gn(x)
        g = jnp.max(x, axis=1)  # (B,1024)
        return g, point_feat, trans, trans_feat


class PointNetCls(nn.Module):
    """Grasp-quality classifier: cloud (in grasp frame) -> n_out score-bin
    logits (``pointnet2.py:275-299``; n_out = 10 bins per
    ``config_grasp.yml:15``)."""

    n_out: int = 10
    dropout: float = 0.4
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        g, _, _, trans_feat = PointNetEncoder(True, self.compute_dtype)(x)
        h = MLPStack((512,), self.compute_dtype)(g)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = MLPStack((256,), self.compute_dtype)(h)
        logits = nn.Dense(self.n_out)(h)
        return logits.astype(jnp.float32), trans_feat


class PointNetSeg(nn.Module):
    """Per-point head: NUNOCS coordinate bins, n_out = 3*bins
    (``pointnet2.py:302-329``; bins = 100 per ``config_nunocs.yml:16``)."""

    n_out: int = 300
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        g, point_feat, _, trans_feat = PointNetEncoder(True, self.compute_dtype)(x)
        n = x.shape[1]
        gg = jnp.broadcast_to(g[:, None, :], (g.shape[0], n, g.shape[1]))
        h = jnp.concatenate([gg, point_feat], axis=-1)  # (B,N,1088)
        h = MLPStack((512, 256, 128), self.compute_dtype)(h)
        logits = nn.Dense(self.n_out)(h)
        return logits.astype(jnp.float32), trans_feat


def feature_transform_regularizer(trans_feat: jnp.ndarray) -> jnp.ndarray:
    """||I - A Aᵀ|| regularizer for the 64x64 STN (standard PointNet)."""
    k = trans_feat.shape[-1]
    eye = jnp.eye(k)
    d = eye[None] - trans_feat @ jnp.swapaxes(trans_feat, -1, -2)
    return jnp.mean(jnp.sum(d * d, axis=(-2, -1)))
