"""Batched RANSAC 9-DoF (rotation + translation + anisotropic scale) fit.

TPU port of ``aligning.py:35-119`` (``estimate9DTransform``): map a
predicted NUNOCS cloud onto the camera cloud with per-axis scale.  The
reference loops 1000 cv2.estimateAffine3D hypotheses in Python; here all
hypotheses solve, validate, and score as one vmapped program.

Hypothesis: 4 exact point pairs -> affine A (4x4 linear solve); decompose
A = R·diag(s); gates: per-axis scale bounds, SVD singular values in
[0.8, 1.2], det(R) > 0 (``aligning.py:38-53``); score = inlier ratio at
``pass_threshold``; winner = best ratio.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("max_iter",))
def estimate_9d_transform(key, source: jnp.ndarray, target: jnp.ndarray,
                          mask: jnp.ndarray, pass_threshold: float,
                          max_scale: jnp.ndarray | None = None,
                          min_scale: jnp.ndarray | None = None,
                          max_iter: int = 1000):
    """source/target (N,3) with valid-point mask (N,).

    Returns (transform (4,4), inlier_ratio (), inlier_mask (N,)); ratio is 0
    when no valid hypothesis passed the gates.
    """
    n = source.shape[0]
    max_scale = jnp.array([99.0] * 3) if max_scale is None else max_scale
    min_scale = jnp.zeros(3) if min_scale is None else min_scale

    valid_p = mask.astype(jnp.float32)
    probs = valid_p / jnp.maximum(valid_p.sum(), 1.0)
    ids = jax.random.choice(key, n, (max_iter, 4), replace=True, p=probs)

    src_h = jnp.concatenate([source, jnp.ones((n, 1))], axis=-1)

    def hypothesis(idx):
        S = src_h[idx]  # (4,4)
        Tg = target[idx]  # (4,3)
        # A^T = S^{-1} Tg  (exact affine through 4 points)
        At = jnp.linalg.solve(S + 1e-9 * jnp.eye(4), Tg)  # (4,3)
        A = At.T  # (3,4): [M | t]
        M = A[:, :3]
        scales = jnp.linalg.norm(M, axis=0)
        ok = jnp.all(scales <= max_scale) & jnp.all(scales >= min_scale)
        R = M / jnp.maximum(scales[None, :], 1e-9)
        u, s, vh = jnp.linalg.svd(R)
        ok &= (jnp.min(s) >= 0.8) & (jnp.max(s) <= 1.2)
        R_o = u @ vh
        ok &= jnp.linalg.det(R_o) > 0
        M_o = R_o * scales[None, :]
        T = jnp.eye(4).at[:3, :3].set(M_o).at[:3, 3].set(A[:, 3])
        # score
        mapped = source @ M_o.T + A[:, 3]
        err = jnp.linalg.norm(mapped - target, axis=-1)
        inl = (err <= pass_threshold) & mask
        ratio = jnp.sum(inl) / jnp.maximum(jnp.sum(mask), 1)
        ratio = jnp.where(ok & jnp.all(jnp.isfinite(T)), ratio, 0.0)
        return T, ratio, inl

    Ts, ratios, inls = jax.lax.map(hypothesis, ids, batch_size=256)
    best = jnp.argmax(ratios)
    return Ts[best], ratios[best], inls[best]
