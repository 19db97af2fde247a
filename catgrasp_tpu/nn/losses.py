"""Training losses.

``nocs_min_symmetry_ce`` is the TPU port of ``loss.py:16-45``
(NocsMinSymmetryCELoss): per-axis 100-bin cross-entropy of predicted NUNOCS
coordinates against every symmetry transform of the target, taking the min
over symmetries per sample.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def nocs_min_symmetry_ce(pred_logits: jnp.ndarray, target_nocs: jnp.ndarray,
                         symmetry_tfs: jnp.ndarray, n_bins: int = 100) -> jnp.ndarray:
    """pred_logits (B, N, 3*n_bins); target_nocs (B, N, 3) in [0, 1];
    symmetry_tfs (S, 4, 4).  Returns scalar loss.

    Semantics of ``loss.py:29-45``: targets are centered (−0.5), mapped
    through each symmetry transform, re-shifted (+0.5), digitized into bins;
    CE summed over the 3 axes, averaged over points, min over symmetries,
    mean over batch.
    """
    B, N = target_nocs.shape[:2]
    S = symmetry_tfs.shape[0]
    centered = target_nocs - 0.5  # (B,N,3)
    R = symmetry_tfs[:, :3, :3]
    t = symmetry_tfs[:, :3, 3]
    tgt = jnp.einsum("sij,bnj->bsni", R, centered) + t[None, :, None, :] + 0.5
    bins = jnp.clip((tgt * n_bins).astype(jnp.int32), 0, n_bins - 1)  # (B,S,N,3)

    logits = pred_logits.reshape(B, N, 3, n_bins)
    logp = jax.nn.log_softmax(logits, axis=-1)  # (B,N,3,n_bins)
    # gather log-prob of target bin for each symmetry
    lp = jnp.take_along_axis(
        logp[:, None], bins[..., None], axis=-1
    )[..., 0]  # (B,S,N,3)
    ce = -jnp.sum(lp, axis=-1)  # (B,S,N) sum over axes
    per_sym = jnp.mean(ce, axis=-1)  # (B,S)
    return jnp.mean(jnp.min(per_sym, axis=-1))


def grasp_quality_ce(logits: jnp.ndarray, score_bins: jnp.ndarray) -> jnp.ndarray:
    """CE over the 10 perturbation-score bins (``trainer_grasp.py`` loss;
    binning per ``dataset_grasp.py:100``)."""
    return optax.softmax_cross_entropy_with_integer_labels(logits, score_bins).mean()


def grasp_quality_ordinal(logits: jnp.ndarray, score_bins: jnp.ndarray) -> jnp.ndarray:
    """Ordinal auxiliary for the grasp-quality head: the 10 bins are ORDERED
    perturbation scores, which plain CE ignores (predicting bin 9 for a
    bin-0 grasp costs the same as predicting bin 1).  Penalize the expected
    bin index under the softmax against the label bin — this is the
    quantity the ranking diagnostic (Spearman of expq vs score,
    ``scripts/graspnet_diag.py``) and the eval loop's p_G ordering actually
    consume.  Smooth-L1 so bin-9-vs-0 outliers do not dominate."""
    p = jax.nn.softmax(logits, axis=-1)
    expq = jnp.sum(p * jnp.arange(logits.shape[-1], dtype=p.dtype), axis=-1)
    err = (expq - score_bins.astype(p.dtype)) / (logits.shape[-1] - 1.0)
    return jnp.mean(jnp.where(jnp.abs(err) < 0.1,
                              0.5 * err * err / 0.1,
                              jnp.abs(err) - 0.05))


def offset_loss(pred_offsets: jnp.ndarray, gt_offsets: jnp.ndarray,
                valid: jnp.ndarray) -> jnp.ndarray:
    """Instance-center offset regression: L1 distance + cosine direction
    term, masked — the PointGroup offset loss (``pointgroup.py:363-402``)."""
    w = valid.astype(jnp.float32)
    denom = jnp.maximum(w.sum(), 1.0)
    dist = jnp.sum(jnp.abs(pred_offsets - gt_offsets), axis=-1)
    l_dist = jnp.sum(dist * w) / denom
    gt_n = gt_offsets / (jnp.linalg.norm(gt_offsets, axis=-1, keepdims=True) + 1e-8)
    pr_n = pred_offsets / (jnp.linalg.norm(pred_offsets, axis=-1, keepdims=True) + 1e-8)
    l_dir = jnp.sum((1.0 - jnp.sum(gt_n * pr_n, axis=-1)) * w) / denom
    return l_dist + l_dir
