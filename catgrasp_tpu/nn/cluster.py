"""Fixed-shape clustering: MeanShift and ball-query connected components.

The reference clusters shifted points with sklearn MeanShift at inference
(``predicter.py:317-338``) and with CUDA ball-query+BFS during PointGroup
training (``pointgroup_ops``).  Both become masked fixed-iteration JAX here:

* :func:`mean_shift` — flat kernel mean shift, fixed iterations, mode
  merging by proximity; fully vmappable.
* :func:`connected_components` — label propagation over the ε-neighbor
  graph (pointer-jumping, log-N sweeps) — the ``bfs_cluster`` analog.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n_iter", "n_seeds"))
def mean_shift(points: jnp.ndarray, bandwidth: float, mask: jnp.ndarray | None = None,
               n_iter: int = 12, n_seeds: int = 128, key=None):
    """Cluster points (N,3) -> (labels (N,), modes (n_seeds,3), n_modes).

    Flat-kernel mean shift from subsampled seeds; modes within bandwidth/2
    merge (lowest seed index wins); every point takes its nearest mode's
    label.  Invalid points (mask False) get label -1.
    """
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    key = jax.random.PRNGKey(0) if key is None else key
    # seed selection biased to valid points
    p = mask.astype(jnp.float32)
    p = p / jnp.maximum(p.sum(), 1.0)
    seed_ids = jax.random.choice(key, n, (n_seeds,), replace=True, p=p)
    seeds = points[seed_ids]

    bw2 = bandwidth * bandwidth

    def shift_once(s, _):
        d2 = jnp.sum((s[:, None, :] - points[None]) ** 2, axis=-1)  # (S,N)
        w = ((d2 <= bw2) & mask[None]).astype(points.dtype)
        denom = jnp.maximum(w.sum(axis=-1, keepdims=True), 1.0)
        return (w @ points) / denom, None

    seeds, _ = jax.lax.scan(shift_once, seeds, None, length=n_iter)

    # merge modes: seed i joins the lowest-index seed within bandwidth/2
    d2 = jnp.sum((seeds[:, None] - seeds[None]) ** 2, axis=-1)
    close = d2 <= (bandwidth / 2) ** 2
    owner = jnp.argmax(close, axis=-1)  # lowest index with close=True
    # pointer jumping to canonical owner
    for _ in range(4):
        owner = owner[owner]
    uniq = owner == jnp.arange(n_seeds)
    # relabel canonical owners densely
    dense = jnp.cumsum(uniq) - 1
    mode_label = dense[owner]
    n_modes = jnp.sum(uniq)

    # assign points to nearest surviving mode center
    modes = seeds
    d2p = jnp.sum((points[:, None] - modes[None]) ** 2, axis=-1)  # (N,S)
    d2p = jnp.where(uniq[None, :], d2p, jnp.inf)
    nearest_seed = jnp.argmin(d2p, axis=-1)
    labels = jnp.where(mask, mode_label[nearest_seed], -1)
    return labels, seeds, n_modes


@partial(jax.jit, static_argnames=("n_sweeps",))
def connected_components(points: jnp.ndarray, radius: float,
                         mask: jnp.ndarray | None = None, n_sweeps: int = 16):
    """ε-graph connected components by min-label propagation (N ≤ a few k).

    The ``PG_OP.bfs_cluster`` analog (``bfs_cluster.cpp:1-246``): two points
    connect if within ``radius``; labels converge to the component's lowest
    point index.  Returns (labels (N,), densely -1 for masked-out points).
    """
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    d2 = jnp.sum((points[:, None] - points[None]) ** 2, axis=-1)
    adj = (d2 <= radius * radius) & mask[:, None] & mask[None, :]
    labels = jnp.where(mask, jnp.arange(n), n)

    def sweep(lab, _):
        neigh = jnp.where(adj, lab[None, :], n)
        return jnp.minimum(lab, jnp.min(neigh, axis=-1)), None

    labels, _ = jax.lax.scan(sweep, labels, None, length=n_sweeps)
    return jnp.where(mask, labels, -1)


def segment_mean(values: jnp.ndarray, labels: jnp.ndarray, num_segments: int):
    """Per-cluster mean — ``PG_OP.sec_mean`` analog via segment ops."""
    safe = jnp.where(labels >= 0, labels, num_segments)
    sums = jax.ops.segment_sum(values, safe, num_segments=num_segments + 1)
    cnt = jax.ops.segment_sum(jnp.ones_like(labels, jnp.float32), safe,
                              num_segments=num_segments + 1)
    return sums[:num_segments] / jnp.maximum(cnt[:num_segments, None], 1.0)


def segment_min(values: jnp.ndarray, labels: jnp.ndarray, num_segments: int):
    """Per-cluster min — ``PG_OP.sec_min`` analog (``sec_mean.cu``).  Empty
    segments return +inf (the CUDA op leaves them at the init value)."""
    safe = jnp.where(labels >= 0, labels, num_segments)
    return jax.ops.segment_min(values, safe, num_segments=num_segments + 1)[:num_segments]


def segment_max(values: jnp.ndarray, labels: jnp.ndarray, num_segments: int):
    """Per-cluster max — ``PG_OP.sec_max`` analog.  Empty segments -inf."""
    safe = jnp.where(labels >= 0, labels, num_segments)
    return jax.ops.segment_max(values, safe, num_segments=num_segments + 1)[:num_segments]
