"""Inference wrappers — the three predicters (``predicter.py``).

* :class:`GraspPredicter`  (``predicter.py:67-94``): per-grasp scene clouds
  in the grasp frame -> softmax over 10 score bins -> (label, confidence,
  distribution).
* :class:`NunocsPredicter` (``predicter.py:135-203``): per-point bin argmax
  -> NUNOCS cloud -> RANSAC 9D similarity fit over thresholds {3, 5 mm},
  ratio-gated.
* :class:`SegPredicter`    (``predicter.py:232-338``): SegNet offsets ->
  MeanShift clustering of shifted points (bandwidth per class).

All heavy paths are jitted; batching/padding handled here so callers can
pass ragged host data.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import transforms as tf
from ..data import augment
from ..nn.cluster import mean_shift
from ..nn.pointnet import PointNetCls, PointNetSeg
from ..nn.voxelnet import SegNet
from .ransac import estimate_9d_transform

# per-class MeanShift bandwidths (reference predicter.py:317-331).  nut is
# calibrated UP from the reference's value to our seg net's offset-noise
# floor: on val scenes 0.007 oversegments 2-3x (15-20 clusters for 5-8
# instances) while 0.012 matches instance counts (see logs/segdiag sweep,
# round 2)
CLUSTER_BANDWIDTH = {"nut": 0.012, "hnm": 0.005, "screw": 0.009}


@dataclass
class GraspPredicter:
    model: PointNetCls
    params: dict
    n_pts: int = 1024
    batch: int = 200  # predicter.py:80

    @staticmethod
    def create(params, n_bins: int = 10, n_pts: int = 1024):
        return GraspPredicter(PointNetCls(n_out=n_bins), params, n_pts)

    def predict_batch(self, cloud_xyz: np.ndarray, cloud_normal: np.ndarray,
                      grasp_poses: np.ndarray, rng=None):
        """Scene cloud (N,3[+3]) + grasp poses (G,4,4) -> (labels (G,),
        confidence (G,), distribution (G, bins))."""
        rng = rng or np.random.default_rng(0)
        G = len(grasp_poses)
        n = len(cloud_xyz)
        ids = rng.choice(n, self.n_pts, replace=n < self.n_pts)
        xyz = jnp.asarray(cloud_xyz[ids])
        nrm = jnp.asarray(cloud_normal[ids])

        @jax.jit
        def run(poses):
            Tinv = tf.pose_inverse(poses)
            x = tf.transform_points(Tinv, xyz)  # (G,P,3)
            nn_ = jnp.einsum("gij,pj->gpi", Tinv[:, :3, :3], nrm)
            inp = jnp.concatenate([x, nn_], axis=-1)
            logits, _ = self.model.apply({"params": self.params}, inp)
            return jax.nn.softmax(logits, axis=-1)

        dists = []
        for i in range(0, G, self.batch):
            chunk = jnp.asarray(grasp_poses[i:i + self.batch])
            pad = self.batch - chunk.shape[0]
            if pad:
                chunk = jnp.concatenate([chunk, jnp.tile(jnp.eye(4), (pad, 1, 1))])
            dists.append(np.asarray(run(chunk))[: self.batch - pad if pad else self.batch])
        dist = np.concatenate(dists)[:G]
        labels = dist.argmax(axis=-1)
        conf = dist.max(axis=-1)
        return labels, conf, dist

    def expected_quality(self, dist: np.ndarray, bin_values: np.ndarray | None = None):
        """P(G) proxy: probability mass on high-score bins, used against
        ``p_G_thres`` (run_grasp_simulation.py:591-610 semantics)."""
        nb = dist.shape[-1]
        if bin_values is None:
            bin_values = (np.arange(nb) + 0.5) / nb
        return (dist * bin_values).sum(-1)


@dataclass
class NunocsPredicter:
    model: PointNetSeg
    params: dict
    n_bins: int = 100
    n_pts: int = 2048

    @staticmethod
    def create(params, n_bins: int = 100, n_pts: int = 2048):
        return NunocsPredicter(PointNetSeg(n_out=3 * n_bins), params, n_bins, n_pts)

    def predict(self, cloud_xyz: np.ndarray, cloud_normal: np.ndarray, rng=None,
                key=None, thresholds=(0.003, 0.005), min_ratio: float = 0.3):
        """-> dict(nocs_cloud (N,3), nocs_pose (4,4) canonical->cam, ratio).

        nocs_pose maps CENTERED nocs (nocs - 0.5) into the camera frame with
        per-axis scale — the 9D fit of ``predicter.py:135-203``.
        """
        rng = rng or np.random.default_rng(0)
        key = key if key is not None else jax.random.PRNGKey(0)
        n = len(cloud_xyz)
        ids = rng.choice(n, self.n_pts, replace=n < self.n_pts)
        d = {"cloud_xyz": cloud_xyz[ids].copy(), "cloud_normal": cloud_normal[ids].copy()}
        d = augment.normalize_cloud(d)
        inp = jnp.asarray(np.concatenate([d["cloud_xyz"], d["cloud_normal"]], -1))[None]

        logits, _ = jax.jit(self.model.apply)({"params": self.params}, inp)
        bins = jnp.argmax(logits.reshape(1, -1, 3, self.n_bins), axis=-1)[0]
        nocs = (bins.astype(jnp.float32) + 0.5) / self.n_bins  # (P,3) in [0,1]

        target = jnp.asarray(cloud_xyz[ids])
        mask = jnp.ones((self.n_pts,), bool)
        best = None
        for i, th in enumerate(thresholds):
            T, ratio, inl = estimate_9d_transform(
                jax.random.fold_in(key, i), nocs - 0.5, target, mask, th,
                max_scale=jnp.array([0.5] * 3), min_scale=jnp.array([0.001] * 3),
            )
            r = float(ratio)
            if best is None or r > best["ratio"]:
                best = {"nocs_pose": np.asarray(T), "ratio": r,
                        "inliers": np.asarray(inl)}
            if r >= min_ratio:
                break
        best["nocs_cloud"] = np.asarray(nocs)
        best["cloud_ids"] = ids
        best["valid"] = best["ratio"] >= min_ratio
        return best


@dataclass
class SegPredicter:
    model: SegNet
    params: dict
    class_name: str = "nut"
    n_pts: int = 20000
    # None -> class-table default.  Set from a calibration artifact
    # (artifacts/<seg>/calib.json, written by scripts/export_ckpts.py from
    # the net's val offset residual) so the bandwidth tracks the CURRENT
    # net's noise floor instead of a hand-tuned constant; pass the
    # reference value (predicter.py:324) explicitly for parity runs.
    bandwidth: float | None = None

    @staticmethod
    def create(params, class_name: str = "nut", voxel_size: float = 0.004,
               grid_dims=(96, 96, 48), n_pts: int = 20000,
               bandwidth: float | None = None):
        return SegPredicter(SegNet(voxel_size=voxel_size, grid_dims=tuple(grid_dims)),
                            params, class_name, n_pts, bandwidth)

    def predict(self, cloud_xyz: np.ndarray, cloud_normal: np.ndarray, rng=None,
                key=None, n_seeds: int = 64, bandwidth_scale: float = 1.0):
        """-> (instance labels (N,), n_instances).  Mirrors
        ``PointGroupPredictor.predict`` (``predicter.py:317-338``): net
        offsets -> MeanShift on shifted points -> per-point labels."""
        rng = rng or np.random.default_rng(0)
        key = key if key is not None else jax.random.PRNGKey(0)
        n = len(cloud_xyz)
        ids = rng.choice(n, self.n_pts, replace=n < self.n_pts)
        xyz = jnp.asarray(cloud_xyz[ids])
        nrm = jnp.asarray(cloud_normal[ids])
        origin = jnp.min(xyz, axis=0) - 0.01

        offsets, objectness = jax.jit(self.model.apply)(
            {"params": self.params}, xyz, nrm, origin)
        shifted = xyz + offsets
        is_obj = jax.nn.sigmoid(objectness) > 0.5
        bw = self.bandwidth or CLUSTER_BANDWIDTH.get(self.class_name, 0.02)
        bw = float(bw) * float(bandwidth_scale)
        labels, modes, n_modes = mean_shift(shifted, bw, mask=is_obj,
                                            n_seeds=n_seeds, key=key)
        # propagate to the full cloud by nearest labeled sample (kNN k=1,
        # predicter.py:334-338)
        lab_s = np.asarray(labels)
        full = np.full(n, -1, np.int32)
        full[ids] = lab_s
        missing = np.where(full == -1)[0]
        if len(missing) and (lab_s >= 0).any():
            src = np.asarray(cloud_xyz[ids])[lab_s >= 0]
            src_lab = lab_s[lab_s >= 0]
            d2 = ((cloud_xyz[missing][:, None] - src[None]) ** 2).sum(-1)
            nn_ = d2.argmin(1)
            near = d2[np.arange(len(missing)), nn_] < 0.01 ** 2
            full[missing[near]] = src_lab[nn_[near]]
        return full, int(n_modes)
