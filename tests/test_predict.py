import jax
import jax.numpy as jnp
import numpy as np
import pytest

from catgrasp_tpu.predict.ransac import estimate_9d_transform


def test_ransac_recovers_similarity(rng):
    """Known R, anisotropic scale, t must be recovered from noisy pairs."""
    n = 256
    src = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    ang = 0.7
    R = np.array([[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    s = np.array([0.02, 0.03, 0.025], np.float32)
    t = np.array([0.1, -0.05, 0.4], np.float32)
    tgt = (src * s) @ R.T + t + rng.normal(0, 2e-4, (n, 3)).astype(np.float32)

    T, ratio, inl = estimate_9d_transform(
        jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(tgt),
        jnp.ones(n, bool), pass_threshold=0.002,
        max_scale=jnp.array([0.5] * 3), min_scale=jnp.array([0.001] * 3),
        max_iter=256,
    )
    assert float(ratio) > 0.9
    M = np.asarray(T)[:3, :3]
    scales = np.linalg.norm(M, axis=0)
    np.testing.assert_allclose(scales, s, rtol=0.1)
    R_rec = M / scales
    np.testing.assert_allclose(R_rec, R, atol=0.05)
    np.testing.assert_allclose(np.asarray(T)[:3, 3], t, atol=0.003)


def test_ransac_rejects_outliers(rng):
    n = 200
    src = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    s = 0.02
    tgt = src * s + np.array([0.1, 0.0, 0.3], np.float32)
    # corrupt 40% of pairs
    bad = rng.choice(n, 80, replace=False)
    tgt[bad] += rng.uniform(-0.05, 0.05, (80, 3)).astype(np.float32)

    T, ratio, inl = estimate_9d_transform(
        jax.random.PRNGKey(1), jnp.asarray(src), jnp.asarray(tgt),
        jnp.ones(n, bool), pass_threshold=0.001,
        max_scale=jnp.array([0.5] * 3), min_scale=jnp.array([0.001] * 3),
        max_iter=512,
    )
    assert 0.4 < float(ratio) <= 0.72
    scales = np.linalg.norm(np.asarray(T)[:3, :3], axis=0)
    np.testing.assert_allclose(scales, s, rtol=0.1)


def test_seg_predicter_end_to_end(rng):
    """Untrained SegNet + MeanShift must still produce valid label output
    shape/range on a synthetic two-cluster scene."""
    from catgrasp_tpu.predict.predicter import SegPredicter
    from catgrasp_tpu.nn.voxelnet import SegNet

    model = SegNet(base=8, voxel_size=0.01, grid_dims=(16, 16, 8))
    xyz = np.concatenate([
        rng.normal(0, 0.005, (128, 3)) + [0.04, 0.04, 0.02],
        rng.normal(0, 0.005, (128, 3)) + [0.1, 0.1, 0.02],
    ]).astype(np.float32)
    nrm = np.tile(np.array([0, 0, 1.0], np.float32), (256, 1))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(xyz), jnp.asarray(nrm),
                        jnp.zeros(3))["params"]
    pred = SegPredicter(model, params, "nut", n_pts=256)
    labels, n_inst = pred.predict(xyz, nrm)
    assert labels.shape == (256,)
    assert n_inst >= 1


def test_mean_shift_at_reference_scene_scale():
    """20k shifted points, 8 touching instances (the reference's densest
    scenes): MeanShift must recover every instance, not collapse to one
    cluster (round-1 failure mode was a single mode)."""
    import numpy as np
    from catgrasp_tpu.nn.cluster import mean_shift

    rng = np.random.default_rng(3)
    n_inst, n_pts = 8, 20000
    # nut-pile geometry: centers ~3-4 cm apart, shifted points = center + eps
    centers = np.array([[0.04 * (i % 4) - 0.06, 0.035 * (i // 4) - 0.02, 0.02]
                        for i in range(n_inst)])
    inst = rng.integers(0, n_inst, n_pts)
    shifted = centers[inst] + rng.normal(scale=0.004, size=(n_pts, 3))
    labels, _, n_modes = mean_shift(jnp.asarray(shifted.astype(np.float32)),
                                    0.015, n_iter=12, n_seeds=128)
    labels = np.asarray(labels)
    assert int(n_modes) == n_inst
    # every predicted cluster maps to exactly one true instance (purity)
    for m in np.unique(labels):
        true = inst[labels == m]
        purity = np.bincount(true).max() / len(true)
        assert purity > 0.95, (m, purity)
