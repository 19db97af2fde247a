import jax
import jax.numpy as jnp
import numpy as np
import pytest

from catgrasp_tpu.core.symmetry import get_symmetry_tfs
from catgrasp_tpu.nn.cluster import connected_components, mean_shift, segment_mean
from catgrasp_tpu.nn.losses import grasp_quality_ce, nocs_min_symmetry_ce, offset_loss
from catgrasp_tpu.nn.pointnet import PointNetCls, PointNetSeg
from catgrasp_tpu.nn.voxelnet import SegNet, voxelize


def test_pointnet_cls_forward():
    model = PointNetCls(n_out=10)
    x = jnp.zeros((2, 128, 6))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    logits, trans_feat = model.apply({"params": params}, x)
    assert logits.shape == (2, 10)
    assert trans_feat.shape == (2, 64, 64)


def test_pointnet_seg_forward():
    model = PointNetSeg(n_out=300)
    x = jnp.zeros((2, 128, 6))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    logits, _ = model.apply({"params": params}, x)
    assert logits.shape == (2, 128, 300)


def test_nocs_loss_symmetry_invariance(rng):
    """Loss must be (nearly) unchanged when the target is replaced by a
    symmetry-transformed copy — the whole point of min-symmetry CE."""
    sym = jnp.asarray(get_symmetry_tfs("nut"))
    B, N, bins = 2, 64, 100
    target = jnp.asarray(rng.uniform(0.2, 0.8, (B, N, 3)).astype(np.float32))
    logits = jnp.asarray(rng.normal(size=(B, N, 3 * bins)).astype(np.float32))
    l1 = nocs_min_symmetry_ce(logits, target, sym, bins)
    # rotate target by a symmetry member
    R = sym[3, :3, :3]
    t2 = jnp.einsum("ij,bnj->bni", R, target - 0.5) + 0.5
    l2 = nocs_min_symmetry_ce(logits, t2, sym, bins)
    np.testing.assert_allclose(float(l1), float(l2), atol=0.05)


def test_nocs_loss_learns_target():
    """Perfect logits at the target bins minimize the loss."""
    sym = jnp.asarray(get_symmetry_tfs("hnm"))
    bins = 10
    target = jnp.full((1, 16, 3), 0.55)
    tgt_bin = int(0.55 * bins)
    logits = jnp.full((1, 16, 3, bins), -10.0).at[..., tgt_bin].set(10.0).reshape(1, 16, -1)
    good = float(nocs_min_symmetry_ce(logits, target, sym, bins))
    bad = float(nocs_min_symmetry_ce(jnp.zeros_like(logits), target, sym, bins))
    assert good < 0.1 < bad


def test_voxelize_mean_pool():
    xyz = jnp.array([[0.001, 0.001, 0.001], [0.0015, 0.0015, 0.0015], [0.009, 0.009, 0.009]])
    feats = jnp.array([[1.0], [3.0], [5.0]])
    grid, flat = voxelize(xyz, feats, jnp.zeros(3), 0.004, (4, 4, 4))
    assert grid.shape == (4, 4, 4, 2)
    np.testing.assert_allclose(grid[0, 0, 0, 0], 2.0)  # mean of 1 and 3
    np.testing.assert_allclose(grid[2, 2, 2, 0], 5.0)
    assert int(flat[0]) == int(flat[1]) != int(flat[2])


def test_segnet_forward():
    model = SegNet(base=8, voxel_size=0.01, grid_dims=(16, 16, 8))
    xyz = jax.random.uniform(jax.random.PRNGKey(0), (256, 3)) * 0.1
    nrm = jnp.ones((256, 3)) / np.sqrt(3)
    params = model.init(jax.random.PRNGKey(1), xyz, nrm, jnp.zeros(3))["params"]
    offsets, obj = model.apply({"params": params}, xyz, nrm, jnp.zeros(3))
    assert offsets.shape == (256, 3)
    assert obj.shape == (256,)


def test_mean_shift_separates_blobs(rng):
    a = rng.normal(0, 0.002, (64, 3)) + np.array([0, 0, 0])
    b = rng.normal(0, 0.002, (64, 3)) + np.array([0.1, 0, 0])
    pts = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
    labels, _, n_modes = mean_shift(pts, bandwidth=0.02, n_seeds=32)
    l = np.asarray(labels)
    assert int(n_modes) == 2
    assert len(np.unique(l[:64])) == 1
    assert len(np.unique(l[64:])) == 1
    assert l[0] != l[64]


def test_connected_components(rng):
    a = rng.normal(0, 0.002, (32, 3))
    b = rng.normal(0, 0.002, (32, 3)) + np.array([0.5, 0, 0])
    pts = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
    labels = np.asarray(connected_components(pts, radius=0.02))
    assert len(np.unique(labels[:32])) == 1
    assert len(np.unique(labels[32:])) == 1
    assert labels[0] != labels[32]


def test_segment_mean():
    v = jnp.array([[1.0, 0], [3.0, 0], [10.0, 2]])
    lab = jnp.array([0, 0, 1])
    m = segment_mean(v, lab, 2)
    np.testing.assert_allclose(np.asarray(m), [[2.0, 0], [10.0, 2.0]])


def test_segment_min_max():
    from catgrasp_tpu.nn.cluster import segment_max, segment_min
    v = jnp.array([4.0, -1.0, 7.0, 2.0, 5.0])
    lab = jnp.array([0, 0, 1, 1, -1])  # -1 = unlabeled, excluded
    np.testing.assert_allclose(np.asarray(segment_min(v, lab, 2)), [-1.0, 2.0])
    np.testing.assert_allclose(np.asarray(segment_max(v, lab, 2)), [4.0, 7.0])


def test_offset_loss_masked():
    pred = jnp.ones((8, 3))
    gt = jnp.ones((8, 3))
    valid = jnp.ones(8, bool)
    assert float(offset_loss(pred, gt, valid)) < 1e-6
    # garbage on masked-out points must not contribute
    pred2 = pred.at[0].set(100.0)
    valid2 = valid.at[0].set(False)
    assert float(offset_loss(pred2, gt, valid2)) < 1e-6


def test_grasp_quality_ordinal_ranks_distance():
    """Ordinal aux must grow with bin distance (CE is distance-blind)."""
    from catgrasp_tpu.nn.losses import grasp_quality_ordinal
    import jax.numpy as jnp
    lab = jnp.array([0])
    near = jnp.zeros((1, 10)).at[0, 1].set(8.0)   # predicts bin 1
    far = jnp.zeros((1, 10)).at[0, 9].set(8.0)    # predicts bin 9
    exact = jnp.zeros((1, 10)).at[0, 0].set(8.0)  # predicts bin 0
    l_exact = float(grasp_quality_ordinal(exact, lab))
    l_near = float(grasp_quality_ordinal(near, lab))
    l_far = float(grasp_quality_ordinal(far, lab))
    assert l_exact < l_near < l_far
    ce_near = float(__import__("optax").softmax_cross_entropy_with_integer_labels(near, lab).mean())
    ce_far = float(__import__("optax").softmax_cross_entropy_with_integer_labels(far, lab).mean())
    assert abs(ce_near - ce_far) < 1e-5  # CE really is distance-blind here
