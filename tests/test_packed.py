"""Packed memmap training data: pack_split over freshly generated scenes,
then batch iteration through all three Packed datasets — the exact path
reference-scale training runs on (``tool.py``'s label passes at scale)."""
import os

import numpy as np
import pytest

from catgrasp_tpu.data import packed
from catgrasp_tpu.pipelines.generate_pile_data import generate_scenes


@pytest.fixture(scope="module")
def packed_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("scenes")
    out = tmp_path_factory.mktemp("packed")
    # enough focal length that each nut covers >100 px (the isolated-cloud
    # pass drops objects with too few pixels, as the reference does)
    cfg = {
        "H": 320, "W": 320, "render_downscale": 1.0,
        "K": [400.0, 0.0, 160.0, 0.0, 400.0, 160.0, 0.0, 0.0, 1.0],
        "dataset": {"num_pile_objects": [1, 4], "object_scales": [0.9, 1.1]},
    }
    generate_scenes("nut", "train", 4, str(root), cfg=cfg, seed=5,
                    settle_steps=120, batch=2)
    # a tiny grasp DB whose poses sit at the first scene's object: grasp
    # labels only need SOME pose within reach of a visible instance
    rng = np.random.default_rng(0)
    poses = np.tile(np.eye(4, dtype=np.float32), (16, 1, 1))
    # approach (grasp x-axis) along -+z in the object frame: settled nuts
    # lie flat, so half of these face the top-down camera
    R_dn = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], np.float32).T
    R_up = np.array([[0, 0, -1], [0, 1, 0], [1, 0, 0]], np.float32).T
    poses[:8, :3, :3] = R_dn
    poses[8:, :3, :3] = R_up
    poses[:, :3, 3] = rng.uniform(-0.02, 0.02, (16, 3)).astype(np.float32)
    # no shape_id key: labels project onto every visible instance
    db = {"grasp_poses": poses,
          "scores": rng.uniform(0, 1, 16).astype(np.float32)}
    meta = packed.pack_split(str(root), str(out), grasp_db=db,
                             nunocs_pts=256, seg_pts=512,
                             grasp_scene_pts=512, log_every=0)
    return str(out), meta


def test_pack_split_meta_and_files(packed_dir):
    out, meta = packed_dir
    assert meta["n_scenes"] == 4
    assert meta["n_seg"] >= 1
    assert meta["n_nunocs"] >= 1  # at least one visible object row
    for f in ("nunocs.bin", "seg.bin", "meta.json"):
        assert os.path.exists(os.path.join(out, f))
    assert packed.is_packed(out)


def test_packed_nunocs_batches(packed_dir):
    out, meta = packed_dir
    cfg = {"n_pts": 128, "dropout_prob": 0.5, "dropout_max_ratio": 0.5,
           "batch_size": 2}
    ds = packed.PackedNunocs(out, cfg)
    assert len(ds) == meta["n_nunocs"]
    b = next(iter(ds.batches(1)))
    assert b["x"].shape == (1, 128, 6)
    assert b["nocs"].shape == (1, 128, 3)
    assert np.isfinite(b["x"]).all()
    # nocs targets live in the unit box
    assert (b["nocs"] >= -1e-3).all() and (b["nocs"] <= 1 + 1e-3).all()


def test_packed_seg_batches(packed_dir):
    out, meta = packed_dir
    cfg = {"n_pts": 256}
    ds = packed.PackedSeg(out, cfg)
    b = next(iter(ds.batches(1)))
    assert b["xyz"].shape == (1, 256, 3)
    assert b["instance_id"].dtype == np.int32
    is_obj = b["instance_id"][0] >= 0
    if is_obj.any():
        # gt offsets point from object points to their instance centroid
        xyz, off, inst = b["xyz"][0], b["offsets"][0], b["instance_id"][0]
        i = int(inst[is_obj][0])
        m = inst == i
        np.testing.assert_allclose((xyz[m] + off[m]).std(axis=0),
                                   0.0, atol=5e-3)


def test_packed_grasp_batches(packed_dir):
    out, meta = packed_dir
    if meta["n_grasp_keys"] < 2:
        pytest.skip("no grasp labels landed in the tiny scenes")
    cfg = {"n_pts": 64, "flip_cloud_prob": 1.0,
           "classes": [0, 0.25, 0.5, 0.75, 1.01]}
    ds = packed.PackedGrasp(out, cfg)
    b = next(iter(ds.batches(2)))
    assert b["x"].shape == (2, 64, 6)
    assert b["label"].min() >= 0 and b["label"].max() <= 3
