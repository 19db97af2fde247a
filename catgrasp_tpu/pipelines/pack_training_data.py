"""Pack scene records into memmap training rows — ``tool.py`` at scale.

The reference runs six sequential label passes over every rendered scene
(``tool.py:421-439``); our renderer already emits the labels, so the one
remaining scale problem is IO: training can't decompress 20k npz archives
per epoch.  This pipeline runs once per split and writes fixed-shape
binary rows (`data/packed.py`) that the trainers memmap.

    python -m catgrasp_tpu.pipelines.pack_training_data --class_name nut \
        --split train
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from ..data import packed


def load_grasp_dbs(class_name: str, split: str = "train"):
    """Per-instance balanced grasp DBs with shape_id matching."""
    dbs = []
    for f in sorted(glob.glob(f"dataset/grasps/{class_name}_{split}_*_balanced_grasp.npz")):
        db = dict(np.load(f, allow_pickle=True))
        db["shape_id"] = int(db["index"])
        dbs.append(db)
    return dbs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--class_name", default="nut")
    ap.add_argument("--split", default="train")
    ap.add_argument("--root", default=None)
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    root = args.root or f"dataset/{args.class_name}/{args.split}"
    out = args.out_dir or f"dataset/{args.class_name}/packed_{args.split}"
    dbs = load_grasp_dbs(args.class_name)
    print(f"packing {root} -> {out} ({len(dbs)} grasp DBs)")
    meta = packed.pack_split(root, out, grasp_db=dbs, seed=args.seed)
    print(meta)


if __name__ == "__main__":
    main()
