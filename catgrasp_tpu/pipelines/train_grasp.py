"""Train the grasp-quality classifier — TPU ``train_grasp.py``."""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config.loader import load_config
from ..data import packed
from ..data.datasets import GraspDataset
from ..nn.losses import grasp_quality_ce, grasp_quality_ordinal
from ..nn.pointnet import PointNetCls, feature_transform_regularizer
from ..train.trainer import Trainer, create_state


def build(cfg: dict):
    model = PointNetCls(n_out=len(cfg["classes"]) - 1)

    def loss_fn(params, apply_fn, batch, rng):
        logits, trans_feat = apply_fn({"params": params}, batch["x"], train=True,
                                      rngs={"dropout": rng})
        loss = grasp_quality_ce(logits, batch["label"])
        # ordinal aux (cfg ordinal_weight, default 1.0): drives the expected
        # bin toward the label bin — the ranking signal p_G ordering uses
        loss = loss + cfg.get("ordinal_weight", 1.0) * grasp_quality_ordinal(
            logits, batch["label"])
        loss = loss + 1e-3 * feature_transform_regularizer(trans_feat)
        acc = jnp.mean((jnp.argmax(logits, -1) == batch["label"]).astype(jnp.float32))
        return loss, {"acc": acc}

    return model, loss_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--class_name", default="nut")
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--grasp_db", default=None,
                    help="grasp DB npz (unpacked path only)")
    ap.add_argument("--val_root", default=None)
    ap.add_argument("--n_epochs", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--ckpt_dir", default="artifacts/grasp")
    ap.add_argument("--resume", default=None, help="checkpoint to resume from")
    ap.add_argument("--init_params", default=None,
                    help="params-only warm start (e.g. a tracked eval "
                         "export); fresh optimizer — the cross-session "
                         "continuation path since only git survives wipes")
    ap.add_argument("--max_seconds", type=float, default=None,
                    help="wall-clock bound; partial epoch is checkpointed")
    args = ap.parse_args()

    cfg = load_config("config_grasp.yml")
    if args.batch_size:
        cfg["batch_size"] = args.batch_size
    root = args.data_root or f"dataset/{args.class_name}/train"
    if packed.is_packed(root):
        ds = packed.PackedGrasp(root, cfg)
    else:
        db = dict(np.load(args.grasp_db))
        ds = GraspDataset(root, db, cfg)
    val = (packed.PackedGrasp(args.val_root, cfg, phase="val")
           if args.val_root and packed.is_packed(args.val_root) else None)
    print(f"train items: {len(ds)}" + (f", val items: {len(val)}" if val else ""))

    # Natural bin marginal of the TRAIN set.  Training samples uniformly over
    # bins (balance_bins), so the net estimates p(bin|x) under a uniform
    # prior; eval/inference on naturally distributed grasps must reweight by
    # this prior (Bayes: p_nat(bin|x) ∝ p_bal(bin|x)·π(bin)) or CE reads
    # above the marginal entropy even when ranking improves (round-3 finding).
    import json
    classes = np.asarray(cfg["classes"], np.float32)
    tr_scores = np.asarray(ds.score if hasattr(ds, "score")
                           else [k[2] for k in ds.keys], np.float32)
    bins = np.digitize(tr_scores, classes) - 1
    prior = (np.bincount(bins, minlength=len(classes) - 1) + 1.0)
    prior = prior / prior.sum()
    os.makedirs(args.ckpt_dir, exist_ok=True)
    with open(os.path.join(args.ckpt_dir, "prior.json"), "w") as f:
        json.dump({"bin_prior": prior.tolist(), "n": int(len(bins)),
                   "balanced_training": bool(cfg.get("balance_bins", True))}, f)

    model, loss_fn = build(cfg)
    bs = cfg["batch_size"]
    example = jnp.zeros((bs, cfg["n_pts"], cfg.get("input_channel", 6)), jnp.float32)
    state = create_state(model, cfg, example, max(len(ds) // bs, 1))
    start_epoch = 0
    if args.resume:
        from ..train.trainer import load_checkpoint
        state, ep = load_checkpoint(args.resume, state)
        start_epoch = ep + 1
        print(f"resumed from {args.resume} (epoch {ep})")
    elif args.init_params:
        from ..train.trainer import warm_start_params
        state = warm_start_params(args.init_params, state)
        print(f"warm-started params from {args.init_params}")

    trainer = Trainer(model=model, cfg=cfg, loss_fn=loss_fn,
                      train_data=lambda: ds.batches(bs),
                      val_data=(lambda: val.batches(bs, shuffle=False)) if val else None,
                      ckpt_dir=args.ckpt_dir)
    trainer.fit(state, n_epochs=args.n_epochs, max_seconds=args.max_seconds,
                start_epoch=start_epoch)


if __name__ == "__main__":
    main()
