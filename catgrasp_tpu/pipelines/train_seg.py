"""Train the instance-segmentation net — TPU ``train_pointgroup.py``."""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import optax

from ..config.loader import load_config
from ..data import packed
from ..data.datasets import SegDataset
from ..nn.losses import offset_loss
from ..nn.voxelnet import SegNet
from ..train.trainer import Trainer, create_state


def build(cfg: dict):
    model = SegNet(voxel_size=float(cfg.get("voxel_size", 0.004)),
                   grid_dims=tuple(cfg.get("grid_dims", (96, 96, 48))))

    def loss_fn(params, apply_fn, batch, rng):
        def per_scene(xyz, nrm, inst, gt_off):
            origin = jnp.min(xyz, axis=0) - 0.01
            offsets, objness = apply_fn({"params": params}, xyz, nrm, origin)
            is_obj = inst >= 0
            l_off = offset_loss(offsets, gt_off, is_obj)
            # class-balanced BCE: object points are a few % of a scene cloud
            # (bin/floor dominate) — unweighted BCE converges to all-negative
            y = is_obj.astype(jnp.float32)
            pos = jnp.maximum(y.sum(), 1.0)
            neg = jnp.maximum((1 - y).sum(), 1.0)
            bce = optax.sigmoid_binary_cross_entropy(objness, y)
            w = jnp.where(is_obj, neg / pos, 1.0)
            l_obj = jnp.sum(bce * w) / jnp.sum(w)
            return l_off + l_obj

        losses = jax.vmap(per_scene)(batch["xyz"], batch["normal"],
                                     batch["instance_id"], batch["offsets"])
        return losses.mean(), {}

    return model, loss_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--class_name", default="nut")
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--val_root", default=None,
                    help="packed val split for per-epoch val loss/best_val")
    ap.add_argument("--n_epochs", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--ckpt_dir", default="artifacts/seg")
    ap.add_argument("--resume", default=None, help="checkpoint to resume from")
    ap.add_argument("--init_params", default=None,
                    help="params-only warm start (e.g. a tracked eval "
                         "export); fresh optimizer — the cross-session "
                         "continuation path since only git survives wipes")
    ap.add_argument("--max_seconds", type=float, default=None,
                    help="wall-clock bound; partial epoch is checkpointed")
    args = ap.parse_args()

    cfg = load_config("config_seg.yml")
    cfg["batch_size"] = args.batch_size
    root = args.data_root or f"dataset/{args.class_name}/train"
    ds = (packed.PackedSeg(root, cfg) if packed.is_packed(root)
          else SegDataset(root, cfg))
    val = (packed.PackedSeg(args.val_root, cfg)
           if args.val_root and packed.is_packed(args.val_root) else None)
    print(f"train scenes: {len(ds)}" + (f", val: {len(val)}" if val else ""))

    model, loss_fn = build(cfg)
    n_pts = cfg.get("n_pts", 20000)
    rng = jax.random.PRNGKey(0)
    example = (jax.random.uniform(rng, (n_pts, 3)) * 0.2,
               jnp.ones((n_pts, 3)), jnp.zeros(3))
    variables = model.init(rng, *example)
    from ..train.trainer import TrainState, make_optimizer
    state = TrainState.create(apply_fn=model.apply, params=variables["params"],
                              tx=make_optimizer(cfg, max(len(ds) // args.batch_size, 1)))
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
                      train_data=lambda: ds.batches(args.batch_size),
                      val_data=((lambda: val.batches(args.batch_size,
                                                     shuffle=False))
                                if val else None),
                      ckpt_dir=args.ckpt_dir)
    trainer.fit(state, n_epochs=args.n_epochs, max_seconds=args.max_seconds,
                start_epoch=start_epoch)


if __name__ == "__main__":
    main()
