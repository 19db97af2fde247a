"""Train the NUNOCS coordinate net — TPU ``train_nunocs.py``.

Same schedule semantics as the reference (``config_nunocs.yml`` /
``trainer_nunocs.py``): Adam, lr = 0.01/64 x batch, MultiStepLR, per-epoch
best-train/val checkpoints — but pjit data-parallel over the device mesh
instead of ``nn.DataParallel``.
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from ..config.loader import load_config
from ..core.symmetry import get_symmetry_tfs
from ..data import packed
from ..data.datasets import NunocsDataset
from ..nn.losses import nocs_min_symmetry_ce
from ..nn.pointnet import PointNetSeg
from ..train.trainer import Trainer, create_state


def build(cfg: dict, class_name: str, mesh=None):
    bins = cfg.get("ce_loss_bins", 100)
    model = PointNetSeg(n_out=3 * bins)
    sym = jnp.asarray(get_symmetry_tfs(class_name))

    def loss_fn(params, apply_fn, batch, rng):
        logits, trans_feat = apply_fn({"params": params}, batch["x"])
        loss = nocs_min_symmetry_ce(logits, batch["nocs"], sym, bins)
        return loss, {}

    return model, loss_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--class_name", default="nut")
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--val_root", default=None)
    ap.add_argument("--n_epochs", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--ckpt_dir", default="artifacts/nunocs")
    ap.add_argument("--resume", default=None, help="checkpoint to resume from")
    ap.add_argument("--init_params", default=None,
                    help="params-only warm start (e.g. a tracked eval "
                         "export); fresh optimizer — the cross-session "
                         "continuation path since only git survives wipes")
    ap.add_argument("--max_seconds", type=float, default=None,
                    help="wall-clock bound; partial epoch is checkpointed")
    args = ap.parse_args()

    cfg = load_config("config_nunocs.yml")
    if args.batch_size:
        cfg["batch_size"] = args.batch_size
    root = args.data_root or f"dataset/{args.class_name}/train"
    # packed memmap rows (pack_training_data pipeline) when available —
    # required at reference scale (20k scenes)
    ds = (packed.PackedNunocs(root, cfg) if packed.is_packed(root)
          else NunocsDataset(root, cfg))
    val = None
    if args.val_root:
        val = (packed.PackedNunocs(args.val_root, cfg, phase="val")
               if packed.is_packed(args.val_root)
               else NunocsDataset(args.val_root, cfg, phase="val"))
    print(f"train items: {len(ds)}" + (f", val items: {len(val)}" if val else ""))

    model, loss_fn = build(cfg, args.class_name)
    bs = cfg["batch_size"]
    example = jnp.zeros((bs, cfg["n_pts"], cfg.get("input_channel", 6)), jnp.float32)
    steps = max(len(ds) // bs, 1)
    state = create_state(model, cfg, example, steps)
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

    trainer = Trainer(
        model=model, cfg=cfg, loss_fn=loss_fn,
        train_data=lambda: ds.batches(bs),
        val_data=(lambda: val.batches(bs, shuffle=False)) if val else None,
        ckpt_dir=args.ckpt_dir,
    )
    trainer.fit(state, n_epochs=args.n_epochs, max_seconds=args.max_seconds,
                start_epoch=start_epoch)


if __name__ == "__main__":
    main()
