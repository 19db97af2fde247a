"""Trainer: fit loop, checkpointing, RESUME (the capability the reference
lacks — SURVEY.md §5 'no resume path'), and metrics emission."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from catgrasp_tpu.nn.pointnet import PointNetCls
from catgrasp_tpu.train import trainer as T


def _data(n_batches=3, b=4, n=64):
    rng = np.random.default_rng(0)
    batches = [{"x": rng.normal(size=(b, n, 6)).astype(np.float32),
                "y": rng.integers(0, 10, b)} for _ in range(n_batches)]
    return lambda: iter(batches)


def _loss(params, apply_fn, batch, rng):
    logits, _ = apply_fn({"params": params}, batch["x"])
    ce = -jax.nn.log_softmax(logits)[jnp.arange(len(batch["y"])), batch["y"]]
    return jnp.mean(ce), {}


def _make(tmp_path):
    model = PointNetCls(n_out=10)
    cfg = {"n_epochs": 2, "start_lr": 0.01, "batch_size": 4,
           "lr_milestones": [], "random_seed": 0}
    x0 = jnp.zeros((4, 64, 6))
    state = T.create_state(model, cfg, x0)
    tr = T.Trainer(model=model, cfg=cfg, loss_fn=_loss, train_data=_data(),
                   val_data=_data(2), ckpt_dir=str(tmp_path))
    return tr, state


def test_fit_improves_and_checkpoints(tmp_path):
    tr, state = _make(tmp_path)
    s0_loss = tr.evaluate(state)
    state = tr.fit(state, verbose=False)
    assert tr.evaluate(state) < s0_loss
    assert os.path.exists(tmp_path / "best_train.ckpt")
    assert os.path.exists(tmp_path / "best_val.ckpt")
    # metrics JSONL written next to ckpts with epoch events
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert sum(1 for l in lines if l["kind"] == "epoch") == 2
    assert all("train_loss" in l for l in lines if l["kind"] == "epoch")


def test_resume_roundtrip(tmp_path):
    tr, state = _make(tmp_path)
    state = tr.fit(state, verbose=False)
    # fresh state, restore: params/opt_state/step come back exactly
    _, fresh = _make(tmp_path)
    restored, epoch = T.load_checkpoint(str(tmp_path / "best_train.ckpt"), fresh)
    assert int(restored.step) > 0
    assert epoch >= 0
    l_trained = tr.evaluate(state)
    l_restored = tr.evaluate(restored)
    assert abs(l_trained - l_restored) < 1e-6 or l_restored < l_trained + 1e-4
    # resumed training continues without error and optimizer state is live
    out = tr.fit(restored, n_epochs=1, verbose=False)
    assert int(out.step) > int(restored.step)


def test_max_seconds_bound_checkpoints_partial_epoch(tmp_path):
    # many batches + max_seconds=0: the bound trips at the FIRST log
    # interval, yet best_train.ckpt and last.ckpt exist and only one
    # (partial) epoch event is logged
    tr, state = _make(tmp_path)
    tr.train_data = _data(n_batches=8)
    out = tr.fit(state, n_epochs=5, log_every=2, verbose=False,
                 max_seconds=0.0)
    assert os.path.exists(tmp_path / "best_train.ckpt")
    assert os.path.exists(tmp_path / "last.ckpt")
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    epochs = [l for l in lines if l["kind"] == "epoch"]
    assert len(epochs) == 1  # stopped inside epoch 0
    assert int(out.step) == 2  # exactly one log interval of steps ran


def test_val_plateau_reverts_to_best_and_decays_lr(tmp_path):
    """r5 (VERDICT r4 #5): with plateau_patience set, epochs without a val
    improvement trigger a revert-to-best_val warm restart at a decayed lr,
    recorded in the metrics JSONL."""
    model = PointNetCls(n_out=10)
    # lr 0 => train/val losses are CONSTANT => every epoch after the first
    # is a plateau epoch; patience 1 => a restart on every later epoch
    cfg = {"n_epochs": 4, "start_lr": 0.0, "batch_size": 4,
           "lr_milestones": [], "random_seed": 0,
           "plateau_patience": 1, "plateau_gamma": 0.5}
    x0 = jnp.zeros((4, 64, 6))
    state = T.create_state(model, cfg, x0)
    tr = T.Trainer(model=model, cfg=cfg, loss_fn=_loss, train_data=_data(),
                   val_data=_data(2), ckpt_dir=str(tmp_path))
    state = tr.fit(state, verbose=False)
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    scales = [l["plateau_restart_lr_scale"] for l in lines
              if l["kind"] == "epoch" and "plateau_restart_lr_scale" in l]
    assert scales, "no plateau restart recorded"
    # geometric decay: each recorded restart halves the scale again
    assert scales == [0.5 ** (i + 1) for i in range(len(scales))]
