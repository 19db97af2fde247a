"""pjit data-parallel trainer.

Replaces the reference's three identical torch trainers
(``trainer_grasp.py`` / ``trainer_nunocs.py`` / ``trainer_pointgroup.py``):
Adam (or SGD), lr = start_lr/64 × batch_size, MultiStepLR decay ×0.1 at
milestones, per-epoch train/val loops, best-train/best-val checkpointing.

The reference's ``nn.DataParallel`` becomes sharding constraints: params
replicated, batch sharded over the ``dp`` mesh axis; XLA inserts the psum
gradient reduction over ICI.  Checkpoints are orbax-style msgpack pytrees
(flax serialization) carrying params + opt state + epoch, which — unlike
the reference (``SURVEY.md §5``) — makes training resumable.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization
from flax.training import train_state
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.mesh import make_mesh


class TrainState(train_state.TrainState):
    pass


def multistep_lr(start_lr: float, batch_size: int, milestones: list[int],
                 steps_per_epoch: int, gamma: float = 0.1,
                 warmup_steps: int = 0):
    """lr = start_lr/64*batch, ×gamma at each milestone epoch
    (``trainer_grasp.py:36-42``), with an optional linear warmup — the
    reference formula reaches lr≈0.0375 for Adam at batch 240, which our
    GroupNorm nets (no BatchNorm running stats to absorb the shock) need a
    few hundred steps to survive."""
    base = start_lr / 64.0 * batch_size
    bounds = {m * steps_per_epoch: gamma for m in milestones}
    sched = optax.piecewise_constant_schedule(base, bounds)
    if warmup_steps <= 0:
        return sched
    warm = optax.linear_schedule(base * 0.02, base, warmup_steps)
    return optax.join_schedules([warm, sched], [warmup_steps])


def make_optimizer(cfg: dict, steps_per_epoch: int):
    sched = multistep_lr(cfg.get("start_lr", 0.01), cfg.get("batch_size", 32),
                         cfg.get("lr_milestones", []), steps_per_epoch,
                         warmup_steps=cfg.get("warmup_steps", 0))
    wd = cfg.get("weight_decay", 0.0)
    # global-norm clip: the reference's lr formula reaches ~0.04 for Adam at
    # batch 240, which diverges on small datasets; clipping keeps the same
    # schedule stable (reference has none, but it also never resumes or
    # varies dataset size)
    clip = optax.clip_by_global_norm(cfg.get("grad_clip_norm", 1.0))
    if cfg.get("optimizer_type", "adam") == "adam":
        return optax.chain(clip, optax.add_decayed_weights(wd), optax.adam(sched))
    return optax.chain(clip, optax.sgd(sched, momentum=0.9))


def create_state(model, cfg: dict, example_input: jnp.ndarray,
                 steps_per_epoch: int = 100, rng=None) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.get("random_seed", 0))
    variables = model.init(rng, example_input)
    return TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=make_optimizer(cfg, steps_per_epoch),
    )


def make_train_step(loss_fn: Callable, mesh=None, donate: bool = True):
    """Build a jitted (optionally mesh-sharded) train step.

    ``loss_fn(params, apply_fn, batch, rng) -> (loss, aux)``.
    With a mesh, params/opt-state are replicated and the batch is sharded
    over ``dp``; XLA turns the gradient sum into an ICI all-reduce.
    """

    def step(state: TrainState, batch, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.apply_fn, batch, rng
        )
        return state.apply_gradients(grads=grads), loss, aux

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("dp"))
    return jax.jit(
        step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0,) if donate else (),
    )


@dataclass
class Trainer:
    """Generic epoch-loop trainer (skeleton shared by all three nets,
    mirroring ``trainer_grasp.py:44-115``)."""

    model: Any
    cfg: dict
    loss_fn: Callable
    train_data: Callable  # () -> iterator of batches (host numpy pytrees)
    val_data: Callable | None = None
    mesh: Any = None
    ckpt_dir: str = "artifacts"
    best_train: float = field(default=float("inf"))
    best_val: float = field(default=float("inf"))

    def fit(self, state: TrainState, n_epochs: int | None = None,
            log_every: int = 50, verbose: bool = True,
            max_seconds: float | None = None,
            start_epoch: int = 0) -> TrainState:
        """``max_seconds`` bounds wall clock: on expiry the partial epoch is
        scored and checkpointed like a full one, so a bounded run always
        leaves a usable ``best_train.ckpt`` (the reference trainer can only
        be killed externally, losing the epoch in flight).

        ``start_epoch`` continues the epoch numbering of a resumed run (pass
        ``loaded_epoch + 1``); a resumed run always trains at least one
        epoch even if the loaded epoch already reached ``n_epochs``."""
        import time as _time

        from ..utils.metrics import MetricsLogger
        from ..utils import profiling

        n_epochs = n_epochs or self.cfg.get("n_epochs", 1)
        n_epochs = max(n_epochs, start_epoch + 1)
        if max_seconds is None:
            max_seconds = self.cfg.get("max_seconds")
        # val-plateau response (r5, VERDICT r4 #5): the r4e grasp-net run's
        # val loss ROSE from epoch 3 with no lr action — the MultiStepLR
        # milestones assume the reference's 20k-scene dataset and 70-epoch
        # horizon.  With plateau_patience > 0, after that many epochs
        # without a val improvement the trainer reverts to the best_val
        # params and restarts the optimizer at start_lr * plateau_gamma^k
        # (fresh Adam moments — a warm restart at lower lr, the same
        # cross-session continuation semantics as --init_params).
        plateau_patience = int(self.cfg.get("plateau_patience", 0))
        plateau_gamma = float(self.cfg.get("plateau_gamma", 0.3))
        lr_scale, since_best = 1.0, 0
        steps_per_epoch = max(int(self.cfg.get("steps_per_epoch", 100)), 1)
        t_start = _time.monotonic()
        step_fn = make_train_step(self.loss_fn, self.mesh)
        rng = jax.random.PRNGKey(self.cfg.get("random_seed", 0))
        os.makedirs(self.ckpt_dir, exist_ok=True)
        mlog = MetricsLogger(f"{self.ckpt_dir}/metrics.jsonl",
                             run=type(self.model).__name__)
        sw = profiling.Stopwatch()
        expired = False
        for epoch in range(start_epoch, n_epochs):
            loss_sum, loss_n, window = 0.0, 0, []

            def drain():
                nonlocal loss_sum, loss_n
                if window:
                    loss_sum += float(jnp.sum(jnp.stack(window)))
                    loss_n += len(window)
                    window.clear()

            with profiling.trace():  # CATGRASP_TRACE_DIR gates capture
                for i, batch in enumerate(self.train_data()):
                    rng, sub = jax.random.split(rng)
                    batch = jax.tree.map(jnp.asarray, batch)
                    with sw.section("train_step"):
                        state, loss, _ = step_fn(state, batch, sub)
                    # keep the loss ON DEVICE between log intervals: a
                    # per-step float() readback blocks async dispatch (and
                    # costs a round trip on a tunneled runtime).  But the
                    # window must stay BOUNDED — holding every step's
                    # device scalar pins runtime buffers and leaks tens of
                    # GB over an epoch — so drain it at each log interval.
                    window.append(loss)
                    if i % log_every == log_every - 1:
                        if verbose:
                            print(f"epoch {epoch} it {i} loss {float(loss):.4f}",
                                  flush=True)
                        drain()
                        # periodic last.ckpt only under a wall-clock bound:
                        # each save is a full params+opt readback (tens of
                        # MB) that an unbounded run doesn't need every 50
                        # steps
                        if max_seconds is not None:
                            save_checkpoint(f"{self.ckpt_dir}/last.ckpt", state, epoch)
                            if _time.monotonic() - t_start > max_seconds:
                                expired = True
                                break
            drain()
            # once-per-epoch resume point for unbounded runs (the frequent
            # in-loop save above only runs under a wall-clock bound)
            save_checkpoint(f"{self.ckpt_dir}/last.ckpt", state, epoch)
            # epoch-boundary deadline check: an epoch with < log_every
            # batches never reaches the in-loop check, which silently
            # ignored the bound on small datasets (advisor r2, medium)
            if (max_seconds is not None and not expired
                    and _time.monotonic() - t_start > max_seconds):
                expired = True
            train_loss = loss_sum / loss_n if loss_n else float("inf")
            rec = {"epoch": epoch, "train_loss": train_loss}
            if train_loss < self.best_train:
                self.best_train = train_loss
                save_checkpoint(f"{self.ckpt_dir}/best_train.ckpt", state, epoch)
            if self.val_data is not None:
                with sw.section("evaluate"):
                    val_loss = self.evaluate(state)
                rec["val_loss"] = val_loss
                if val_loss < self.best_val:
                    self.best_val = val_loss
                    since_best = 0
                    save_checkpoint(f"{self.ckpt_dir}/best_val.ckpt", state, epoch)
                else:
                    since_best += 1
                    if plateau_patience and since_best >= plateau_patience:
                        lr_scale *= plateau_gamma
                        since_best = 0
                        cfg2 = dict(self.cfg)
                        cfg2["start_lr"] = (self.cfg.get("start_lr", 0.01)
                                            * lr_scale)
                        best_path = f"{self.ckpt_dir}/best_val.ckpt"
                        params = state.params
                        if os.path.exists(best_path):
                            best_state, _ = load_checkpoint(best_path, state)
                            params = best_state.params
                        state = TrainState.create(
                            apply_fn=state.apply_fn, params=params,
                            tx=make_optimizer(cfg2, steps_per_epoch))
                        rec["plateau_restart_lr_scale"] = lr_scale
                        if verbose:
                            print(f"epoch {epoch}: val plateau — reverting "
                                  f"to best_val, lr x{lr_scale:.3g}",
                                  flush=True)
                if verbose:
                    print(f"epoch {epoch}: train {train_loss:.4f} val {val_loss:.4f}")
            mlog.event("epoch", **rec)
            if expired:
                if verbose:
                    print(f"wall-clock bound {max_seconds}s reached at epoch "
                          f"{epoch}; stopping", flush=True)
                break
        mlog.event("timing", **sw.report())
        mlog.close()
        return state

    def evaluate(self, state: TrainState) -> float:
        if not hasattr(self, "_eval_fn"):
            # jitted once: the reference-scale val split (1k scenes) made the
            # unjitted per-batch loss the epoch bottleneck
            self._eval_fn = jax.jit(
                lambda params, batch, rng: self.loss_fn(
                    params, self.model.apply, batch, rng)[0])
        losses = []
        for batch in self.val_data():
            batch = jax.tree.map(jnp.asarray, batch)
            losses.append(self._eval_fn(state.params, batch,
                                        jax.random.PRNGKey(0)))
        return float(jnp.mean(jnp.stack(losses))) if losses else float("inf")


def save_checkpoint(path: str, state: TrainState, epoch: int) -> None:
    """Whole blob is msgpack (flax serialization) — no pickle anywhere, so
    loading an untrusted checkpoint cannot execute code."""
    blob = {
        "params": serialization.to_bytes(state.params),
        "opt_state": serialization.to_bytes(state.opt_state),
        "step": int(state.step),
        "epoch": int(epoch),
    }
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(blob))


def read_checkpoint_blob(path: str) -> dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_checkpoint(path: str, state: TrainState) -> tuple[TrainState, int]:
    blob = read_checkpoint_blob(path)
    if "opt_state" not in blob:
        raise ValueError(
            f"{path} is a params-only eval checkpoint (no opt_state) — it "
            "cannot seed --resume; resume from artifacts/<net>/last.ckpt or "
            "load it for inference via load_params")
    params = serialization.from_bytes(state.params, blob["params"])
    opt_state = serialization.from_bytes(state.opt_state, blob["opt_state"])
    state = state.replace(params=params, opt_state=opt_state, step=blob["step"])
    return state, blob["epoch"]


def warm_start_params(path: str, state: TrainState) -> TrainState:
    """Seed ONLY the params from a checkpoint (full training blob or the
    params-only eval exports in ``artifacts_tracked/``), keeping a fresh
    optimizer.  This is the cross-session continuation path: the VM is wiped
    between sessions and only the tracked params-only exports survive in
    git, so ``--resume`` (which needs opt_state) cannot span sessions."""
    blob = read_checkpoint_blob(path)
    params = serialization.from_bytes(state.params, blob["params"])
    return state.replace(params=params)
