"""Artifact loading — pretrained-weights -> predicters.

The reference maps artifact ids to classes and deserializes torch state
dicts inside each predicter (``predicter.py:41-48,101-105,208-212``,
``Utils.py:135-171`` strips ``module.`` prefixes).  Here artifacts are the
trainer's checkpoint blobs under ``artifacts/{nunocs,grasp,seg}/`` and this
module rebuilds each model exactly as its train pipeline does, restores the
params, and returns ready predicters.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import serialization

from ..config.loader import load_config
from ..train.trainer import read_checkpoint_blob
from .predicter import GraspPredicter, NunocsPredicter, SegPredicter


def load_params(path: str, template_params):
    """Restore a params pytree from a trainer checkpoint blob (msgpack)."""
    blob = read_checkpoint_blob(path)
    return serialization.from_bytes(template_params, blob["params"])


def _init_template(model, *args):
    """Param-structure template WITHOUT compiling/running the init program.

    ``model.init`` would jit the whole forward pass just to produce shapes;
    under the axon remote-compile tunnel that costs minutes per net (the
    round-3 eval chain lost its whole hour to exactly this).  ``eval_shape``
    traces abstractly — no compile, no device work — and
    ``serialization.from_bytes`` only needs the pytree STRUCTURE."""
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *args)
    return shapes["params"]


def _ckpt(dir_: str) -> str:
    """Prefer best_val (the reference evaluates on best-val weights);
    ``last.ckpt`` (periodic mid-epoch save) is the final fallback."""
    for name in ("best_val.ckpt", "best_train.ckpt", "last.ckpt"):
        p = os.path.join(dir_, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"no checkpoint in {dir_}")


def load_predicters(artifact_dir: str = "artifacts", class_name: str = "nut",
                    roles=("nocs", "grasp", "seg")) -> dict:
    """Build the predicter dict ``run_grasp_simulation`` consumes.

    Layout: ``{artifact_dir}/nunocs|grasp|seg/best_{val,train}.ckpt``
    (written by the three train pipelines).  Missing roles are skipped so a
    partially-trained setup still runs (oracle fills the gaps).
    """
    out = {}
    if "nocs" in roles:
        d = os.path.join(artifact_dir, "nunocs")
        if os.path.isdir(d):
            cfg = load_config("config_nunocs.yml")
            bins = cfg.get("ce_loss_bins", 100)
            p = NunocsPredicter.create({}, n_bins=bins,
                                       n_pts=cfg.get("n_pts", 2048))
            x = jnp.zeros((1, p.n_pts, cfg.get("input_channel", 6)))
            template = _init_template(p.model, x)
            out["nocs"] = NunocsPredicter(p.model, load_params(_ckpt(d), template),
                                          bins, p.n_pts)
    if "grasp" in roles:
        d = os.path.join(artifact_dir, "grasp")
        if os.path.isdir(d):
            cfg = load_config("config_grasp.yml")
            n_bins = len(cfg["classes"]) - 1
            p = GraspPredicter.create({}, n_bins=n_bins,
                                      n_pts=cfg.get("n_pts", 1024))
            x = jnp.zeros((1, p.n_pts, cfg.get("input_channel", 6)))
            template = _init_template(p.model, x)
            out["grasp"] = GraspPredicter(p.model, load_params(_ckpt(d), template),
                                          p.n_pts)
    if "seg" in roles:
        d = os.path.join(artifact_dir, "seg")
        if os.path.isdir(d):
            cfg = load_config("config_seg.yml")
            p = SegPredicter.create({}, class_name=class_name,
                                    voxel_size=float(cfg.get("voxel_size", 0.004)),
                                    grid_dims=tuple(cfg.get("grid_dims", (96, 96, 48))),
                                    n_pts=cfg.get("n_pts", 20000))
            n = p.n_pts
            args = (jnp.zeros((n, 3)), jnp.zeros((n, 3)), jnp.zeros(3))
            template = _init_template(p.model, *args)
            # MeanShift bandwidth calibrated to THIS net's offset-noise
            # floor (scripts/calibrate_bandwidth.py writes calib.json at
            # export); falls back to the class table in predicter.py
            bandwidth = None
            calib_path = os.path.join(d, "calib.json")
            if os.path.exists(calib_path):
                import json
                with open(calib_path) as f:
                    bandwidth = json.load(f).get("bandwidth")
                print(f"seg: calibrated MeanShift bandwidth {bandwidth}")
            out["seg"] = SegPredicter(p.model, load_params(_ckpt(d), template),
                                      class_name, n, bandwidth)
    return out
