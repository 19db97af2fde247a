"""Batched pile-drop environment — the TPU ``Env`` (``pybullet_env/env.py``).

``reset`` spawns a randomized column of category objects above the bin
(``make_pile``, ``env.py:347-389``), ``settle`` steps physics until the scene
is stable and culls out-of-bin bodies (``simulation_until_stable``,
``env.py:299-344``).  Everything is per-scene pure functions vmapped over a
scene batch B — the reference steps ONE PyBullet world at a time; here one
program steps thousands.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..core import transforms as tf
from . import engine
from .types import SceneParams, SceneState, ShapeLib


@dataclass(frozen=True)
class PileConfig:
    max_bodies: int = 10  # config.yml num_pile_objects: [1,10]
    scale_range: tuple = (0.75, 1.25)  # object_scales (narrower: procedural meshes vary already)
    bin_inner: tuple = (0.3, 0.3, 0.12)
    drop_height: float = 0.06
    drop_spacing: float = 0.035
    dt: float = engine.DT
    settle_chunk: int = 50  # steps per stability check (env.py:299)
    settle_max_chunks: int = 10
    stable_motion: float = 5e-4  # max per-chunk body motion to call it stable


def reset(key: jax.Array, lib: ShapeLib, cfg: PileConfig,
          n_objects: jnp.ndarray | None = None):
    """One scene: (state, params).  vmap over keys for a batch.

    Objects get random shapes, scales, yaw/tilt, and staggered drop heights
    in a jittered grid column over the bin center — the batched analog of
    the reference's sequential drop-and-stabilize pile construction.
    """
    N = cfg.max_bodies
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    shape_id = jax.random.randint(k1, (N,), 0, lib.num_shapes)
    scale = jax.random.uniform(k2, (N,), minval=cfg.scale_range[0], maxval=cfg.scale_range[1])
    params = SceneParams.create(lib, shape_id, scale)

    if n_objects is None:
        n_objects = jax.random.randint(k3, (), 1, N + 1)
    active = jnp.arange(N) < n_objects

    # staggered drop positions: jittered xy, stacked z
    xy = jax.random.uniform(k4, (N, 2), minval=-0.06, maxval=0.06)
    z = cfg.drop_height + jnp.arange(N) * cfg.drop_spacing
    pos = jnp.concatenate([xy, z[:, None]], axis=-1)
    quat = tf.quat_normalize(jax.random.normal(k5, (N, 4)))

    state = SceneState(
        pos=pos, quat=quat,
        linvel=jnp.zeros((N, 3)), angvel=jnp.zeros((N, 3)),
        active=active,
    )
    return state, params


def _cull_out_of_bin(state: SceneState, cfg: PileConfig) -> SceneState:
    """Deactivate bodies that escaped the bin (``env.py:330-343``)."""
    ix, iy, _ = cfg.bin_inner
    inside = (
        (jnp.abs(state.pos[:, 0]) < ix / 2 + 0.05)
        & (jnp.abs(state.pos[:, 1]) < iy / 2 + 0.05)
        & (state.pos[:, 2] > -0.05)
        & (state.pos[:, 2] < 0.5)
    )
    return state.replace(active=state.active & inside)


@partial(jax.jit, static_argnames=("cfg", "narrowphase"))
def step(state: SceneState, params: SceneParams, lib: ShapeLib,
         env: engine.StaticEnv, cfg: PileConfig,
         narrowphase: str = "csg") -> SceneState:
    """One env step — the ``p.stepSimulation`` unit of the reference's
    ``Env`` (``env_base.py``/``env.py``): one physics step plus out-of-bin
    culling.  Pure function of the state pytree: vmap over scenes, jit, or
    scan for rollouts."""
    st = engine.step(state, params, lib, env, dt=cfg.dt, narrowphase=narrowphase)
    return _cull_out_of_bin(st, cfg)


def settle(state: SceneState, params: SceneParams, lib: ShapeLib,
           env: engine.StaticEnv, cfg: PileConfig, narrowphase: str = "csg"):
    """Step in chunks until max body motion per chunk < threshold, with an
    iteration cap; returns (state, n_chunks_used).  The reference's
    ``simulation_until_stable`` with its 50-step motion-accumulation loop."""

    def cond(carry):
        st, prev, i, stable = carry
        return (~stable) & (i < cfg.settle_max_chunks)

    def body(carry):
        st, prev, i, _ = carry
        st = engine.rollout(st, params, lib, env, cfg.settle_chunk, dt=cfg.dt,
                            narrowphase=narrowphase)
        st = _cull_out_of_bin(st, cfg)
        motion = engine.max_body_motion(prev, st)
        return st, st, i + 1, motion < cfg.stable_motion

    st, _, n, _ = jax.lax.while_loop(cond, body, (state, state, 0, False))
    return st, n


def settle_fixed(state: SceneState, params: SceneParams, lib: ShapeLib,
                 env: engine.StaticEnv, cfg: PileConfig, n_steps: int,
                 narrowphase: str = "csg"):
    """Fixed-step settle (fully batched — no data-dependent trip count), for
    throughput paths and cross-scene vmap where while_loop trip counts would
    diverge."""
    st = engine.rollout(state, params, lib, env, n_steps, dt=cfg.dt,
                        narrowphase=narrowphase)
    return _cull_out_of_bin(st, cfg)


# reference-name alias (``env.py:299-344``)
simulation_until_stable = settle


@partial(jax.jit, static_argnames=("cfg",))
def add_duplicate_object_on_pile(key: jax.Array, state: SceneState,
                                 params: SceneParams, shape_id: jnp.ndarray,
                                 scale: jnp.ndarray, n_ob: jnp.ndarray,
                                 cfg: PileConfig, lib: ShapeLib = None):
    """Spawn ``n_ob`` duplicates of one shape at random poses above the bin
    (``env.py:272-295``): activates the first ``n_ob`` inactive body slots
    with uniform xy over the bin, z in [0.05, 0.3], random orientation.
    Returns (state, params); settle afterwards as the reference does.

    Static shapes: the scene's slot count is fixed, so "adding" a body means
    activating a free slot with new shape/scale/pose.
    """
    N = state.pos.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    inactive = ~state.active
    order = jnp.cumsum(inactive.astype(jnp.int32))
    chosen = inactive & (order <= n_ob)

    ix, iy, _ = cfg.bin_inner
    xy = jax.random.uniform(k1, (N, 2), minval=-1.0, maxval=1.0) \
        * jnp.array([ix / 2, iy / 2])
    z = jax.random.uniform(k2, (N,), minval=0.05, maxval=0.3)
    pos = jnp.concatenate([xy, z[:, None]], axis=1)
    quat = tf.quat_normalize(jax.random.normal(k3, (N, 4)))

    state = state.replace(
        pos=jnp.where(chosen[:, None], pos, state.pos),
        quat=jnp.where(chosen[:, None], quat, state.quat),
        linvel=jnp.where(chosen[:, None], 0.0, state.linvel),
        angvel=jnp.where(chosen[:, None], 0.0, state.angvel),
        active=state.active | chosen,
    )
    if lib is not None:
        fresh = SceneParams.create(
            lib, jnp.full((N,), shape_id, jnp.int32),
            jnp.full((N,), scale, jnp.float32))
        params = jax.tree.map(
            lambda new, old: jnp.where(
                chosen.reshape((N,) + (1,) * (old.ndim - 1)), new, old),
            fresh, params)
    return state, params


def make_pile_batch(key: jax.Array, lib: ShapeLib, cfg: PileConfig, batch: int,
                    settle_steps: int = 400):
    """B settled pile scenes in one call: reset + fixed settle, vmapped."""
    keys = jax.random.split(key, batch)
    env = engine.StaticEnv.open_bin(cfg.bin_inner)
    states, params = jax.vmap(lambda k: reset(k, lib, cfg))(keys)
    st = jax.vmap(lambda s, p: settle_fixed(s, p, lib, env, cfg, settle_steps))(states, params)
    return st, params, env
