"""Sharded simulation rollouts — scenes over the ``dp`` mesh axis.

The framework's scale axis is the env/grasp batch (SURVEY.md §2.3): where
the reference forks one PyBullet process per CPU core, here a batch of
scene pytrees shards its leading axis across chips and the vmapped contact
engine runs under one jit; XLA keeps everything chip-local (no collectives
in the step — scenes are independent), so scaling is linear in chips.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..sim import engine
from .mesh import dp_sharding


def sharded_rollout(mesh: Mesh, states, params, lib, env, n_steps: int,
                    dt: float = engine.DT):
    """Roll a batch of scenes ``n_steps`` forward, batch axis sharded over
    ``dp``.  states/params carry a leading batch axis; lib/env replicate."""
    data_sh = dp_sharding(mesh)
    sh = lambda tree: jax.tree.map(lambda _: data_sh, tree)

    fn = jax.jit(
        jax.vmap(lambda s, p: engine.rollout(s, p, lib, env, n_steps, dt=dt)),
        in_shardings=(sh(states), sh(params)),
        out_shardings=sh(states),
    )
    states = jax.device_put(states, data_sh)
    params = jax.device_put(params, data_sh)
    return fn(states, params)


def sharded_map(mesh: Mesh, fn, *batched_args):
    """Generic dp-sharded vmap: ``fn`` per element, leading axis over the
    mesh.  For perturbation scoring, affordance rollouts, RANSAC fits —
    every 'multiprocessing fan-out' of the reference."""
    data_sh = dp_sharding(mesh)
    sh = lambda tree: jax.tree.map(lambda _: data_sh, tree)
    jitted = jax.jit(jax.vmap(fn), in_shardings=tuple(sh(a) for a in batched_args))
    args = tuple(jax.device_put(a, data_sh) for a in batched_args)
    return jitted(*args)
