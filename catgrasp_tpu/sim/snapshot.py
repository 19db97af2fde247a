"""Scene snapshot / restore.

The reference leans on PyBullet state ids and ``.bullet`` files for
speculative-action rollback (``p.saveState/restoreState`` around every pick,
``run_grasp_simulation.py:336-370``) and rebuilds scenes from ``meta.pkl``
(``Env.restore_from_meta_file``, ``env.py:245-269``).  Here the scene state
is a pytree, so snapshot/restore is exact and free — and any generated
dataset record is itself a restorable scene.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import transforms as tf
from .types import SceneParams, SceneState, ShapeLib


def save_state(state: SceneState) -> SceneState:
    """Host-side exact snapshot (``p.saveState`` analog — but exact and
    O(bytes), no engine round trip)."""
    return jax.tree.map(np.asarray, state)


def restore_state(snapshot: SceneState) -> SceneState:
    """Back onto device (``p.restoreState`` analog)."""
    return jax.tree.map(jnp.asarray, snapshot)


def save_scene_npz(path: str, state: SceneState, params: SceneParams, **extra):
    """Persist a restorable scene record (``.bullet`` / ``meta.pkl`` analog;
    same fields the pile-data generator writes)."""
    quat = np.asarray(state.quat)
    pos = np.asarray(state.pos)
    ob_in_world = np.asarray(
        jax.vmap(tf.pose_from_qt)(jnp.asarray(quat), jnp.asarray(pos)))
    np.savez_compressed(
        path,
        ob_in_world=ob_in_world.astype(np.float32),
        linvel=np.asarray(state.linvel), angvel=np.asarray(state.angvel),
        active=np.asarray(state.active),
        shape_id=np.asarray(params.shape_id), scales=np.asarray(params.scale),
        **extra)


def scene_from_record(record: dict, lib: ShapeLib):
    """Rebuild (state, params) from a saved record / dataset sample
    (``Env.restore_from_meta_file``, ``env.py:245-269``).  Works on both
    snapshot files and ``generate_pile_data`` scene records (which carry
    no velocities — restored at rest, like the reference's stable scenes).
    """
    T = jnp.asarray(record["ob_in_world"], jnp.float32)
    n = T.shape[0]
    quat = jax.vmap(tf.matrix_to_quat)(T[:, :3, :3])
    state = SceneState(
        pos=T[:, :3, 3],
        quat=quat,
        linvel=jnp.asarray(record.get("linvel", np.zeros((n, 3)))),
        angvel=jnp.asarray(record.get("angvel", np.zeros((n, 3)))),
        active=jnp.asarray(record.get("active", np.ones(n, bool))),
    )
    params = SceneParams.create(
        lib, jnp.asarray(record["shape_id"], jnp.int32),
        jnp.asarray(record["scales"], jnp.float32))
    return state, params
