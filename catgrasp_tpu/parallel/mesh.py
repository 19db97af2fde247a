"""Device mesh / sharding helpers.

The reference's entire parallelism inventory (SURVEY.md §2.3) — DataParallel
over GPUs, multiprocessing over CPUs, OpenMP threads — collapses here into
two mesh axes:

* ``dp``: data parallel — training batches AND simulation scene batches
  shard across chips; gradients reduce over ICI via psum (inserted by XLA
  from sharding constraints).
* ``mp``: model parallel — the wide PointNet/U-Net layers shard their
  feature dimension (tensor parallelism) for the larger models.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, mp: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % mp == 0, f"{n} devices not divisible by mp={mp}"
    arr = np.array(devices).reshape(n // mp, mp)
    return Mesh(arr, axis_names=("dp", "mp"))


def dp_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding (leading dim over dp)."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree onto the mesh, leading axis over dp."""
    s = dp_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
