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


def make_multislice_mesh(n_slices: int, mp: int = 1, devices=None) -> Mesh:
    """Multi-slice mesh: a leading ``slice`` axis (DCN between TPU slices)
    over a per-slice ``(dp, mp)`` ICI mesh.  Batch work shards over
    ``("slice", "dp")`` jointly, so XLA reduces gradients hierarchically —
    all-reduce over ICI inside each slice, then the (much smaller) partial
    over DCN — without any code change in the train step."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % (n_slices * mp) == 0, f"{n} devices !~ {n_slices} slices x mp={mp}"
    arr = np.array(devices).reshape(n_slices, n // (n_slices * mp), mp)
    return Mesh(arr, axis_names=("slice", "dp", "mp"))


def dp_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding (leading dim over all batch-parallel axes:
    dp, plus slice when the mesh is multi-slice)."""
    axes = tuple(a for a in ("slice", "dp") if a in mesh.axis_names)
    return NamedSharding(mesh, P(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree onto the mesh, leading axis over dp."""
    s = dp_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
