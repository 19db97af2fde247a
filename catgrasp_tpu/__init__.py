"""catgrasp_tpu — TPU-native category-level task-relevant grasping framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of CaTGrasp
(wenbowen123/catgrasp): batched rigid-body simulation, SDF-based collision
and grasp filtering, synthetic data generation with on-device rendering,
and the three perception networks (instance segmentation, NUNOCS, grasp
quality) with pjit data-parallel training.

Layer map (bottom -> top), mirroring SURVEY.md §7:
    core/      transforms, symmetry groups, camera models, sphere sampling
    geom/      meshes, procedural assets, the SDF engine
    kin/       iiwa14 FK + analytic IK, motion planning
    sim/       vmapped rigid-body contact engine + env APIs
    render/    batched SDF-raymarch depth/seg/NOCS renderer
    grasp/     gripper model, samplers, pose filter, quality eval
    nn/        PointNet heads, voxel U-Net, losses, clustering
    data/      dataset generation + readers
    train/     pjit trainers, checkpointing
    predict/   inference wrappers (incl. RANSAC 9D pose fit)
    pipelines/ CLI entry points matching the reference scripts
    parallel/  device mesh / sharding helpers
    native/    C++ runtime components (SDF bake, IO)
"""

import os as _os

import jax as _jax

# The axon TPU plugin registers itself regardless of the JAX_PLATFORMS env
# var (the env-var demotion silently loses to plugin discovery), so a
# "JAX_PLATFORMS=cpu python -m catgrasp_tpu.pipelines..." run would land on
# the TPU and race whatever chain currently holds the single-client tunnel.
# Honor the env var explicitly via the config API, which does win.
if _os.environ.get("JAX_PLATFORMS"):
    _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

# Geometry/physics live on chains of small (3x3 / 4x4) matmuls where bf16
# MXU accumulation visibly corrupts poses; make float32 the framework-wide
# default. NN hot paths opt into bf16 explicitly via dtype arguments.
_jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: the sim/render/filter programs are large and
# the pipelines re-launch them across processes; caching makes every run
# after the first start in seconds.
_cache_dir = _os.environ.get("CATGRASP_TPU_CACHE",
                             _os.path.expanduser("~/.cache/catgrasp_tpu_xla"))
try:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - older jax without the knobs
    pass

__version__ = "0.1.0"

