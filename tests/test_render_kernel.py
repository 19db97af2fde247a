"""Pallas march kernel vs the XLA lax.scan march — same scene, same images.

The kernel (ops/render_march.py) must reproduce the XLA renderer's depth and
segmentation to float tolerance: identical SDF math, identical step rule;
the only legal divergences are the per-tile body culling (conservative, so
hits are unaffected) and f32 associativity.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from catgrasp_tpu.geom import csg as csglib, primitives as prim
from catgrasp_tpu.render import raymarch
from catgrasp_tpu.sim import engine
from catgrasp_tpu.sim.types import SceneParams, SceneState, build_shape_lib


def _pile_scene():
    """3 bodies (nut/screw/hnm) at scattered poses + bin env."""
    meshes = [prim.make_instance(c, "train", 0) for c in ("nut", "screw", "hnm")]
    csgs = [csglib.make_csg_instance(c, "train", 0) for c in ("nut", "screw", "hnm")]
    lib = build_shape_lib(meshes, csgs, n_surf=32)
    shape_id = jnp.arange(3, dtype=jnp.int32)
    scale = jnp.array([1.0, 1.1, 0.9], jnp.float32)
    params = SceneParams.create(lib, shape_id, scale)
    qs = jnp.array([[1.0, 0, 0, 0],
                    [0.9238795, 0.3826834, 0, 0],
                    [0.9238795, 0, 0.3826834, 0]], jnp.float32)
    state = SceneState(
        pos=jnp.array([[0.0, 0.0, 0.02], [0.04, 0.02, 0.03], [-0.04, -0.03, 0.025]]),
        quat=qs,
        linvel=jnp.zeros((3, 3)), angvel=jnp.zeros((3, 3)),
        active=jnp.ones((3,), bool),
    )
    env = engine.StaticEnv.open_bin((0.18, 0.18, 0.08))
    return lib, state, params, env


def _cam(z=0.3):
    cam = np.eye(4, dtype=np.float32)
    cam[:3, :3] = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32)
    cam[:3, 3] = [0, 0, z]
    return jnp.asarray(cam)


def _render_pair(H, W, env, with_env=True, inactive=None):
    lib, state, params, env_b = _pile_scene()
    if inactive is not None:
        state = state.replace(active=state.active.at[inactive].set(False))
    K = jnp.array([[150.0, 0, W / 2], [0, 150.0, H / 2], [0, 0, 1.0]])
    os.environ["CATGRASP_PALLAS_RENDER"] = "0"
    ref = raymarch.render(lib, state, params, K, _cam(), H, W,
                          env=env_b if env else None, with_env=with_env)
    os.environ["CATGRASP_PALLAS_RENDER"] = "1"  # interpret=True off-TPU
    try:
        out = raymarch.render(lib, state, params, K, _cam(), H, W,
                              env=env_b if env else None, with_env=with_env)
    finally:
        del os.environ["CATGRASP_PALLAS_RENDER"]
    return ref, out


def _assert_match(ref, out):
    seg_r = np.asarray(ref["seg"])
    seg_o = np.asarray(out["seg"])
    # segmentation: identical up to rare boundary-pixel flips
    frac = (seg_r == seg_o).mean()
    assert frac > 0.995, f"seg mismatch on {(1-frac)*100:.2f}% of pixels"
    both = (seg_r == seg_o) & (seg_r != -1)
    d_r = np.asarray(ref["depth"])[both]
    d_o = np.asarray(out["depth"])[both]
    np.testing.assert_allclose(d_o, d_r, atol=2e-3)
    # every body visible in ref is visible in out (culling is conservative)
    assert set(np.unique(seg_r)) == set(np.unique(seg_o))


def test_march_kernel_matches_xla_with_env():
    # W=128 keeps tiles lane-aligned; H=32 -> P=4096 = 4 tiles
    ref, out = _render_pair(32, 128, env=True)
    assert (np.asarray(ref["seg"]) >= 0).sum() > 100
    _assert_match(ref, out)


def test_march_kernel_matches_xla_no_env():
    ref, out = _render_pair(32, 128, env=False, with_env=False)
    _assert_match(ref, out)


def test_march_kernel_ragged_tile_padding():
    # W=96 -> P=3072, not a multiple of 1024: exercises the pad path
    ref, out = _render_pair(32, 96, env=True)
    _assert_match(ref, out)


def test_march_kernel_respects_active_mask():
    ref, out = _render_pair(32, 128, env=True, inactive=1)
    assert 1 not in np.unique(np.asarray(out["seg"]))
    _assert_match(ref, out)


def test_march_kernel_under_vmap_batch():
    """render_batch (jax.vmap over the whole renderer) must batch the
    pallas_call correctly — the bench/datagen path once the kernel is the
    TPU default."""
    import jax
    lib, state, params, env_b = _pile_scene()
    B = 3
    states = jax.tree.map(lambda x: jnp.stack([x] * B), state)
    # vary poses across the batch so batching bugs can't hide
    states = states.replace(pos=states.pos + jnp.linspace(
        0, 0.01, B)[:, None, None])
    paramsb = jax.tree.map(lambda x: jnp.stack([x] * B), params)
    H, W = 32, 128
    K = jnp.array([[150.0, 0, W / 2], [0, 150.0, H / 2], [0, 0, 1.0]])
    os.environ["CATGRASP_PALLAS_RENDER"] = "0"
    ref = raymarch.render_batch(lib, states, paramsb, K, _cam(), H, W,
                                env=env_b)
    os.environ["CATGRASP_PALLAS_RENDER"] = "1"
    try:
        out = raymarch.render_batch(lib, states, paramsb, K, _cam(), H, W,
                                    env=env_b)
    finally:
        del os.environ["CATGRASP_PALLAS_RENDER"]
    for b in range(B):
        _assert_match(jax.tree.map(lambda x: x[b], ref),
                      jax.tree.map(lambda x: x[b], out))
