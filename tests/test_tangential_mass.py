"""Quantify the K_t / K_n tangential-mass ratio on real inertias.

History: rounds 1-4 sized friction impulses with the normal-direction
effective mass (VERDICT r2 weak #7); this test pinned the distribution
that approximation was accepted under (median ~1, tails to ~25x on the
screw).  In round 5 ``sim/engine.py`` switched to the EXACT per-iteration
K_t (the r5 motor-backed grip friction lifted the mu*jn cone clamp that
had kept the mis-sizing harmless, and the overshoot ejected held objects),
matching PyBullet's per-direction Schur complement
(btSequentialImpulseConstraintSolver).  The distribution below remains the
record of WHY exactness matters (the tails), and still bounds the error of
the fused Pallas pile kernel (ops/fused_rollout.py), which keeps the
approximation — it has no grip colliders, so its cone clamp still bounds
the error.
"""
import numpy as np
import pytest

from catgrasp_tpu.geom import primitives as prim
from catgrasp_tpu.geom.csg import make_csg_instance
from catgrasp_tpu.sim.types import SceneParams, build_shape_lib


@pytest.fixture(scope="module")
def params_and_meshes():
    specs = [("nut", 0), ("screw", 0), ("hnm", 0)]
    meshes = [prim.make_instance(c, "train", i) for c, i in specs]
    csgs = [make_csg_instance(c, "train", i) for c, i in specs]
    lib = build_shape_lib(meshes, csgs, n_surf=32)
    import jax.numpy as jnp
    return SceneParams.create(lib, jnp.arange(3)), meshes


def _ratios(inv_m, inv_I_diag, rad, rng, n=4000):
    Ii = np.diag(inv_I_diag)
    out = []
    for _ in range(n):
        r = rng.normal(size=3)
        r = r / np.linalg.norm(r) * rng.uniform(0.2, 1.0) * rad
        nv = rng.normal(size=3)
        nv /= np.linalg.norm(nv)
        t = np.cross(nv, rng.normal(size=3))
        nt = np.linalg.norm(t)
        if nt < 1e-9:
            continue
        t /= nt

        def K(d):
            rxd = np.cross(r, d)
            return inv_m + rxd @ Ii @ rxd

        out.append(K(t) / K(nv))
    return np.asarray(out)


def test_kt_over_kn_distribution(params_and_meshes):
    params, meshes = params_and_meshes
    I = np.asarray(params.inertia)
    m = np.asarray(params.mass)
    rng = np.random.default_rng(0)
    for b, name in enumerate(["nut", "screw", "hnm"]):
        rad = np.linalg.norm(meshes[b].extents) / 2
        r = _ratios(1.0 / m[b], 1.0 / I[b], rad, rng)
        med = np.percentile(r, 50)
        p95 = np.percentile(r, 95)
        # median within 10% of exact: the approximation is unbiased where
        # most contacts live ...
        assert 0.9 < med < 1.1, (name, med)
        # ... and the tail stays within the regime the clamp/averaging
        # analysis covered (worst measured: screw p95 ~4.4, max ~25)
        assert p95 < 6.0, (name, p95)
        assert r.max() < 40.0, (name, r.max())
