"""Quantify the engine's K_t ~= K_n tangential-mass approximation.

VERDICT r2 weak #7: ``sim/engine.py`` sizes friction impulses with the
normal-direction effective mass.  This test measures the true ratio
K_t/K_n over sampled contact geometry on the real per-class inertia
tensors and pins the distribution the approximation was accepted under:
median ~1, with heavy tails that are rendered harmless by the mu*jn cone
clamp and Jacobi contact-count averaging (see the engine comment at the
``jt_mag`` computation).  Reference analog: PyBullet solves the full
per-direction Schur complement (btSequentialImpulseConstraintSolver), so
any future exact-K_t upgrade should keep these stats as its baseline.
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
