"""Force-limited gripper close (VERDICT r3 #7).

The reference closes its fingers under POSITION_CONTROL with maxForce 100 N
(``pybullet_env/env_grasp.py:56-62``).  Two properties must hold here:

1. **Equilibrium width on a rigid part**: closing on a rigid nut stalls at
   the object's width minus the calibrated contact compliance — the fingers
   do not crush through, and the width is stationary once reached.
2. **Bounded squeeze impulse**: a kinematic collider with an impulse budget
   cannot deliver more than ``budget`` of normal impulse to a body per
   engine step, no matter how deep the penetration (the engine-level clamp
   backing the 100 N motor limit).
"""
import jax
import jax.numpy as jnp
import numpy as np

from catgrasp_tpu.core import transforms as tf
from catgrasp_tpu.geom import csg as csglib
from catgrasp_tpu.geom import primitives as prim
from catgrasp_tpu.sim import engine
from catgrasp_tpu.sim.env_grasp import GripperSpec, grasp_rollout
from catgrasp_tpu.sim.types import SceneParams, SceneState, build_shape_lib


def _nut_lib():
    return build_shape_lib([prim.make_instance("nut", "train", 0)],
                           [csglib.make_csg_instance("nut", "train", 0)],
                           n_surf=64)


def test_equilibrium_width_on_rigid_nut():
    """Deep centered side grasp: final width == in-channel object width minus
    (at most) twice the compliance cap; strictly positive; stationary."""
    lib = _nut_lib()
    spec = GripperSpec()
    g = np.eye(4, dtype=np.float32)
    g[:3, 3] = [-spec.finger_len * 0.9, 0.0, 0.0]

    out = grasp_rollout(lib, jnp.int32(0), jnp.float32(1.0), jnp.asarray(g), spec)
    w = float(out["width"])

    # in-channel width of the nut along the closing (y) axis, from the same
    # surface samples the closing law sees
    pts = np.asarray(lib.surf_pts[0])
    pts_g = pts - g[:3, 3]  # identity rotation
    in_chan = ((np.abs(pts_g[:, 2]) <= spec.finger_depth / 2)
               & (pts_g[:, 0] >= 0) & (pts_g[:, 0] <= spec.finger_len))
    ob_width = pts_g[in_chan, 1].max() - pts_g[in_chan, 1].min()

    assert w > 0.005, f"fingers crushed through the nut: width {w * 1e3:.2f} mm"
    # equilibrium: within [ob_width - 2*cap - 1 mm, ob_width + 1 mm]
    lo = ob_width - 2 * spec.max_squeeze_pen - 0.001
    hi = ob_width + 0.001
    assert lo <= w <= hi, (
        f"width {w * 1e3:.2f} mm outside equilibrium band "
        f"[{lo * 1e3:.2f}, {hi * 1e3:.2f}] (object {ob_width * 1e3:.2f} mm)")
    # stationary: the close phase reached equilibrium well before its end —
    # the shake phase (no closing) must not have changed the width at all
    # (grasp_rollout returns the post-shake width; closing stops at
    # N_CLOSE_STEPS, so any drift would show as w < lo above)


def test_impulse_budget_bounds_delivered_momentum():
    """A kinematic collider with an impulse budget may change a body's
    momentum by at most that budget per step, no matter how fast the body
    approaches; with budget=inf the same contact absorbs the full approach
    momentum (so the clamp, not the contact, is what binds).

    Split-impulse note (r5): penetration recovery is a position-only pseudo
    channel, so a STATIC deep overlap delivers ~zero momentum by design —
    the budget is probed against real approach velocity, and the positional
    de-penetration is asserted separately."""
    lib = _nut_lib()
    params = SceneParams.create(lib, jnp.zeros(1, jnp.int32), jnp.ones(1))
    m = float(params.mass[0])
    # one box whose face penetrates the nut by ~1.5 mm, pushing +z
    mk = lambda budget: engine.StaticEnv.boxes(
        [[0.0, 0.0, -0.05]], [[0.1, 0.1, 0.051]],
        imp_budget=jnp.array([budget]))
    v0 = 0.5  # m/s downward approach
    st0 = SceneState.create(1).replace(
        active=jnp.array([True]),
        # nut half-thickness is 3 mm -> bottom face sits 1.5 mm inside the
        # box (top face at z=+1 mm)
        pos=jnp.array([[0.0, 0.0, 0.0025]]),
        linvel=jnp.array([[0.0, 0.0, -v0]]))

    def dv_after_one_step(budget):
        # damping off: at v0=0.5 m/s it changes momentum by ~8.5e-5 N*s per
        # step by itself, which would swamp the 1e-4 budget being measured
        st = engine.step(st0, params, lib, mk(budget), gravity=0.0,
                         linear_damping=0.0, angular_damping=0.0)
        return float(st.linvel[0, 2] - (-v0)), st

    budget = 1e-4  # N*s
    dv_capped, _ = dv_after_one_step(budget)
    dv_free, _ = dv_after_one_step(np.inf)
    assert m * dv_capped <= budget * 1.05, (
        f"delivered impulse {m * dv_capped:.2e} exceeds budget {budget:.0e}")
    assert m * dv_free > 3 * budget, (
        f"uncapped contact only delivered {m * dv_free:.2e}; test not probative")

    # positional de-penetration (pseudo channel) works even under a tiny
    # budget: a static deep overlap moves out by ~BAUMGARTE*pen this step
    # without gaining persistent velocity
    st_static = st0.replace(linvel=jnp.zeros((1, 3)))
    out = engine.step(st_static, params, lib, mk(budget), gravity=0.0,
                      linear_damping=0.0, angular_damping=0.0)
    assert float(out.pos[0, 2]) > float(st_static.pos[0, 2]) + 1e-5, (
        "pseudo channel failed to de-penetrate")
    assert float(jnp.linalg.norm(out.linvel[0])) < 0.01, (
        "penetration recovery leaked into persistent velocity")
