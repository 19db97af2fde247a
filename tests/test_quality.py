"""Analytic wrench-space grasp quality (grasp/quality.py) sanity physics."""
import jax
import jax.numpy as jnp
import numpy as np

from catgrasp_tpu.grasp import quality as Q


def _pad(pts, nrm, cap=16):
    C = len(pts)
    mask = np.zeros(cap, bool); mask[:C] = True
    p = np.zeros((cap, 3), np.float32); p[:C] = pts
    n = np.zeros((cap, 3), np.float32); n[:C] = nrm
    return jnp.asarray(p), jnp.asarray(n), jnp.asarray(mask)


def test_antipodal_pair_has_closure():
    # pinch of a unit cube along x: contacts on opposite faces
    p, n, m = _pad([[0.5, 0, 0], [-0.5, 0, 0]],
                   [[-1, 0, 0], [1, 0, 0]])  # inward normals
    q = Q.epsilon_quality(p, n, m, mu=0.5)
    assert float(q) > 0.05

    s = Q.antipodal_score(jnp.array([0.5, 0, 0]), jnp.array([-1.0, 0, 0]),
                          jnp.array([-0.5, 0, 0]), jnp.array([1.0, 0, 0]))
    assert float(s) > 0.999
    assert bool(Q.force_closure(jnp.array([0.5, 0, 0]), jnp.array([-1.0, 0, 0]),
                                jnp.array([-0.5, 0, 0]), jnp.array([1.0, 0, 0])))


def test_single_contact_no_closure():
    p, n, m = _pad([[0.5, 0, 0]], [[-1, 0, 0]])
    assert float(Q.epsilon_quality(p, n, m, mu=0.5)) == 0.0


def test_same_side_contacts_no_closure():
    # both contacts on the same face pushing the same way: cannot resist +x
    p, n, m = _pad([[0.5, 0.1, 0], [0.5, -0.1, 0]],
                   [[-1, 0, 0], [-1, 0, 0]])
    q = Q.epsilon_quality(p, n, m, mu=0.3, soft_fingers=False)
    assert float(q) == 0.0


def test_perpendicular_normals_fail_antipodal():
    s = Q.antipodal_score(jnp.array([0.5, 0, 0]), jnp.array([0.0, 1, 0]),
                          jnp.array([-0.5, 0, 0]), jnp.array([1.0, 0, 0]))
    assert float(s) < 0.1
    assert not bool(Q.force_closure(jnp.array([0.5, 0, 0]), jnp.array([0.0, 1, 0]),
                                    jnp.array([-0.5, 0, 0]), jnp.array([1.0, 0, 0]),
                                    mu=0.5))


def test_more_friction_more_quality():
    p, n, m = _pad([[0.5, 0, 0], [-0.5, 0, 0]], [[-1, 0, 0], [1, 0, 0]])
    q_lo = float(Q.epsilon_quality(p, n, m, mu=0.2))
    q_hi = float(Q.epsilon_quality(p, n, m, mu=0.9))
    assert q_hi > q_lo > 0.0


def test_batched_matches_single():
    rng = np.random.default_rng(0)
    G, C = 5, 8
    pts = rng.normal(size=(G, C, 3)).astype(np.float32) * 0.05
    nrm = rng.normal(size=(G, C, 3)).astype(np.float32)
    msk = rng.uniform(size=(G, C)) > 0.3
    qb = np.asarray(Q.epsilon_quality_batch(jnp.asarray(pts), jnp.asarray(nrm),
                                            jnp.asarray(msk)))
    for g in range(G):
        q1 = float(Q.epsilon_quality(jnp.asarray(pts[g]), jnp.asarray(nrm[g]),
                                     jnp.asarray(msk[g])))
        np.testing.assert_allclose(qb[g], q1, rtol=1e-5, atol=1e-6)


def test_isotropy_degenerate_vs_spread():
    # two collinear contacts -> low isotropy; 3 orthogonal -> higher
    p1, n1, m1 = _pad([[0.5, 0, 0], [-0.5, 0, 0]], [[-1, 0, 0], [1, 0, 0]])
    p2, n2, m2 = _pad([[0.5, 0, 0], [-0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5]],
                      [[-1, 0, 0], [1, 0, 0], [0, -1, 0], [0, 0, -1]])
    i1 = float(Q.grasp_isotropy(p1, n1, m1))
    i2 = float(Q.grasp_isotropy(p2, n2, m2))
    assert i2 > i1


def test_parallel_jaw_quality_ranks_grasps():
    from catgrasp_tpu.grasp.quality import parallel_jaw_quality
    from catgrasp_tpu.sim.env_grasp import GripperSpec

    spec = GripperSpec()
    rng = np.random.default_rng(0)
    # flat box 22x20x8 mm inside the closing region
    pts = (rng.uniform(-1, 1, (400, 3)).astype(np.float32)
           * [0.011, 0.010, 0.004] + [0.02, 0, 0])
    nrm = np.zeros_like(pts); nrm[:, 2] = 1
    g_center = np.eye(4, dtype=np.float32)
    g_shallow = np.eye(4, dtype=np.float32)
    g_shallow[0, 3] = 0.018  # tips barely past the surface
    g_miss = np.eye(4, dtype=np.float32); g_miss[1, 3] = 0.2
    q = np.asarray(parallel_jaw_quality(
        jnp.asarray(pts), jnp.asarray(nrm),
        jnp.asarray(np.stack([g_center, g_shallow, g_miss])), spec))
    assert q[0] > 0.05          # full wrap: solid closure
    assert q[2] == 0.0          # grasping air scores zero
    assert q[0] >= q[1]         # deeper engagement never scores worse


def test_parallel_jaw_quality_penalizes_tip_sliver():
    """Regression for the inverted engagement factor: a grasp capturing only
    a few-mm sliver at the fingertip edge (the init_bite end of the depth
    sweep — it closes on air in simulation) must score well below the same
    object held deep in the channel, and below the 0.5 p_G gate after the
    pipeline's clip(q/0.3)."""
    from catgrasp_tpu.grasp.quality import parallel_jaw_quality
    from catgrasp_tpu.sim.env_grasp import GripperSpec

    spec = GripperSpec()
    rng = np.random.default_rng(1)
    # 30x20x8 mm slab (a lying nut's graspable rim)
    pts = (rng.uniform(-1, 1, (400, 3)).astype(np.float32)
           * [0.015, 0.010, 0.004])
    nrm = np.zeros_like(pts)
    nrm[:, 2] = 1
    g_deep = np.eye(4, dtype=np.float32)
    g_deep[0, 3] = -0.012  # slab center 12 mm past the root side -> deep
    g_tip = np.eye(4, dtype=np.float32)
    # slab near edge (x = -15 mm) lands 2 mm inside the fingertip plane
    g_tip[0, 3] = -(spec.finger_len - 0.002) - 0.015
    q = np.asarray(parallel_jaw_quality(
        jnp.asarray(pts), jnp.asarray(nrm),
        jnp.asarray(np.stack([g_deep, g_tip])), spec))
    assert q[0] > 2 * q[1]
    assert min(q[1] / 0.3, 1.0) < 0.5


def test_engagement_depth_robust_to_flying_pixels():
    """A hover grasp whose closing channel holds only 1-2 flying points
    (depth-map edge bleed interpolates pixels mid-air) must NOT read as
    engaged: the robust 3rd-smallest-x depth ignores them, while the round-3
    single-min version returned engagement ~1.0 and the grasp closed on
    air in the learned loop."""
    from catgrasp_tpu.grasp.filter import engagement_depth
    from catgrasp_tpu.sim.env_grasp import GripperSpec

    spec = GripperSpec()
    rng = np.random.default_rng(0)
    # object surface 10 mm PAST the fingertip plane (hover grasp)
    surf = (rng.uniform(-1, 1, (300, 3)).astype(np.float32)
            * [0.002, 0.010, 0.008] + [spec.finger_len + 0.010, 0, 0])
    g = np.eye(4, dtype=np.float32)
    # two flying pixels mid-channel
    fly = np.array([[0.010, 0.001, 0.0], [0.015, -0.002, 0.001]], np.float32)
    pts = np.concatenate([surf, fly])
    eng = float(np.asarray(engagement_depth(
        jnp.asarray(pts), jnp.asarray(g[None]), spec))[0])
    assert eng < 0.08  # below the pipeline's viability gate

    # ...but a genuinely engaged grasp (many in-channel points) still reads
    # its true depth
    deep = (rng.uniform(-1, 1, (300, 3)).astype(np.float32)
            * [0.002, 0.010, 0.008] + [0.020, 0, 0])
    eng_deep = float(np.asarray(engagement_depth(
        jnp.asarray(deep), jnp.asarray(g[None]), spec))[0])
    assert eng_deep > 0.4


def test_engagement_depth_ignores_points_behind_palm():
    """Segmentation bleed can put a neighbor's point BEHIND the palm face;
    unbounded x that point clipped engagement to 1.0 for a grasp hovering
    over air."""
    from catgrasp_tpu.grasp.filter import engagement_depth
    from catgrasp_tpu.sim.env_grasp import GripperSpec

    spec = GripperSpec()
    behind = np.tile(np.array([[-0.03, 0.0, 0.0]], np.float32), (5, 1))
    g = np.eye(4, dtype=np.float32)
    eng = float(np.asarray(engagement_depth(
        jnp.asarray(behind), jnp.asarray(g[None]), spec))[0])
    assert eng == 0.0


def test_rebind_target_to_channel():
    """When a merged learned segment puts the chosen grasp on body 1 but the
    segment-majority vote said body 0, the sim must track body 1 — the body
    actually between the fingers (the reference's PyBullet grabs whatever is
    there)."""
    from catgrasp_tpu.pipelines.run_grasp_simulation import \
        rebind_target_to_channel
    from catgrasp_tpu.sim.env_grasp import GripperSpec

    spec = GripperSpec()
    rng = np.random.default_rng(0)
    # "image" of 200 px: body 0 far away, body 1 inside the grasp channel
    pts0 = (rng.uniform(-1, 1, (100, 3)).astype(np.float32)
            * [0.01, 0.01, 0.004] + [0.3, 0.3, 0.0])
    pts1 = (rng.uniform(-1, 1, (100, 3)).astype(np.float32)
            * [0.01, 0.01, 0.004] + [0.02, 0.0, 0.0])
    xyz = np.concatenate([pts0, pts1]).reshape(20, 10, 3)
    seg_body = np.concatenate([np.zeros(100, np.int32),
                               np.ones(100, np.int32)]).reshape(20, 10)
    g = np.eye(4, dtype=np.float32)
    active = np.ones(2, bool)
    assert rebind_target_to_channel(xyz, seg_body, g, 0, active, spec, 2) == 1
    # inactive bodies never win
    active1 = np.array([True, False])
    assert rebind_target_to_channel(xyz, seg_body, g, 0, active1, spec, 2) == 0
    # empty channel -> keep the original target
    g_air = np.eye(4, dtype=np.float32); g_air[2, 3] = 5.0
    assert rebind_target_to_channel(xyz, seg_body, g_air, 0, active, spec, 2) == 0
