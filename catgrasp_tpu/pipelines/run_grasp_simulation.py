"""Closed-loop clutter evaluation — TPU ``run_grasp_simulation.py`` (THE demo).

Loop (reference ``simulate_grasp_with_arm``, ``run_grasp_simulation.py:480``):
  make pile -> settle -> render -> segment -> per segment: occupancy fill,
  NUNOCS 9D pose, grasp sampling (cone + NOCS transfer) + filtering,
  task-affordance scoring P(T|G), learned quality P(G), threshold gates on
  P(T,G)=P(T|G)P(G) -> pick -> lift -> place over the fixture -> verify ->
  tally ``num_objects / num_stable_grasp / num_task_grasp_succ``
  (``:719``).

Perception is pluggable: trained predicters (artifacts) or oracle mode
(ground-truth seg + pose from the renderer) so the full loop is evaluable
before/without training — the physics, sampling, filtering, kinematics and
placement logic are identical in both modes.
"""
from __future__ import annotations

import argparse
import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..config.loader import load_config
from ..core import transforms as tf
from ..core.symmetry import get_symmetry_tfs
from ..geom import csg as csglib
from ..geom import occupancy
from ..geom import primitives as prim
from ..grasp.gripper import Gripper
from ..kin import iiwa, planner
from ..grasp.sampler import NocsTransferGraspSampler, PointConeGraspSampler
from ..pipelines.make_canonical import to_nunocs_transform
from ..render import raymarch
from ..sim import arm as simarm
from ..sim import engine, env_pile, env_semantic as es
from ..sim.env_grasp import GripperSpec, finger_boxes, finger_contact_points, gripper_env
from ..sim.types import SceneParams, SceneState, build_shape_lib

Q_HOME = np.zeros(7, np.float32)  # straight-up home (clear of the bin)
LIFT_HEIGHT = 0.25
LIFT_STEPS = 80
CLOSE_STEPS = 50

# arm-executed phase lengths (engine steps; sim.arm scans are compiled once
# per static split)
N_APP, N_LIFT_A = 140, 50  # approach = RRT segment (110) + descent (30)
N_MOVE_P, N_DROP_P = 140, 100
FIXTURE_POS = np.array([-0.10, -0.50, 0.0], np.float32)  # world, beside bin,
# within iiwa reach of the base at (-0.559, -0.367) — the reference's place
# fixture likewise sits on the table next to the bin (run_grasp_simulation.py:497)


# ---------------------------------------------------------------------------
# In-pile pick execution (floating gripper in the full pile scene)
# ---------------------------------------------------------------------------


def execute_pick(lib, state: SceneState, params: SceneParams, env_bin,
                 target: int, grasp_in_world: jnp.ndarray,
                 spec: GripperSpec = GripperSpec(), narrowphase: str = "csg"):
    """Close on the target inside the pile, hold-test under gravity, then
    lift.  Returns (picked bool, final_state, in-hand pose of target rel.
    grasp, final width).

    Mirrors the reference's pick: physics close + grasp-nothing check
    (``run_grasp_simulation.py:342-368``, ``env_grasp.py:87-108``), then a
    rigid attachment for transport (``create_attachment``,
    ``ss-pybullet/pybullet_tools/utils.py:3578``) — PyBullet, too, does not
    lift through finger friction; the held object rides the gripper frame.
    """
    dt = engine.DT

    def step_fn(carry, i):
        st, w, c, tch = carry
        closing = i < CLOSE_STEPS

        R = tf.quat_to_matrix(st.quat[target])
        pts_w = st.pos[target] + (lib.surf_pts[params.shape_id[target]]
                                  * params.scale[target]) @ R.T
        pts_g = tf.transform_points(tf.pose_inverse(grasp_in_world), pts_w)
        from ..sim.env_grasp import closing_step
        w_new, c_new, tch, v_p, v_n = closing_step(
            pts_g, w, c, tch, closing, spec, dt)

        genv = gripper_env(grasp_in_world, w_new, c_new, v_p, v_n, spec,
                           grip=~closing & tch[0] & tch[1])
        # merge bin + gripper colliders
        from ..sim.arm import merge_envs
        merged = merge_envs(env_bin, genv)
        st = engine.step(st, params, lib, merged, dt=dt, gravity=-9.8,
                         narrowphase=narrowphase)
        keep = (st.pos[target], st.quat[target])
        return (st, w_new, c_new, tch), keep

    # phase 1+2: close, then hold under gravity with the gripper static
    from ..sim.env_grasp import closing_touched_init
    (final, w_f, c_f, _), traj = jax.lax.scan(
        step_fn, (state, jnp.asarray(spec.max_width), jnp.float32(0.0),
                  closing_touched_init()),
        jnp.arange(CLOSE_STEPS + LIFT_STEPS))

    # hold test (verify_grasp semantics): displacement between end-of-close
    # and end-of-hold below 2 cm, and the fingers actually closed onto
    # something (grasp-nothing check: residual width above near-zero).
    pos_close = traj[0][CLOSE_STEPS - 1]
    disp = jnp.linalg.norm(final.pos[target] - pos_close)
    closed_on_something = w_f > 1e-3
    # object still between the fingers at the end
    ob_pose = tf.pose_from_qt(final.quat[target], final.pos[target])
    ob_in_grasp = tf.pose_inverse(grasp_in_world) @ ob_pose
    # the per-finger close may settle at a lateral midline offset c_f; the
    # lateral hold bound is measured from there
    centered = jnp.all(jnp.abs(ob_in_grasp[:3, 3] - jnp.stack([0.02, c_f, 0.0]))
                       < jnp.array([0.06, 0.05, 0.05]))
    picked = (disp < 0.02) & closed_on_something & centered

    # phase 3: transport — attachment: the held object rides the gripper
    # (removed from the pile by the caller); non-targets keep their state.
    return picked, final, ob_in_grasp, w_f


# module-scope jit wrapper: one persistent trace cache serves every
# target/attempt (target is a traced dynamic index)
_execute_pick_jit = jax.jit(execute_pick, static_argnames=("spec", "narrowphase"))


def rebind_target_to_channel(xyz: np.ndarray, seg_body: np.ndarray,
                             grasp_cam: np.ndarray, target: int,
                             active: np.ndarray, spec,
                             n_objects: int) -> int:
    """Sim-side target rebinding: the reference's PyBullet grasps whatever
    sits between the fingers (``env.py:140`` closes on contact, body
    unspecified); our closing law tracks ONE body.  A merged learned segment
    can put the chosen grasp on a DIFFERENT body than the segment-majority
    one — tracking the majority then closes to width 0 on air.  Returns the
    active body with the most observed points inside this grasp's closing
    channel (GT seg used for sim bookkeeping only), or ``target`` if the
    channel is empty."""
    vis = seg_body >= 0
    p_g = (xyz[vis] - grasp_cam[:3, 3]) @ grasp_cam[:3, :3]
    from ..sim.env_grasp import closing_channel_mask
    in_chan = closing_channel_mask(p_g, spec)
    if not in_chan.any():
        return target
    cnt = np.bincount(seg_body[vis][in_chan].astype(np.int64),
                      minlength=n_objects)[:n_objects]
    cnt[~active] = 0
    return int(cnt.argmax()) if cnt.any() else target


def _trans(t) -> np.ndarray:
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = t
    return T


def _place_with_arm(lib, state, params, env_bin, target, ob_in_grasp, width,
                    q_cur, base_in_world, gripper, T_fix, class_name, sym,
                    obs_base, seed, spec, verbose, narrowphase="csg",
                    arm_dynamics=False, grip_center=0.0):
    """Arm-executed place_action (reference ``run_grasp_simulation.py:375-463``):
    symmetry loop for an IK-feasible place orientation, RRT transport from the
    post-lift config to pre-place, Cartesian insertion descent, open fingers,
    gravity drop, fixture-relative success check.

    The RRT obstacle cloud is the pre-pick scan (the reference, too, plans
    with the scene as last observed); transport happens at lift height so
    staleness from pile disturbance is benign.
    Returns (placed bool, state after the drop)."""
    pre_t, place_t = es.TASK_POSES[class_name]
    base_inv = np.linalg.inv(base_in_world)
    ee_in_grasp = np.asarray(gripper.ee_in_grasp)
    inv_oig = np.linalg.inv(np.asarray(ob_in_grasp))
    rrt = planner.RRTConnect(obs_base.astype(np.float32), floor_z=-0.04,
                             seed=seed + 77)
    # Fallback ladder (opt-in): the reference's move_arm tries EVERY ikfast
    # solution for the pre-place pose and plans the place transport with
    # obstacles=[] (``run_grasp_simulation.py:402``, place_action), so a
    # single colliding best-of-zero IK branch never dooms an orientation
    # there.  With few symmetries (hnm has 2, ``Utils.py:87-90``) our
    # single-branch gate aborts whole attempts: the r4 learned-hnm matrix
    # lost ~15 placements to "no IK-feasible/plannable orientation".
    # DEFAULT ON since r5: the r4c/r4d measurements showed the strict
    # single-branch gate losing placements the reference would make (hnm
    # task successes 12/14/15 with the ladder vs 9/11/12 stock,
    # logs/eval_matrix_r4c.jsonl), and the reference plans its place
    # transport with obstacles=[] unconditionally
    # (run_grasp_simulation.py:402).  Set CATGRASP_PLACE_FALLBACKS=0 to
    # reproduce the stricter pre-r5 behavior.
    fallbacks = os.environ.get("CATGRASP_PLACE_FALLBACKS", "1") == "1"
    # the relaxed planner matches the reference's place transport exactly:
    # obstacles=[] means NO collision checking at all there, floor included
    # (``run_grasp_simulation.py:402``).  Keeping our floor test in the
    # fallback vetoed every branch whenever the place pose needs a low tool
    # pose — the wrist/flange z is shared by ALL IK branches of a pose, so
    # one low flange kills the entire ladder (r4c counters: relax_goal 12/12).
    rrt_free = planner.RRTConnect(np.float32([[10.0, 10.0, 10.0]]),
                                  floor_z=-10.0, seed=seed + 78)
    fails = {"ik_pre": 0, "ik_place": 0, "descent": 0, "rrt": 0,
             "relax_start": 0, "relax_goal": 0, "relax_iter": 0}
    plan = None
    for S in np.asarray(sym, np.float32):
        O_pre = T_fix @ _trans(pre_t) @ S
        O_place = T_fix @ _trans(place_t) @ S
        ee_pre = (base_inv @ O_pre @ inv_oig @ ee_in_grasp).astype(np.float32)
        ee_place = (base_inv @ O_place @ inv_oig @ ee_in_grasp).astype(np.float32)
        q_pre, ok1 = iiwa.ik_best(jnp.asarray(ee_pre))
        if not bool(ok1):
            fails["ik_pre"] += 1
            continue
        _, ok2 = iiwa.ik_best(jnp.asarray(ee_place))
        if not bool(ok2):
            fails["ik_place"] += 1
            continue
        branches = [np.asarray(q_pre)]
        if fallbacks:
            qs_all, val = iiwa.ik(jnp.asarray(ee_pre))
            qs_all = np.asarray(qs_all)[np.asarray(val)]
            order = np.argsort(
                np.linalg.norm(qs_all - np.asarray(q_cur)[None], axis=1))
            for q in qs_all[order[:8]]:
                if all(np.linalg.norm(q - b) > 1e-3 for b in branches):
                    branches.append(q)
            branches = branches[:6]
        descent = np.stack([ee_pre * (1 - a) + ee_place * a
                            for a in np.linspace(0, 1, 5)])
        for q_pre_b in branches:
            qs_d, okd = planner.plan_cartesian_waypoints(descent, q_seed=q_pre_b)
            if not okd:
                fails["descent"] += 1
                break  # waypoint with zero IK solutions: branch-independent
            path = rrt.plan(np.asarray(q_cur), q_pre_b, max_iter=500)
            if path is None and fallbacks:
                # reference place transport ignores the observed cloud
                path = rrt_free.plan(np.asarray(q_cur), q_pre_b, max_iter=500)
                if path is None:
                    # why did even the floor-only planner refuse?
                    sg = rrt_free._free(
                        np.stack([np.asarray(q_cur), q_pre_b]))
                    if not sg[0]:
                        fails["relax_start"] += 1
                    elif not sg[1]:
                        fails["relax_goal"] += 1
                    else:
                        fails["relax_iter"] += 1
            if path is None:
                fails["rrt"] += 1
                continue
            plan = (np.stack(path), qs_d)
            break
        if plan is not None:
            break
    if plan is None:
        if verbose:
            print("    place: no IK-feasible/plannable orientation among "
                  f"{len(sym)} symmetries (gate fails: {fails})")
        return False, state
    path, qs_d = plan
    move = np.concatenate([simarm.resample_traj(path, N_MOVE_P - 40),
                           simarm.resample_traj(qs_d, 40)]).astype(np.float32)
    sched = np.concatenate([move, np.repeat(move[-1][None], N_DROP_P, axis=0)])
    if arm_dynamics:
        sched = simarm.dynamicize_schedule(sched).astype(np.float32)
    final, ob_pose_final, place_traj = simarm.execute_place_arm(
        lib, state, params, env_bin, jnp.int32(target), jnp.asarray(sched),
        jnp.asarray(base_in_world), jnp.asarray(ee_in_grasp),
        jnp.asarray(np.asarray(ob_in_grasp, np.float32)),
        jnp.asarray(width), spec, n_move=N_MOVE_P, n_drop=N_DROP_P,
        narrowphase=narrowphase, center=jnp.asarray(grip_center))
    ob_in_fix = np.linalg.inv(T_fix) @ np.asarray(ob_pose_final)
    placed = bool(es.place_success(class_name, jnp.asarray(ob_in_fix),
                                   jnp.asarray(place_t, jnp.float32)))
    if verbose and not placed:
        fix_state = np.asarray(final.pos[-1])
        G_rel = np.asarray(simarm.grasp_pose_of(
            jnp.asarray(move[-1]), jnp.asarray(base_in_world),
            jnp.asarray(ee_in_grasp)))
        rel_pose = (np.linalg.inv(T_fix) @ G_rel @ np.asarray(ob_in_grasp))
        print(f"    place: dropped at fixture-frame t={ob_in_fix[:3, 3].round(4)}"
              f" z-axis={ob_in_fix[:3, 2].round(3)} (want xy<=6mm of "
              f"{place_t[:2]}, z<={es._SUCCESS_Z_MAX[class_name]}, upright)\n"
              f"           fixture body at {fix_state.round(4)}, release pose "
              f"t={rel_pose[:3, 3].round(4)} z-axis={rel_pose[:3, 2].round(3)}")
        # drop trajectory in fixture frame every 10 steps (deflection onset)
        tp = np.asarray(place_traj[0])[N_MOVE_P::10] - T_fix[:3, 3]
        print("           drop xy-dev:",
              np.linalg.norm(tp[:, :2] - place_t[None, :2], axis=1).round(4),
              "z:", tp[:, 2].round(3))
    return placed, final


# ---------------------------------------------------------------------------
# Grasp affordance P(T|G) from the canonical codebook
# ---------------------------------------------------------------------------


def grasp_affordance(canonical: dict, nocs_pose: np.ndarray, grasps_cam: np.ndarray,
                     width: float, spec: GripperSpec) -> np.ndarray:
    """P(T|G) per grasp: mean canonical affordance over the points the
    fingers would contact (``compute_grasp_affordance``,
    ``run_grasp_simulation.py:73-107``)."""
    pts_nocs = canonical["canonical_cloud"]
    aff = canonical["canonical_affordance"]
    pts_cam = pts_nocs @ nocs_pose[:3, :3].T + nocs_pose[:3, 3]
    out = np.zeros(len(grasps_cam), np.float32)
    for i, g in enumerate(grasps_cam):
        pg = (pts_cam - g[:3, 3]) @ g[:3, :3]
        m1, m2 = finger_contact_points(jnp.asarray(pg), jnp.asarray(width), spec,
                                       surface_tol=0.004)
        m = np.asarray(m1 | m2)
        out[i] = float(aff[m].mean()) if m.any() else 0.0
    return out


# ---------------------------------------------------------------------------
# Main loop
# ---------------------------------------------------------------------------


@dataclass
class EvalCounters:
    num_objects: int = 0
    num_attempts: int = 0
    num_stable_grasp: int = 0
    num_task_grasp_succ: int = 0


def simulate_grasp_rounds(class_name: str = "nut", n_rounds: int = 2,
                          n_objects: int = 5, cfg_run: dict | None = None,
                          oracle: bool = True, canonical: dict | None = None,
                          predicters: dict | None = None, seed: int = 0,
                          max_attempts_per_round: int = 8,
                          render_hw=(384, 512), verbose: bool = True,
                          metrics_path: str | None = None, use_arm: bool = True,
                          arm_exec: bool = True, instance: int | None = None,
                          obj_path: str | None = None,
                          arm_dynamics: bool = False):
    from ..utils.metrics import MetricsLogger

    mlog = MetricsLogger(metrics_path, run="eval", class_name=class_name,
                         seed=seed, oracle=oracle)
    cfg_run = cfg_run or load_config("config_run.yml")
    gripper = Gripper.default()
    spec = gripper.spec
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)

    split = cfg_run.get("instance_split", "test")
    n_inst = prim.num_instances(class_name, split)
    # reference protocol: the pile is ONE object model at scale 1
    # (``make_pile(obj_file=cfg_run['ob_name'], scale_range=[1,1])``,
    # run_grasp_simulation.py:505-506) and the fixture is that model's own
    # ``_place.obj``; instance < 0 = mixed instances at jittered scales
    # (harder; fixture falls back to category defaults).
    if instance is None:
        instance = int(cfg_run.get("instance_index", 0))
    if obj_path:
        # arbitrary-mesh path (reference: scanned ``data/object_models``
        # assets, README.md:68-75): bake SDF grids for physics AND
        # rendering; the mesh needs no CSG tree (a bbox placeholder keeps
        # the stacked-shape layout).  The fixture stays the category's
        # procedural one (the reference ships a ``_place.obj`` per model).
        from ..geom.mesh import TriMesh
        m = TriMesh.load_obj(obj_path)
        b = m.bounds
        n_inst, instance = 1, 0
        fix_params = None
        meshes = [m, prim.place_fixture(class_name, None)]
        csgs = [csglib.csg_box(b[1] - b[0], center=(b[1] + b[0]) / 2),
                csglib.csg_place_fixture(class_name, None)]
        lib = build_shape_lib(meshes, csgs, n_surf=256, bake_grids=True, dims=56)
        geom = "grid"
    else:
        fix_params = (prim.instance_params(class_name, split, instance)
                      if instance >= 0 else None)
        meshes = [prim.make_instance(class_name, split, i) for i in range(n_inst)]
        csgs = [csglib.make_csg_instance(class_name, split, i) for i in range(n_inst)]
        meshes.append(prim.place_fixture(class_name, fix_params))
        csgs.append(csglib.csg_place_fixture(class_name, fix_params))
        # 256 surface pts/body: the peg-through-nut-hole interaction needs
        # <3 mm point spacing on thin features or the slide down the peg
        # tunnels laterally through the nut wall (the pick phases work at 64,
        # but threading fidelity sets the task-success ceiling)
        lib = build_shape_lib(meshes, csgs, n_surf=256)
        geom = "csg"
    fixture_idx = len(meshes) - 1

    pile_cfg = env_pile.PileConfig(max_bodies=n_objects, scale_range=(0.9, 1.1))
    env_bin = engine.StaticEnv.open_bin(pile_cfg.bin_inner)
    # table slab under the fixture area (the reference's bin and fixture both
    # sit on a table): catches objects that miss/bounce off the fixture
    env_bin = simarm.merge_envs(env_bin, engine.StaticEnv.boxes(
        jnp.array([[FIXTURE_POS[0], FIXTURE_POS[1], -0.006]]),
        jnp.array([[0.15, 0.15, 0.005]])))
    H, W = render_hw
    # focal scales with resolution (reference: fx 2257.75 at 2064 wide,
    # config.yml:1-3) so pixel density on the pile grows with render_hw
    fx = 2257.75 * (W / 2064.0)
    Kc = jnp.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1.0]])
    cam = np.eye(4, dtype=np.float32)
    cam[:3, :3] = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32)
    cam[:3, 3] = [0, 0, 0.7]
    cam_j = jnp.asarray(cam)
    T_wc = np.linalg.inv(cam)
    # robot base placement: the reference bin sits ~0.56 m in front of the
    # iiwa base (``env.py:46-49`` bin_in_world t=(0.559, 0.367, -0.052));
    # our world is the bin frame, so the base goes at the inverse offset —
    # with the base at the bin center the IK gate rejects ~85% of grasps
    base_in_world = np.eye(4, dtype=np.float32)
    base_in_world[:3, 3] = [-0.559, -0.367, 0.052]
    cam_in_base = jnp.asarray(np.linalg.inv(base_in_world) @ cam)

    sym = get_symmetry_tfs(class_name)
    counters = EvalCounters()
    # reference sampler params verbatim (config_run.yml): coarsening the
    # approach step skips the few-mm window where finger tips clear the
    # floor yet still pinch low-profile parts (nut height ~= 8 mm)
    cone = PointConeGraspSampler(
        gripper, max_num_samples=64,
        n_sphere_dir=int(cfg_run.get("cone_grasp_smapler_n_sphere_dir", 30)),
        approach_step=float(cfg_run.get("cone_grasp_smapler_approach_step", 0.002)),
    )
    nocs_sampler = None
    if canonical is not None and len(canonical.get("canonical_grasps", [])):
        nocs_sampler = NocsTransferGraspSampler(
            gripper, np.asarray(canonical["canonical_grasps"]),
            np.asarray(canonical["canonical_grasp_scores"]),
            score_larger_than=float(cfg_run.get("nocs_grasp_sampler_score_larger_than", 0.95)),
            max_n_grasp=int(cfg_run.get("nocs_grasp_sampler_max_n_grasp", 10000)),
        )

    # the place fixture lives IN the scene as a huge-mass body (reference
    # loads the *_place.obj into the same world, run_grasp_simulation.py:497)
    # so arm-executed insertion contact is simulated, not assumed
    T_fix = np.eye(4, dtype=np.float32)
    T_fix[:3, 3] = FIXTURE_POS
    fix_pts_base = (np.asarray(lib.surf_pts)[fixture_idx] + FIXTURE_POS
                    - base_in_world[:3, 3]) @ base_in_world[:3, :3]

    def add_fixture_body(state_p: SceneState) -> SceneState:
        return SceneState(
            pos=jnp.concatenate([state_p.pos, jnp.asarray(FIXTURE_POS)[None]]),
            quat=jnp.concatenate([state_p.quat,
                                  jnp.zeros((1, 4)).at[0, 0].set(1.0)]),
            linvel=jnp.concatenate([state_p.linvel, jnp.zeros((1, 3))]),
            angvel=jnp.concatenate([state_p.angvel, jnp.zeros((1, 3))]),
            active=jnp.concatenate([state_p.active, jnp.ones(1, bool)]),
        )

    def keep_fixture(state_f: SceneState) -> SceneState:
        # settle's out-of-bin cull must not deactivate the fixture
        return state_f.replace(active=state_f.active.at[n_objects].set(True))

    for rnd in range(n_rounds):
        key, k1 = jax.random.split(key)
        # build a pile of test instances (reference: 4-7 objects, :485-519)
        if instance >= 0:
            ob_ids = np.full(n_objects, instance % n_inst)
            ob_scales = np.ones(n_objects)
        else:
            ob_ids = rng.integers(0, n_inst, n_objects)
            ob_scales = rng.uniform(*pile_cfg.scale_range, n_objects)
        shape_id = jnp.asarray(
            np.concatenate([ob_ids, [fixture_idx]]), jnp.int32)
        scale = jnp.asarray(
            np.concatenate([ob_scales, [1.0]]), jnp.float32)
        params = SceneParams.create(lib, shape_id, scale)
        params = params.replace(
            mass=params.mass.at[n_objects].set(1e9),
            inertia=params.inertia.at[n_objects].set(1e9),
            # reference fixture lateralFriction=0.1 (env_semantic_grasp.py:53)
            friction=params.friction.at[n_objects].set(0.1))
        state_p, _ = env_pile.reset(k1, lib, pile_cfg, n_objects=jnp.int32(n_objects))
        state = add_fixture_body(
            state_p.replace(active=jnp.ones(n_objects, bool)))
        state = keep_fixture(
            env_pile.settle_fixed(state, params, lib, env_bin, pile_cfg, 500,
                                  narrowphase=geom))
        counters.num_objects += int(np.asarray(state.active)[:n_objects].sum())

        for attempt in range(max_attempts_per_round):
            active = np.asarray(state.active)[:n_objects]
            if not active.any():
                break
            out = raymarch.render(lib, state, params, Kc, cam_j, H, W,
                                  env=env_bin, geometry=geom)
            seg_body = np.asarray(out["seg"])  # ground-truth body ids
            xyz = np.asarray(out["xyz"])
            normal = np.asarray(out["normal"])

            min_px = max(20, (H * W) // 2500)
            learned_seg = bool(not oracle and predicters and "seg" in predicters)
            # learned seg retries the attempt at merged/split bandwidths
            # before giving up the round — small or merged MeanShift
            # clusters were the sole cause of unattempted objects in the
            # round-2 learned run (PointGroup's dual-clustering analog)
            found = None
            for bw_scale in ((1.0, 0.67, 1.5) if learned_seg else (1.0,)):
                if learned_seg:
                    # learned instance segmentation (seg net + MeanShift),
                    # as the reference's PointGroupPredictor path (:213)
                    vm = seg_body >= 0
                    labels, n_seg = predicters["seg"].predict(
                        xyz[vm], normal[vm], bandwidth_scale=bw_scale)
                    seg = np.full(seg_body.shape, -1, np.int64)
                    seg[vm] = labels
                    seg_ids = list(range(max(n_seg, 1)))
                else:
                    seg = seg_body
                    seg_ids = [i for i in range(n_objects) if active[i]]

                # the reference tries EVERY segment sorted by pixel count
                # (:266), yielding from the first that produces candidates
                seg_ids = sorted(seg_ids, key=lambda i: -(seg == i).sum())
                for sid in seg_ids:
                    m = seg == sid
                    if m.sum() < min_px:
                        break  # sorted: the rest are smaller
                    if learned_seg:
                        # sim-side bookkeeping only: which BODY did
                        # perception pick? (the reference needs no such map
                        # — PyBullet grasps whatever the gripper touches;
                        # our closing law tracks one body)
                        inside = seg_body[m & (seg_body >= 0)]
                        if len(inside) == 0:
                            continue
                        target = int(np.bincount(inside, minlength=n_objects).argmax())
                        if not active[target]:
                            continue
                    else:
                        target = sid
                    pts = xyz[m]
                    nrm = normal[m]
                    # background = visible non-target points + occupancy-
                    # densified occluded space (makeOccupancyGridFromCloudScan
                    # at reference run_grasp_simulation.py:139)
                    bg_m = ~m & (seg_body != -1)
                    depth_img = np.asarray(out["depth"])
                    # 1.56 mm occupancy voxels (128^3 over 0.2 m reach): the
                    # 3.1 mm grid of round 1 blocked deep engagements with
                    # phantom occupied space around thin features
                    occ_c, occ_m = occupancy.background_cloud_from_depth(
                        jnp.asarray(np.where(m, 0.0, depth_img)), Kc,
                        jnp.asarray(seg), -1, grid_dims=(128, 128, 128),
                        pad=1e-3, center=jnp.asarray(pts.mean(0)), reach=0.1)
                    occ_pts = np.asarray(occ_c)[np.asarray(occ_m)]
                    bg = np.concatenate([xyz[bg_m], occ_pts.astype(np.float32)])
                    if len(bg) == 0:
                        bg = np.full((1, 3), 999.0, np.float32)
                    elif len(bg) > 4096:
                        bg = bg[rng.choice(len(bg), 4096, replace=False)]

                    # --- pose estimation (oracle or net) -------------------
                    # nocs_pose maps CENTERED NUNOCS ([-0.5,0.5]^3) -> cam
                    if oracle:
                        ob_in_cam = T_wc @ np.asarray(
                            tf.pose_from_qt(state.quat[target], state.pos[target]))
                        s = float(scale[target])
                        mesh_idx = int(shape_id[target])
                        T_nocs = to_nunocs_transform(meshes[mesh_idx].vertices * s)
                        nocs_pose = (ob_in_cam @ np.linalg.inv(T_nocs)).astype(np.float32)
                    else:
                        res = predicters["nocs"].predict(pts, nrm)
                        if not res["valid"]:
                            continue
                        nocs_pose = res["nocs_pose"].astype(np.float32)

                    # --- sample + filter grasps ----------------------------
                    key, k2 = jax.random.split(key)
                    n_sub = min(len(pts), 512)
                    ids = rng.choice(len(pts), n_sub, replace=False)
                    poses_c, valid_c, fstats = cone.sample_grasps(
                        k2, pts[ids], nrm[ids], background_cloud=bg[:4096],
                        background_mask=np.ones(min(len(bg), 4096), bool),
                        cam_in_world=cam_in_base, filter_ik=True, chunk=128,
                        adjust_depth=True)
                    cand = [np.asarray(poses_c)[np.asarray(valid_c)]]
                    prov = [np.zeros(len(cand[0]), np.int32)]  # 0=cone 1=nocs
                    mlog.event("filter", round=rnd, attempt=attempt, seg=int(sid),
                               n_valid=int(np.asarray(valid_c).sum()),
                               **{k: int(v) for k, v in fstats.items()})
                    if nocs_sampler is not None:
                        poses_n, valid_n, _ = nocs_sampler.sample_grasps(
                            nocs_pose=jnp.asarray(nocs_pose),
                            symmetry_tfs=jnp.asarray(sym),
                            background_cloud=bg[:4096],
                            background_mask=np.ones(min(len(bg), 4096), bool),
                            collision_cloud=pts[ids],
                            collision_mask=np.ones(n_sub, bool),
                            cam_in_world=cam_in_base, filter_ik=True, chunk=128,
                            adjust_depth=True)
                        cand.append(np.asarray(poses_n)[np.asarray(valid_n)])
                        prov.append(np.ones(len(cand[1]), np.int32))
                    grasps_cam = (np.concatenate(cand) if any(len(c) for c in cand)
                                  else np.zeros((0, 4, 4)))
                    grasp_prov = (np.concatenate(prov) if len(grasps_cam)
                                  else np.zeros(0, np.int32))
                    if len(grasps_cam):
                        found = (m, target, pts, nrm, nocs_pose, grasps_cam,
                                 grasp_prov)
                        break
                if found is not None:
                    break
                if learned_seg and verbose:
                    print(f"round {rnd} attempt {attempt}: no candidates at "
                          f"bandwidth x{bw_scale} ({len(seg_ids)} segments)")
            if found is None:
                if verbose:
                    print(f"round {rnd} attempt {attempt}: no grasp candidates"
                          f" on any segment at any bandwidth")
                break
            m, target, pts, nrm, nocs_pose, grasps_cam, grasp_prov = found
            if len(grasps_cam) > 128:
                sel = rng.choice(len(grasps_cam), 128, replace=False)
                grasps_cam = grasps_cam[sel]
                grasp_prov = grasp_prov[sel]

            # --- scores -----------------------------------------------------
            if canonical is not None and canonical["canonical_affordance"].any():
                p_T_given_G = grasp_affordance(canonical, nocs_pose, grasps_cam,
                                               width=0.012, spec=spec)
            else:
                # NO affordance codebook -> the run is TASK-BLIND: P(T|G)=1
                # makes the p_T_given_G_thres gate a no-op.  Never silent.
                if not globals().get("_WARNED_TASK_BLIND", False):
                    globals()["_WARNED_TASK_BLIND"] = True
                    print("WARNING: canonical has no affordance codebook — "
                          "P(T|G) fixed at 1.0; grasp selection is TASK-BLIND "
                          "(rebuild canonicals via pipelines.make_canonical "
                          "with dataset/affordance/* present)")
                p_T_given_G = np.ones(len(grasps_cam), np.float32)
            if predicters and "grasp" in predicters:
                _, _, dist = predicters["grasp"].predict_batch(pts, nrm, grasps_cam)
                p_G = predicters["grasp"].expected_quality(dist)
            else:
                # analytic fallback: Ferrari-Canny wrench quality on the
                # finger-contact model (grasp.quality) — the ranking the
                # reference gets from its trained quality net
                from ..grasp.quality import parallel_jaw_quality
                q = parallel_jaw_quality(jnp.asarray(pts), jnp.asarray(nrm),
                                         jnp.asarray(grasps_cam), spec)
                q = np.asarray(q)
                p_G = np.clip(q / 0.3, 0.0, 1.0).astype(np.float32)
            p_T_G = p_T_given_G * p_G

            ok = ((p_G >= cfg_run.get("p_G_thres", 0.5))
                  & (p_T_given_G >= cfg_run.get("p_T_given_G_thres", 0.5))
                  & (p_T_G >= cfg_run.get("p_T_G_thres", 0.1)))
            if not ok.any():
                ok = p_T_G >= 0  # fall back to best-effort pick (keep clearing)
            # threshold-passing candidates first, then best-effort rest
            # (keep clearing the bin even when scores are uniformly low).
            # Engagement depth breaks near-ties in p(T,G) — tip-engagement
            # holds slip under gravity (p_T_G saturates at 1.0 in oracle
            # mode, so without this the order among good grasps is arbitrary)
            from ..grasp.filter import engagement_depth
            eng = np.asarray(engagement_depth(jnp.asarray(pts),
                                              jnp.asarray(grasps_cam), spec))
            # geometric viability OUTRANKS the scores: a grasp whose captured
            # surface sits < ~3.6 mm inside the fingertip plane closes on air
            # whatever its p(T,G) says (the init_bite end of the reference's
            # depth sweep generates such hover candidates by design,
            # common.cpp:142-144; the reference relies on its quality net to
            # kill them — ours go to the best-effort tail deterministically)
            viable = eng >= 0.08
            srt = np.lexsort((-eng, -np.round(p_T_G, 2), ~viable))
            ok = ok & viable
            order = [i for i in srt if ok[i]] + [i for i in srt if not ok[i]]

            # --- arm: IK + RRT-connect to the pregrasp (reference move_arm,
            # env.py:140 — iterate candidates until one is reachable AND
            # plannable, run_grasp_simulation.py:332-368) -------------------
            pick = None
            pick_plan = None
            if use_arm:
                # target points excluded: the wrist/tool necessarily comes
                # within capsule radius of the object it grasps (the
                # reference disables target collision via the attachment)
                obs_cam = xyz[bg_m]
                if len(obs_cam) > 1024:
                    obs_cam = obs_cam[rng.choice(len(obs_cam), 1024, replace=False)]
                obs_base = obs_cam @ np.asarray(cam_in_base)[:3, :3].T \
                    + np.asarray(cam_in_base)[:3, 3]
                # fixture is an RRT obstacle too (out of camera frame)
                obs_base = np.concatenate([obs_base, fix_pts_base])
                # floor in BASE frame: bin floor is ~0.052 below the base
                rrt = planner.RRTConnect(obs_base.astype(np.float32),
                                         floor_z=-0.04, seed=seed)
                n_ik_fail = n_plan_fail = 0
                pick_plan = None
                for i in order[:12]:
                    g_base = (np.linalg.inv(base_in_world) @ cam
                              @ grasps_cam[i]).astype(np.float32)
                    # plan to the PREGRASP (10 cm back along the approach);
                    # the grasp itself is reached by the cartesian descent
                    # (move_arm to pregrasp + move_arm_catesian, env.py:140,201)
                    pre = g_base.copy()
                    pre[:3, 3] -= 0.10 * pre[:3, 0]
                    ee_pre = pre @ np.asarray(gripper.ee_in_grasp)
                    ee_goal = g_base @ np.asarray(gripper.ee_in_grasp)
                    q_pre, found_pre = iiwa.ik_best(jnp.asarray(ee_pre))
                    _, found_g = iiwa.ik_best(jnp.asarray(ee_goal))
                    if not (bool(found_pre) and bool(found_g)):
                        n_ik_fail += 1
                        continue
                    descent = np.stack([ee_pre * (1 - a) + ee_goal * a
                                        for a in np.linspace(0, 1, 5)])
                    qs_d, ok_d = planner.plan_cartesian_waypoints(
                        descent, q_seed=np.asarray(q_pre))
                    if not ok_d:
                        n_ik_fail += 1
                        continue
                    # straight-up lift waypoints (the reference lifts via
                    # move_arm after the close, :369-373)
                    ee_lift = ee_goal.copy()
                    ee_lift[:3, 3] += [0.0, 0.0, LIFT_HEIGHT]
                    lift_poses = np.stack([ee_goal * (1 - a) + ee_lift * a
                                           for a in np.linspace(0, 1, 5)])
                    qs_l, ok_l = planner.plan_cartesian_waypoints(
                        lift_poses, q_seed=qs_d[-1])
                    if not ok_l:
                        n_ik_fail += 1
                        continue
                    path = rrt.plan(Q_HOME, np.asarray(q_pre), max_iter=500)
                    if path is not None:
                        pick = i
                        pick_plan = (np.stack(path), qs_d, qs_l)
                        dbg_gate = {"ee_goal": ee_goal, "q_grasp": qs_d[-1],
                                    "g_base": g_base}
                        break
                    n_plan_fail += 1
                if pick is None:
                    mlog.event("plan_fail", round=rnd, attempt=attempt,
                               n_candidates=len(order), n_ik_fail=n_ik_fail,
                               n_plan_fail=n_plan_fail)
                    if verbose:
                        print(f"round {rnd} attempt {attempt}: no reachable/"
                              f"plannable grasp among {min(len(order), 12)} "
                              f"(ik/descent fails {n_ik_fail}, rrt fails {n_plan_fail})")
                    break
            else:
                pick = order[0]
            grasp_cam = grasps_cam[pick]
            if learned_seg:
                new_t = rebind_target_to_channel(
                    xyz, np.asarray(seg_body), grasp_cam, target, active,
                    spec, n_objects)
                if new_t != target:
                    if verbose:
                        print(f"    target rebind {target} -> {new_t} "
                              f"(grasp channel majority)")
                    target = new_t
            grasp_world = jnp.asarray((cam @ grasp_cam).astype(np.float32))

            # --- execute pick ----------------------------------------------
            counters.num_attempts += 1
            disturb = 0.0
            if use_arm and arm_exec and pick_plan is not None:
                # arm-executed pick: the planned RRT path + Cartesian descent
                # are STEPPED in the scene (reference Command.execute,
                # kuka_primitives.py:172) — pile disturbance is simulated
                path, qs_d, qs_l = pick_plan
                app = np.concatenate([
                    simarm.resample_traj(path, N_APP - 30),
                    simarm.resample_traj(qs_d, 30)])
                q_grasp = app[-1]
                sched = np.concatenate([
                    app,
                    np.repeat(q_grasp[None], CLOSE_STEPS + LIFT_STEPS, axis=0),
                    simarm.resample_traj(qs_l, N_LIFT_A)]).astype(np.float32)
                if arm_dynamics:
                    # articulated-dynamics tracking of the schedule
                    # (kin/dynamics.py): colliders follow the achieved
                    # trajectory, not the ideal one
                    sched = simarm.dynamicize_schedule(sched)
                picked, state_after, ob_in_grasp, w_f, c_f, disturb = \
                    simarm.execute_pick_arm(
                        lib, state, params, env_bin, jnp.int32(target),
                        jnp.asarray(sched), jnp.asarray(base_in_world),
                        jnp.asarray(gripper.ee_in_grasp), spec,
                        n_app=N_APP, n_close=CLOSE_STEPS, n_hold=LIFT_STEPS,
                        narrowphase=geom)
                disturb = float(disturb)
                q_after_pick = sched[-1]
            else:
                # floating-gripper pick (comparison baseline / no-arm mode):
                # target is traced (dynamic index) — one compile serves every
                # target/attempt instead of one per pile slot
                picked, state_after, ob_in_grasp, w_f = _execute_pick_jit(
                    lib, state, params, env_bin, jnp.int32(target), grasp_world,
                    spec, geom)
                q_after_pick = None
            picked = bool(picked)
            if picked:
                counters.num_stable_grasp += 1
                if use_arm and arm_exec and q_after_pick is not None:
                    placed, state_after = _place_with_arm(
                        lib, state_after, params, env_bin, target,
                        np.asarray(ob_in_grasp), w_f, q_after_pick,
                        base_in_world, gripper, T_fix, class_name, sym,
                        obs_base, seed, spec, verbose, narrowphase=geom,
                        arm_dynamics=arm_dynamics, grip_center=float(c_f))
                else:
                    # fixture-world place (floating baseline): the ACTUAL
                    # in-hand pose reflects pick slip; the COMMANDED one is
                    # where the controller believes it closed (pre-pick
                    # object pose vs the commanded grasp) — place_and_drop
                    # steers by the belief and drops the reality
                    grasp_in_ob = tf.pose_inverse(jnp.asarray(ob_in_grasp))
                    T_ob_pre = tf.pose_from_qt(state.quat[target],
                                               state.pos[target])
                    cmd = tf.pose_inverse(T_ob_pre) @ grasp_world
                    placed = bool(es.place_and_drop(
                        lib, shape_id[target], jnp.int32(fixture_idx),
                        scale[target], grasp_in_ob, class_name, w_f, spec,
                        narrowphase=geom, grasp_in_ob_cmd=cmd))
                mlog.event("place", round=rnd, attempt=attempt, placed=placed,
                           slip=float(np.linalg.norm(
                               np.asarray(ob_in_grasp)[:3, 3] - [0.02, 0, 0])))
                if placed:
                    counters.num_task_grasp_succ += 1
            # remove the attempted object from the pile (reference removes
            # placed objects; failed picks scatter — we deactivate either way
            # after a pick attempt touched it)
            state = state_after.replace(
                active=state_after.active.at[target].set(~jnp.bool_(picked)))
            state = keep_fixture(
                env_pile.settle_fixed(state, params, lib, env_bin, pile_cfg, 150,
                                      narrowphase=geom))
            mlog.event("attempt", round=rnd, attempt=attempt, target=target,
                       n_candidates=len(grasps_cam), picked=picked,
                       placed=bool(picked and placed),
                       disturbance=float(disturb),
                       p_G=float(p_G[pick]), p_T_given_G=float(p_T_given_G[pick]),
                       p_T_G=float(p_T_G[pick]))
            if verbose:
                print(f"round {rnd} attempt {attempt}: target {target} "
                      f"picked={picked} placed={placed if picked else '-'} "
                      f"p_T_G={p_T_G[pick]:.2f}")
                if not picked:
                    # failed-pick post-mortem: which hold-gate term broke
                    # (execute_pick_arm's disp/closed/centered, arm.py:203-208)
                    t = np.asarray(ob_in_grasp)[:3, 3]
                    print(f"    pick diag: width {float(w_f)*1e3:.1f} mm, "
                          f"ob_in_grasp t [{t[0]*1e3:.1f} {t[1]*1e3:.1f} "
                          f"{t[2]*1e3:.1f}] mm, disturb {float(disturb)*1e3:.1f} mm")
            import os as _os
            if _os.environ.get("CATGRASP_PICK_DEBUG"):
                # offline post-mortem dump: every candidate with provenance +
                # ordering + the chosen plan's FK-vs-goal error
                dd = {"pts": pts, "nrm": nrm, "grasps_cam": grasps_cam,
                      "prov": grasp_prov, "order": np.asarray(order),
                      "ok": ok, "p_G": p_G, "p_T_given_G": p_T_given_G,
                      "eng": eng, "pick": pick, "target": target,
                      "picked": picked, "w_f": np.asarray(w_f),
                      "ob_in_grasp": np.asarray(ob_in_grasp),
                      "pos": np.asarray(state_after.pos),
                      "quat": np.asarray(state_after.quat),
                      "nocs_pose": nocs_pose, "cam": cam,
                      "base_in_world": base_in_world}
                if use_arm and "dbg_gate" in dir():
                    fk_err = np.linalg.norm(
                        np.asarray(iiwa.fk(jnp.asarray(dbg_gate["q_grasp"])))[:3, 3]
                        - np.asarray(dbg_gate["ee_goal"])[:3, 3])
                    dd.update(ee_goal=dbg_gate["ee_goal"], fk_err=fk_err,
                              g_base=dbg_gate["g_base"])
                np.savez(f"/tmp/pickdbg_{rnd}_{attempt}.npz", **dd)

    mlog.event("tally", **counters.__dict__)
    mlog.close()
    return counters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--class_name", default=None)
    ap.add_argument("--n_rounds", type=int, default=2)
    ap.add_argument("--n_objects", type=int, default=5)
    ap.add_argument("--canonical", default=None)
    ap.add_argument("--artifacts", default=None,
                    help="artifact dir with nunocs/grasp/seg checkpoints "
                         "(enables learned perception; use with --oracle 0)")
    ap.add_argument("--oracle", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--metrics", default=None, help="JSONL metrics path")
    ap.add_argument("--use_arm", type=int, default=1,
                    help="gate grasps on IK reachability + RRT plannability")
    ap.add_argument("--arm_exec", type=int, default=1,
                    help="step the planned arm motion in the scene (pick AND "
                         "place through the arm); 0 = floating-gripper baseline")
    ap.add_argument("--instance", type=int, default=None,
                    help="pin the pile to one test instance at scale 1 "
                         "(reference ob_name protocol; default from "
                         "config_run.yml instance_index; -1 = mixed "
                         "instances at jittered scales)")
    ap.add_argument("--arm_dynamics", type=int, default=0,
                    help="track arm schedules through articulated iiwa "
                         "dynamics (kin/dynamics.py) before execution")
    ap.add_argument("--obj_path", default=None,
                    help="external watertight .obj to evaluate instead of the "
                         "procedural instances (baked-SDF physics + grid "
                         "raymarch; the reference's data/object_models path)")
    args = ap.parse_args()

    cfg_run = load_config("config_run.yml")
    class_name = args.class_name or cfg_run.get("class_name", "nut")
    canonical = dict(np.load(args.canonical)) if args.canonical else None
    predicters = None
    if args.artifacts:
        from ..predict.artifacts import load_predicters
        predicters = load_predicters(args.artifacts, class_name)
        print(f"loaded predicters: {sorted(predicters)}")
    c = simulate_grasp_rounds(class_name, args.n_rounds, args.n_objects,
                              cfg_run, oracle=bool(args.oracle),
                              canonical=canonical, predicters=predicters,
                              seed=args.seed, metrics_path=args.metrics,
                              use_arm=bool(args.use_arm),
                              arm_exec=bool(args.arm_exec),
                              instance=args.instance, obj_path=args.obj_path,
                              arm_dynamics=bool(args.arm_dynamics))
    print(f"num_objects={c.num_objects} num_attempts={c.num_attempts} "
          f"num_stable_grasp={c.num_stable_grasp} "
          f"num_task_grasp_succ={c.num_task_grasp_succ}")


if __name__ == "__main__":
    main()
