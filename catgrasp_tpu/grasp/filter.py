"""Batched grasp-pose filter — the TPU ``filterGraspPose``.

The reference's hottest CPU loop (``my_cpp/common.cpp:156-321``) runs, per
candidate pose x symmetry: approach-direction gate, ikfast gate, FCL
open-gripper-vs-octree collision, closed-gripper-swept-volume collision,
with a ±1–3 mm lateral "adjust_collision_pose" search — OpenMP over poses.

TPU redesign: flip the collision direction.  Instead of a gripper *mesh*
against a point-cloud *octree*, transform the cloud into each candidate's
grasp frame (one big batched matmul on the MXU) and test the points against
the gripper's *analytic boxes* (VPU) — no trees, no gathers, no
variable-size anything.  The ±y lateral adjust is evaluated for all 7
offsets in the same tensor op (only the y-interval test depends on the
offset), picking the first collision-free one in the reference's search
order (0, +1, -1, +2, -2, +3, -3 mm; ``common.cpp:253-287``).

All stages produce masks over a fixed (G*S) candidate axis; callers
compact on host.  Rejection counters match the reference's verbose output
(``common.cpp:316-319``) for parity testing.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import transforms as tf
from ..kin import iiwa
from ..ops import collision as pallas_collision
from ..sim.env_grasp import GripperSpec, closing_channel_mask, finger_boxes

ADJUST_OFFSETS = np.array([0.0, 1e-3, -1e-3, 2e-3, -2e-3, 3e-3, -3e-3], dtype=np.float32)
# approach-depth adjust extension (deepest collision-free engagement wins):
# the reference adjusts laterally only (``common.cpp:253-287``); tip-
# engagement holds that slip under gravity were the dominant pick failure,
# and pushing the grasp deeper along the approach (when free) is the fix
DEPTH_OFFSETS = np.array([0.0, 1e-3, 2e-3, 3e-3], dtype=np.float32)


def _static_open_boxes(spec: GripperSpec, depth: float = 0.0) -> tuple:
    """Open-gripper finger/palm boxes as compile-time constants (the spec is
    a static dataclass, so ``finger_boxes`` at max width is pure numbers;
    numpy mirror so this stays concrete under an outer jit trace).

    ``depth``: testing the grasp pushed deeper by d along +x equals testing
    the original-frame cloud against boxes shifted +d in x."""
    t = spec.finger_thickness
    cy = spec.max_width / 2 + t / 2
    centers = ((spec.finger_len / 2 + depth, cy, 0.0),
               (spec.finger_len / 2 + depth, -cy, 0.0),
               (-spec.palm_depth / 2 + depth, 0.0, 0.0))
    halves = ((spec.finger_len / 2, t / 2, spec.finger_depth / 2),
              (spec.finger_len / 2, t / 2, spec.finger_depth / 2),
              (spec.palm_depth / 2, spec.max_width / 2 + t + 0.01,
               spec.finger_depth / 2 + 0.01))
    return pallas_collision.as_static_boxes(centers, halves)


def _static_enclosed_box(spec: GripperSpec, depth: float = 0.0) -> tuple:
    """Between-fingers closing volume (the reference's ``gripper_enclosed``
    mesh test, ``common.cpp:241-249``): anything NON-target inside the air
    gap the fingers close through gets squeezed -> reject.  Bounded by the
    finger INNER faces (max_width/2) — including the finger bodies here
    would veto valid grasps whenever a neighbor sits beside the closed
    finger's resting position."""
    center = ((spec.finger_len / 2 + depth, 0.0, 0.0),)
    half = ((spec.finger_len / 2,
             spec.max_width / 2,
             spec.finger_depth / 2),)
    return pallas_collision.as_static_boxes(center, half)


def _hits_per_offset(pts: jnp.ndarray, centers: jnp.ndarray, halves: jnp.ndarray,
                     mask: jnp.ndarray, offsets: jnp.ndarray, margin: float) -> jnp.ndarray:
    """For each lateral grasp offset a: does ANY masked point fall inside any
    box when the gripper is shifted by offsets[a] along +y?  -> (A,) bool.

    pts (C,3) in grasp frame; centers/halves (K,3).  Only the y test depends
    on the offset, so the xz mask is computed once.
    """
    rel = pts[:, None, :] - centers  # (C,K,3)
    q_x = jnp.abs(rel[..., 0]) - halves[:, 0]
    q_z = jnp.abs(rel[..., 2]) - halves[:, 2]
    ok_xz = (q_x < margin) & (q_z < margin) & mask[:, None]  # (C,K)
    y = rel[..., 1]  # (C,K)
    # gripper shifted +off ⇒ point relative y decreases by off
    q_y = jnp.abs(y[..., None] - offsets) - halves[:, 1, None]  # (C,K,A)
    hit = ok_xz[..., None] & (q_y < margin)
    return jnp.any(hit, axis=(0, 1))  # (A,)


@partial(jax.jit, static_argnames=("spec", "filter_approach", "filter_ik", "adjust", "adjust_depth", "margin", "n_psi", "chunk", "backend"))
def filter_grasp_poses(
    grasp_poses: jnp.ndarray,  # (G, 4, 4) in canonical frame
    symmetry_tfs: jnp.ndarray,  # (S, 4, 4)
    nocs_pose: jnp.ndarray,  # (4, 4) canonical->camera (may carry scale)
    cam_in_world: jnp.ndarray,  # (4, 4)
    ee_in_grasp: jnp.ndarray,  # (4, 4)
    collision_cloud: jnp.ndarray,  # (C1, 3) cam frame — open-gripper test
    background_cloud: jnp.ndarray,  # (C2, 3) cam frame — enclosed-volume test
    collision_mask: jnp.ndarray,  # (C1,) bool valid points
    background_mask: jnp.ndarray,  # (C2,) bool
    spec: GripperSpec = GripperSpec(),
    filter_approach: bool = True,
    filter_ik: bool = True,
    adjust: bool = True,
    adjust_depth: bool = False,  # extend the adjust search along approach +x
    margin: float = 5e-4,  # octree-resolution analog (grasp_sampler.py:213)
    n_psi: int = 16,
    chunk: int = 64,
    backend: str = "auto",  # "pallas" fused kernel | "xla" | "auto"
):
    """Returns (poses_out (G*S, 4, 4) in CAMERA frame, valid (G*S,), stats).

    Candidate layout: grasp-major, symmetry-minor — matching the reference's
    nested loop (``common.cpp:185-191``).
    """
    G = grasp_poses.shape[0]
    S = symmetry_tfs.shape[0]

    # --- symmetry expansion + frame normalization --------------------------
    T = jnp.einsum("sij,gjk->gsik", symmetry_tfs, grasp_poses)
    T = jnp.einsum("ij,gsjk->gsik", nocs_pose, T).reshape(G * S, 4, 4)
    # normalize rotation columns (nocs_pose may carry per-axis scale;
    # common.cpp:194-197)
    R = T[:, :3, :3]
    R = R / (jnp.linalg.norm(R, axis=1, keepdims=True) + 1e-12)
    T = T.at[:, :3, :3].set(R)

    valid = jnp.ones((G * S,), bool)
    stats = {}

    # --- approach direction faces camera (+z in cam frame) -----------------
    if filter_approach:
        approach_ok = T[:, 2, 0] >= 0.0  # z-component of approach column
        stats["n_approach_dir_rej"] = jnp.sum(valid & ~approach_ok)
        valid &= approach_ok
    else:
        stats["n_approach_dir_rej"] = jnp.zeros((), jnp.int32)

    # --- IK feasibility -----------------------------------------------------
    if filter_ik:
        ee_in_base = jnp.einsum("ij,njk,kl->nil", cam_in_world, T, ee_in_grasp)
        feas = iiwa.ik_feasible(ee_in_base, n_psi)
        stats["n_ik_rej"] = jnp.sum(valid & ~feas)
        valid &= feas
    else:
        stats["n_ik_rej"] = jnp.zeros((), jnp.int32)

    # --- collision: clouds in grasp frame vs analytic gripper boxes --------
    offsets = jnp.asarray(ADJUST_OFFSETS if adjust else ADJUST_OFFSETS[:1])
    depths = DEPTH_OFFSETS if adjust_depth else DEPTH_OFFSETS[:1]
    if backend == "auto":
        backend = "pallas"
    if backend == "pallas":
        # fused transform + box-test + OR-reduce on chip (ops/collision.py);
        # one kernel pair per static depth offset
        off_static = tuple(float(o) for o in
                           (ADJUST_OFFSETS if adjust else ADJUST_OFFSETS[:1]))
        interp = jax.default_backend() != "tpu"
        T_inv = pallas_collision.pose_inverse_batch(T)
        frees = []
        for d in depths:
            hit_open = pallas_collision.box_hits(
                T_inv, collision_cloud, collision_mask,
                _static_open_boxes(spec, float(d)), off_static, margin,
                interpret=interp)
            hit_enc = pallas_collision.box_hits(
                T_inv, background_cloud, background_mask,
                _static_enclosed_box(spec, float(d)), off_static, margin,
                interpret=interp)
            frees.append(~(hit_open | hit_enc))
        free = jnp.stack(frees, axis=1)  # (GS, D, A)
    else:
        enc_center0 = np.array([[spec.finger_len / 2, 0.0, 0.0]], np.float32)
        enc_half = jnp.array([[spec.finger_len / 2,
                               spec.max_width / 2,
                               spec.finger_depth / 2]])
        open_centers0, open_halves = finger_boxes(jnp.asarray(spec.max_width), spec)

        def collide_one(T_i):
            T_inv = tf.pose_inverse(T_i)
            pts_c = tf.transform_points(T_inv, collision_cloud)
            pts_b = tf.transform_points(T_inv, background_cloud)
            per_d = []
            for d in depths:
                dx = jnp.array([float(d), 0.0, 0.0])
                hit_open = _hits_per_offset(pts_c, open_centers0 + dx, open_halves,
                                            collision_mask, offsets, margin)
                hit_enc = _hits_per_offset(pts_b, jnp.asarray(enc_center0) + dx,
                                           enc_half, background_mask, offsets, margin)
                per_d.append(~(hit_open | hit_enc))
            return jnp.stack(per_d)  # (D, A) free per (depth, offset)

        free = jax.lax.map(collide_one, T, batch_size=chunk)  # (GS, D, A)

    # selection: deepest collision-free engagement wins; within a depth, the
    # reference's lateral search order (first free).  With adjust_depth off,
    # D == 1 and this reduces exactly to the reference semantics.
    D = free.shape[1]
    any_free_d = jnp.any(free, axis=-1)  # (GS, D)
    d_idx = (D - 1) - jnp.argmax(jnp.flip(any_free_d, axis=-1), axis=-1)
    oh_d = (jnp.arange(D)[None] == d_idx[:, None])  # one-hot, no gathers
    free_sel = jnp.sum(free * oh_d[..., None], axis=1) > 0  # (GS, A)
    any_free = jnp.any(free_sel, axis=-1)
    first = jnp.argmax(free_sel, axis=-1)  # first free offset in search order
    dy = offsets[first]
    dx = jnp.sum(jnp.asarray(depths) * oh_d, axis=-1)
    shift = T[:, :3, 1] * dy[:, None] + T[:, :3, 0] * dx[:, None]
    T = T.at[:, :3, 3].add(jnp.where(any_free[:, None], shift, 0.0))
    stats["n_collision_rej"] = jnp.sum(valid & ~any_free)
    valid &= any_free

    return T, valid, stats


def compact_valid(poses: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Host-side compaction of the masked candidate set."""
    return np.asarray(poses)[np.asarray(valid)]


@partial(jax.jit, static_argnames=("spec",))
def engagement_depth(points: jnp.ndarray, grasp_poses: jnp.ndarray,
                     spec: GripperSpec = GripperSpec()) -> jnp.ndarray:
    """How deeply each grasp engages the target: (K, 4, 4), (C, 3) -> (K,)
    in [0, 1].  0 = object only at the fingertip plane (tip-engagement
    holds slip under gravity), 1 = object reaches the finger roots.

    Used as a ranking tiebreak in the closed loop — the reference ranks by
    p(T,G) alone, which saturates in oracle mode and is blind to engagement.
    """
    fl = spec.finger_len
    if points.shape[0] < 3:
        # the robust min below needs >= 3 supporting points; with a 1-2
        # point cloud it would degrade to the 2nd/1st smallest and flying
        # pixels could fake engagement again (static shape: plain Python if)
        return jnp.zeros(grasp_poses.shape[0], points.dtype)

    def one(T):
        pts_g = tf.transform_points(tf.pose_inverse(T), points)
        in_chan = closing_channel_mask(pts_g, spec)
        x = jnp.where(in_chan, pts_g[:, 0], fl)
        # robust min: 3rd-smallest x, with out-of-channel slots pinned at fl.
        # Depth maps bleed at object edges (a pixel interpolated between
        # foreground and background lands mid-air); 1-2 such flying points
        # faked deep engagement on hover grasps, which then closed on air in
        # the learned loop.  Engagement therefore requires >= 3 supporting
        # points — fewer reads as depth 0.
        xs = jnp.sort(x)
        depth = fl - xs[min(2, x.shape[0] - 1)]
        return jnp.clip(depth / fl, 0.0, 1.0)

    return jax.vmap(one)(grasp_poses)
