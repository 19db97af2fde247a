"""Gripper model — parameters, frames, meshes, and collision geometry.

Replaces ``dexnet/grasping/gripper.py`` (``RobotGripper``).  The reference
loads ``gripper_air_tight.obj`` / ``_enclosed_air_tight.obj`` meshes plus a
``T_grasp_gripper`` transform from disk; here both meshes and their analytic
box decompositions come from one parametric model
(:func:`catgrasp_tpu.geom.primitives.parallel_jaw_gripper`), so the gripper
is usable simultaneously by
  * the contact engine (kinematic finger boxes, sim.env_grasp),
  * the grasp filter (open-body boxes + enclosed swept box, grasp.filter),
  * mesh export / visualization.

Frames (matching the reference convention, ``gripper.py:52-53``):
  grasp frame: +x = approach (palm -> fingertips), ±y = closing axis.
  gripper base frame: palm back plane; ``T_grasp_gripper`` maps between.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..geom.mesh import TriMesh
from ..geom.primitives import parallel_jaw_gripper
from ..sim.env_grasp import GripperSpec, finger_boxes


@dataclass
class Gripper:
    spec: GripperSpec
    mesh_open: TriMesh  # full open gripper, grasp frame
    mesh_enclosed: TriMesh  # swept closing volume, grasp frame
    params: dict
    # transform from flange (arm end-effector) to grasp frame; the arm holds
    # the gripper so that flange +z == grasp +x, offset behind the palm.
    ee_in_grasp: np.ndarray = field(default=None)

    @property
    def hand_depth(self) -> float:
        return self.spec.finger_len

    @property
    def init_bite(self) -> float:
        return self.spec.init_bite

    @property
    def max_width(self) -> float:
        return self.spec.max_width

    def get_grasp_pose_in_gripper_base(self) -> np.ndarray:
        """Grasp frame expressed in the gripper base (palm back) frame —
        parity with ``RobotGripper.get_grasp_pose_in_gripper_base``
        (``gripper.py:78-82``)."""
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = self.spec.palm_depth  # grasp origin sits palm_depth ahead
        return T

    def open_boxes(self):
        """(centers (3,3), halves (3,3)) of the open gripper's analytic
        boxes in the grasp frame: [finger+, finger-, palm]."""
        c, h = finger_boxes(jnp.asarray(self.spec.max_width), self.spec)
        return c, h

    def enclosed_box(self):
        """(center (3,), half (3,)) of the swept closing volume between the
        fingers (the ``gripper_enclosed`` test volume)."""
        s = self.spec
        center = jnp.array([s.finger_len / 2, 0.0, 0.0])
        half = jnp.array([s.finger_len / 2, s.max_width / 2 + s.finger_thickness, s.finger_depth / 2])
        return center, half

    @staticmethod
    def default(**overrides) -> "Gripper":
        spec = GripperSpec(**overrides) if overrides else GripperSpec()
        mesh_open, mesh_enclosed, params = parallel_jaw_gripper(
            max_width=spec.max_width, finger_len=spec.finger_len,
            finger_thickness=spec.finger_thickness, finger_depth=spec.finger_depth,
            palm_depth=spec.palm_depth,
        )
        ee = np.eye(4, dtype=np.float32)
        # flange behind the palm looking along +x of the grasp frame:
        # R maps flange z->grasp x, flange x->grasp y, flange y->grasp z
        ee[:3, :3] = np.array([[0, 0, 1], [1, 0, 0], [0, 1, 0]], dtype=np.float32).T
        # flange->finger-root distance: Robotiq Hand-E body (~0.10 m) +
        # coupling; a too-short offset sinks the wrist capsule into the pile
        # at grasp poses and makes every RRT goal collide
        ee[:3, 3] = [-spec.palm_depth - 0.09, 0, 0]
        return Gripper(spec=spec, mesh_open=mesh_open, mesh_enclosed=mesh_enclosed,
                       params=params, ee_in_grasp=ee)
