"""Analytic CSG signed-distance shapes — the gather-free TPU narrowphase.

3-D grid SDF lookups compile to XLA gathers, which TPUs execute as
serialized dynamic slices — catastrophic inside a vmapped contact solver.
But every CaTGrasp category object is a small CSG composition of convex
primitives (hex nut = hex prism minus cylinder; screw = cylinder plus hex
head; connector = box plus pins), so the engine evaluates signed distance
*analytically*: a fixed number of slots, each a primitive (box / z-cylinder
/ z-hex-prism) combined by union or subtraction.  Pure vectorized
arithmetic on the VPU — no memory indirection at all.  Contact normals come
from ``jax.grad`` of the same evaluator.

Grid SDFs (:mod:`catgrasp_tpu.geom.sdf`) remain the path for arbitrary
user meshes and for parity validation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# primitive type codes
NONE, BOX, CYLINDER, HEXPRISM = 0, 1, 2, 3
MAX_SLOTS = 4
COS30 = float(np.cos(np.pi / 6))


@struct.dataclass
class CsgShape:
    """Fixed-slot CSG tree (evaluated left to right).

    types (S,) int32; ops (S,) int32 (+1 union, -1 subtract);
    params (S, 3): box half-extents / (radius, half-height, _);
    offsets (S, 3): primitive center in shape frame.
    Stacks across shapes: all fields gain a leading K axis in ShapeLib.
    """

    types: jnp.ndarray
    ops: jnp.ndarray
    params: jnp.ndarray
    offsets: jnp.ndarray


def _safe_norm(v):
    return jnp.sqrt(jnp.sum(v * v, axis=-1) + 1e-18)


def _sd_box(p, half):
    q = jnp.abs(p) - half
    return _safe_norm(jnp.maximum(q, 0.0)) + jnp.minimum(jnp.max(q, axis=-1), 0.0)


def _sd_cylinder(p, r, hh):
    dxy = jnp.sqrt(p[..., 0] ** 2 + p[..., 1] ** 2 + 1e-18) - r
    dz = jnp.abs(p[..., 2]) - hh
    q = jnp.stack([dxy, dz], axis=-1)
    return _safe_norm(jnp.maximum(q, 0.0)) + jnp.minimum(jnp.max(q, axis=-1), 0.0)


def _sd_hexprism(p, apothem, hh):
    """Hexagonal prism, z axis, vertex on +x (circumradius = apothem/cos30).
    Inigo Quilez's exact formulation."""
    kx, ky, kz = -COS30, 0.5, 0.57735
    px = jnp.abs(p[..., 0])
    py = jnp.abs(p[..., 1])
    pz = jnp.abs(p[..., 2])
    dot2 = jnp.minimum(kx * px + ky * py, 0.0)
    px = px - 2.0 * dot2 * kx
    py = py - 2.0 * dot2 * ky
    lx = px - jnp.clip(px, -kz * apothem, kz * apothem)
    ly = py - apothem
    dx = jnp.sqrt(lx * lx + ly * ly + 1e-18) * jnp.sign(py - apothem)
    dz = pz - hh
    q = jnp.stack([dx, dz], axis=-1)
    return _safe_norm(jnp.maximum(q, 0.0)) + jnp.minimum(jnp.max(q, axis=-1), 0.0)


def csg_sdf(shape: CsgShape, pts: jnp.ndarray) -> jnp.ndarray:
    """Signed distance of points (..., 3) to a CsgShape — branch-free."""
    d = jnp.full(pts.shape[:-1], 1e9)
    for s in range(shape.types.shape[0]):
        p = pts - shape.offsets[s]
        t = shape.types[s]
        db = _sd_box(p, shape.params[s])
        dc = _sd_cylinder(p, shape.params[s, 0], shape.params[s, 1])
        dh = _sd_hexprism(p, shape.params[s, 0], shape.params[s, 1])
        ds = jnp.where(t == BOX, db, jnp.where(t == CYLINDER, dc, dh))
        d_new = jnp.where(shape.ops[s] > 0, jnp.minimum(d, ds), jnp.maximum(d, -ds))
        d = jnp.where(t == NONE, d, d_new)
    return d


def csg_sdf_and_normal(shape: CsgShape, pts: jnp.ndarray):
    """(φ, outward normal) via autodiff of the evaluator."""
    flat = pts.reshape(-1, 3)

    def f(p):
        return csg_sdf(shape, p[None])[0]

    phi, n = jax.vmap(jax.value_and_grad(f))(flat)
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-9)
    return phi.reshape(pts.shape[:-1]), n.reshape(pts.shape)


# ---------------------------------------------------------------------------
# Builders matching geom.primitives' procedural meshes
# ---------------------------------------------------------------------------


def _pad(types, ops, params, offsets) -> CsgShape:
    S = MAX_SLOTS
    def pad(a, fill):
        a = np.asarray(a, np.float32 if np.asarray(a).dtype.kind == "f" else np.int32)
        out = np.full((S,) + a.shape[1:], fill, dtype=a.dtype)
        out[: len(a)] = a
        return out
    return CsgShape(
        types=jnp.asarray(pad(np.array(types, np.int32), NONE)),
        ops=jnp.asarray(pad(np.array(ops, np.int32), 1)),
        params=jnp.asarray(pad(np.array(params, np.float32), 0.0)),
        offsets=jnp.asarray(pad(np.array(offsets, np.float32), 0.0)),
    )


def csg_hex_nut(outer_r=0.012, inner_r=0.006, height=0.008) -> CsgShape:
    return _pad(
        [HEXPRISM, CYLINDER],
        [1, -1],
        [[outer_r * COS30, height / 2, 0], [inner_r, height, 0]],
        [[0, 0, 0], [0, 0, 0]],
    )


def csg_screw(shaft_r=0.004, shaft_len=0.03, head_r=0.007, head_h=0.005) -> CsgShape:
    return _pad(
        [CYLINDER, HEXPRISM],
        [1, 1],
        [[shaft_r, shaft_len / 2, 0], [head_r * COS30, head_h / 2, 0]],
        [[0, 0, -shaft_len / 2], [0, 0, head_h / 2]],
    )


def csg_hnm(body=(0.016, 0.010, 0.030), pin_r=0.0025, pin_len=0.012, n_pin=2) -> CsgShape:
    types = [BOX]
    ops = [1]
    params = [[body[0] / 2, body[1] / 2, body[2] / 2]]
    offsets = [[0, 0, 0]]
    xs = np.linspace(-body[0] / 4, body[0] / 4, n_pin)
    for x in xs[: MAX_SLOTS - 1]:
        types.append(CYLINDER)
        ops.append(1)
        params.append([pin_r, pin_len / 2, 0])
        offsets.append([x, 0, body[2] / 2 + pin_len / 2 - 1e-4])
    return _pad(types, ops, params, offsets)


def csg_box(extents, center=(0, 0, 0)) -> CsgShape:
    e = np.asarray(extents) / 2
    return _pad([BOX], [1], [list(e)], [list(center)])


def csg_cylinder(radius, height, center=(0, 0, 0)) -> CsgShape:
    return _pad([CYLINDER], [1], [[radius, height / 2, 0]], [list(center)])


def csg_place_fixture(class_name: str) -> CsgShape:
    """Analytic placement fixtures matching ``geom.primitives.place_fixture``
    (the ``*_place.obj`` analogs): nut -> base plate + peg; screw -> block
    with a vertical hole; hnm -> square socket."""
    if class_name == "nut":
        return _pad(
            [BOX, CYLINDER],
            [1, 1],
            [[0.03, 0.03, 0.005], [0.0025, 0.03, 0]],
            [[0, 0, 0.005], [0, 0, 0.04]],
        )
    if class_name == "screw":
        return _pad(
            [CYLINDER, CYLINDER],
            [1, -1],
            [[0.02, 0.01, 0], [0.0065, 0.02, 0]],
            [[0, 0, 0.01], [0, 0, 0.01]],
        )
    if class_name == "hnm":
        hw = 0.025 * float(np.cos(np.pi / 4))
        return _pad(
            [BOX, CYLINDER],
            [1, -1],
            [[hw, hw, 0.0125], [0.014, 0.03, 0]],
            [[0, 0, 0.0125], [0, 0, 0.0125]],
        )
    raise ValueError(class_name)


_CSG_BUILDERS = {"nut": csg_hex_nut, "screw": csg_screw, "hnm": csg_hnm}


def make_csg_instance(class_name: str, split: str = "train", index: int = 0) -> CsgShape:
    """CSG shape matching ``geom.primitives.make_instance`` parameters."""
    from .primitives import _SPLITS

    params = _SPLITS[(class_name, split)]
    kw = dict(params[index % len(params)])
    if class_name == "hnm" and "body" in kw:
        return csg_hnm(**kw)
    return _CSG_BUILDERS[class_name](**kw)


def stack_shapes(shapes: list[CsgShape]) -> CsgShape:
    """Stack K shapes into one batched CsgShape (leading K axis)."""
    return CsgShape(
        types=jnp.stack([s.types for s in shapes]),
        ops=jnp.stack([s.ops for s in shapes]),
        params=jnp.stack([s.params for s in shapes]),
        offsets=jnp.stack([s.offsets for s in shapes]),
    )


def select_shape(stacked: CsgShape, idx) -> CsgShape:
    return CsgShape(
        types=stacked.types[idx],
        ops=stacked.ops[idx],
        params=stacked.params[idx],
        offsets=stacked.offsets[idx],
    )
