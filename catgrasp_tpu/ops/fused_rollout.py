"""Fused Pallas rollout: the whole physics step pipeline in one kernel.

`engine.rollout` (narrowphase -> Jacobi solve -> integrate, scanned over
n_steps) emits dozens of XLA ops whose (B,N,P,M,3) intermediates round-trip
HBM every step — measured 22.9 ms per 50-step x 1024-scene call on v5e, of
which ~90% is contact-tensor traffic + materialization (the CSG flops alone
are ~0.1 ms).  This kernel keeps EVERYTHING resident in VMEM for the whole
rollout:

* **lanes = scenes**: every field is laid out (..., L=128) with the scene
  axis last, so each vector op processes 128 scenes — the vmap axis becomes
  the VPU lane axis and no physical (15,3)-shaped tiles ever exist.
* one grid program per 128-scene block; ``fori_loop`` over n_steps inside
  the kernel; state never leaves VMEM between steps.
* narrowphase once per step into bf16 VMEM slabs (phi, normal) + f32 K_n;
  the 4 Jacobi iterations re-read slabs instead of re-materializing
  (B,N,P,M,3) tensors from HBM.
* CSG evaluation is the same branch-free fixed-slot program as
  ``geom.csg.csg_sdf_and_normal`` but in component-unrolled per-lane form
  (shape params vary per scene, i.e. per lane): one analytic SDF+normal
  eval per collider; env boxes use the analytic box normal.

Numerical contract: the r5 ``engine.step`` algorithm — SPLIT-IMPULSE
Baumgarte (penetration recovery in a per-step pseudo-velocity channel that
moves positions and is discarded, so the bias never injects momentum; the
r4 bias-in-velocity scheme was the self-parity dt-sweep failure),
FRICTION_RELAX-scaled Coulomb friction, Jacobi contact-count averaging,
semi-implicit Euler, per-1/240s-step damping rescaled to dt.  Two r5
engine refinements are intentionally NOT mirrored, with the engine's own
justification (sim/engine.py:332-340): exact tangential effective mass and
the friction passivity guard exist for GRIP stability — this kernel
simulates free pile settling only (no grip colliders), where the mu*jn
cone clamp bounds the K_t ~= K_n friction mis-sizing.
Trajectories agree with ``engine.step`` to ~1e-2 m over 50 steps and to
matching settle statistics (``tests/test_fused_rollout.py``), which is
within the engine's own chaos horizon for pile dynamics — distributions,
not trajectories, are the parity target (SURVEY §7 "hard parts").
Production pile generation (sim/env_pile.py) runs the REAL engine; this
kernel is the throughput-benchmark path (bench.py).

Reference analog: the entire ``p.stepSimulation`` hot loop
(``pybullet_env/env.py:299-344``) including Bullet's C++ solver.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import transforms as tf
from ..geom.csg import BOX, CYLINDER, HEXPRISM, NONE, COS30
from .. import sim
from ..sim.types import SceneParams, SceneState, ShapeLib

LANES = 128
BAUMGARTE = 0.2
SLOP = 2e-4
STATIC_MASS = 1e8
FRICTION_RELAX = 0.5  # engine.FRICTION_RELAX — under-relaxed Jacobi friction


# ---------------------------------------------------------------------------
# per-lane CSG evaluation (component-unrolled; params are (..., L) arrays)
# ---------------------------------------------------------------------------


def _box_sdfn_l(px, py, pz, hx, hy, hz):
    """Analytic box SDF + outward normal, per-lane (mirrors
    ``geom.csg._box_sdf_normal`` component-unrolled)."""
    qx, qy, qz = jnp.abs(px) - hx, jnp.abs(py) - hy, jnp.abs(pz) - hz
    ox, oy, oz = jnp.maximum(qx, 0.0), jnp.maximum(qy, 0.0), jnp.maximum(qz, 0.0)
    d_out = jnp.sqrt(ox * ox + oy * oy + oz * oz + 1e-18)
    qmax = jnp.maximum(qx, jnp.maximum(qy, qz))
    d_in = jnp.minimum(qmax, 0.0)
    inv_do = 1.0 / d_out
    outside = (qx > 0) | (qy > 0) | (qz > 0)
    nx = jnp.where(outside, ox * inv_do, (qx >= qmax).astype(px.dtype)) * jnp.sign(px)
    ny = jnp.where(outside, oy * inv_do, (qy >= qmax).astype(py.dtype)) * jnp.sign(py)
    nz = jnp.where(outside, oz * inv_do, (qz >= qmax).astype(pz.dtype)) * jnp.sign(pz)
    return d_out + d_in, nx, ny, nz


def _cyl_sdfn_l(px, py, pz, r, hh):
    rxy = jnp.sqrt(px * px + py * py + 1e-18)
    inv_rxy = 1.0 / rxy
    dxy = rxy - r
    dz = jnp.abs(pz) - hh
    ox, oz = jnp.maximum(dxy, 0.0), jnp.maximum(dz, 0.0)
    d_out = jnp.sqrt(ox * ox + oz * oz + 1e-18)
    d_in = jnp.minimum(jnp.maximum(dxy, dz), 0.0)
    inv_do = 1.0 / d_out
    out = (ox + oz) > 0.0
    # radial vs cap weights
    wr = jnp.where(out, ox * inv_do, (dxy > dz).astype(px.dtype))
    wz = jnp.where(out, oz * inv_do, (dxy <= dz).astype(px.dtype))
    nx = wr * px * inv_rxy
    ny = wr * py * inv_rxy
    nz = wz * jnp.sign(pz)
    return jnp.where(out, d_out, 0.0) + d_in, nx, ny, nz


def _hex_sdfn_l(px0, py0, pz0, ap, hh):
    """Analytic hex-prism SDF + normal per-lane (``_hex_sdf_normal``)."""
    kx, ky, kz = -COS30, 0.5, 0.57735
    s1, s2, sz = jnp.sign(px0), jnp.sign(py0), jnp.sign(pz0)
    px, py, pz = jnp.abs(px0), jnp.abs(py0), jnp.abs(pz0)
    dot = kx * px + ky * py
    folded = dot < 0.0
    mdot = jnp.minimum(dot, 0.0)
    px2 = px - 2.0 * mdot * kx
    py2 = py - 2.0 * mdot * ky
    clipped = jnp.clip(px2, -kz * ap, kz * ap)
    lx = px2 - clipped
    ly = py2 - ap
    llen = jnp.sqrt(lx * lx + ly * ly + 1e-18)
    side = jnp.sign(py2 - ap)
    dx = llen * side
    dz = pz - hh
    active = (px2 != clipped).astype(px.dtype)
    inv_ll = 1.0 / llen
    gx = side * lx * inv_ll * active
    gy = side * ly * inv_ll
    kg = kx * gx + ky * gy
    gx = jnp.where(folded, gx - 2.0 * kx * kg, gx)
    gy = jnp.where(folded, gy - 2.0 * ky * kg, gy)
    ox, oz = jnp.maximum(dx, 0.0), jnp.maximum(dz, 0.0)
    d_out = jnp.sqrt(ox * ox + oz * oz + 1e-18)
    outside = (ox + oz) > 0.0
    d_in = jnp.minimum(jnp.maximum(dx, dz), 0.0)
    inv_do = 1.0 / d_out
    w2d = jnp.where(outside, ox * inv_do, (dx > dz).astype(px.dtype))
    wz = jnp.where(outside, oz * inv_do, (dx <= dz).astype(px.dtype))
    nx = w2d * s1 * gx
    ny = w2d * s2 * gy
    nz = wz * sz
    gn = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz + 1e-18)
    return (jnp.where(outside, d_out, 0.0) + d_in,
            nx * gn, ny * gn, nz * gn)


def _csg_evaln_l(lx, ly, lz, types, ops, prm, off, n_slots):
    """Branch-free CSG signed distance AND outward normal, per-lane params
    (mirrors ``geom.csg.csg_sdf_and_normal``'s min/max normal tracking).

    lx/ly/lz: (..., L) local coords.  types/ops: (S, L); prm/off: (S, 3, L).
    Returns (d, nx, ny, nz) in the local frame.
    """
    d = jnp.full(lx.shape, 1e9, lx.dtype)
    nx = jnp.zeros_like(lx)
    ny = jnp.zeros_like(lx)
    nz = jnp.zeros_like(lx)
    for s in range(n_slots):
        px, py, pz = lx - off[s, 0], ly - off[s, 1], lz - off[s, 2]
        t = types[s]
        db, bx, by, bz = _box_sdfn_l(px, py, pz, prm[s, 0], prm[s, 1], prm[s, 2])
        dc, cx, cy, cz = _cyl_sdfn_l(px, py, pz, prm[s, 0], prm[s, 1])
        dh, hx, hy, hz = _hex_sdfn_l(px, py, pz, prm[s, 0], prm[s, 1])
        is_b, is_c = t == BOX, t == CYLINDER
        ds = jnp.where(is_b, db, jnp.where(is_c, dc, dh))
        sx = jnp.where(is_b, bx, jnp.where(is_c, cx, hx))
        sy = jnp.where(is_b, by, jnp.where(is_c, cy, hy))
        sz_ = jnp.where(is_b, bz, jnp.where(is_c, cz, hz))
        is_union = ops[s] > 0
        take_u = is_union & (ds < d)
        take_s = (~is_union) & (-ds > d)
        d_new = jnp.where(is_union, jnp.minimum(d, ds), jnp.maximum(d, -ds))
        live = t != NONE
        d = jnp.where(live, d_new, d)
        upd = live & (take_u | take_s)
        sgn = jnp.where(take_u, 1.0, -1.0)
        nx = jnp.where(upd, sgn * sx, nx)
        ny = jnp.where(upd, sgn * sy, ny)
        nz = jnp.where(upd, sgn * sz_, nz)
    gn = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz + 1e-18)
    return d, nx * gn, ny * gn, nz * gn


def _quat_to_R_l(q):
    """quat (N, 4, L) -> 9 rotation components [(N, L)] row-major."""
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return [
        1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w),
        2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w),
        2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y),
    ]


def _make_kernel(N, P, S, M_env, n_steps, n_iter, dt, gravity,
                 linear_damping, angular_damping):
    M_tot = N + M_env
    g_dt = gravity * dt
    inv_dt_b = BAUMGARTE / dt
    # damping is calibrated per 1/240 s step (engine.step docstring);
    # rescale to the actual dt so halving dt does not double the per-second
    # velocity loss
    lin_keep = (1.0 - linear_damping) ** (dt / sim.engine.DT)
    ang_keep = (1.0 - angular_damping) ** (dt / sim.engine.DT)

    def kernel(pos_ref, quat_ref, lin_ref, ang_ref, act_ref, dyn_ref,
               im_ref, iI_ref, fric_ref, scl_ref,
               surf_ref, ct_ref, cop_ref, cpr_ref, cof_ref,
               envc_ref, envh_ref, envR_ref, envv_ref, envf_ref,
               opos_ref, oquat_ref, olin_ref, oang_ref,
               phi_s, nx_s, ny_s, nz_s, kn_s):
        # ---- load static per-call data ------------------------------------
        act = act_ref[0]          # (N, L) 1/0
        dyn = dyn_ref[0]          # (N, L)
        inv_m = im_ref[0]         # (N, L)
        iI = iI_ref[0]            # (N, 3, L) diag inverse inertia (body frame)
        fric = fric_ref[0]        # (N, L)
        scl = scl_ref[0]          # (N, L)
        surf = surf_ref[0]        # (N, 3, P, L) local pre-scaled sample pts
        ctyp = ct_ref[0]          # (N, S, L)
        cop = cop_ref[0]          # (N, S, L)
        cpr = cpr_ref[0]          # (N, S, 3, L)
        cof = cof_ref[0]          # (N, S, 3, L)
        envc = envc_ref[:]        # (M_env, 3)
        envh = envh_ref[:]
        envR = envR_ref[:]        # (M_env, 3, 3)
        envv = envv_ref[:]
        envf = envf_ref[:]

        pair_ok = [[act[i] * act[j] for j in range(N)] for i in range(N)]

        def step_body(_, carry):
            pos, quat, lin, ang = carry
            # gravity kick (dynamic bodies only) — no scatter: build the
            # (N,3,L) increment by stacking (Mosaic has no scatter-add)
            zero_nl = jnp.zeros_like(dyn)
            lin = lin + jnp.stack(
                [zero_nl, zero_nl, jnp.where(dyn > 0, g_dt, 0.0)], axis=1)

            R = _quat_to_R_l(quat)  # 9 x (N, L)
            # world surface points w_c (N, P, L)
            w = [pos[:, c][:, None] + sum(R[3 * c + k][:, None] * surf[:, k]
                                          for k in range(3))
                 for c in range(3)]

            # world inverse inertia (symmetric, 6 comps) per body
            def iIw(a, b):
                return sum(R[3 * a + k] * iI[:, k] * R[3 * b + k] for k in range(3))
            I00, I01, I02 = iIw(0, 0), iIw(0, 1), iIw(0, 2)
            I11, I12, I22 = iIw(1, 1), iIw(1, 2), iIw(2, 2)

            def apply_iI(i_sel, tx, ty, tz):
                # i_sel: slice/index on the body axis of the I comps; the
                # comps right-align to the operand rank (lane axis last)
                def c(Iab):
                    v = Iab[i_sel]
                    while v.ndim < tx.ndim:
                        v = jnp.expand_dims(v, -2)
                    return v
                return (c(I00) * tx + c(I01) * ty + c(I02) * tz,
                        c(I01) * tx + c(I11) * ty + c(I12) * tz,
                        c(I02) * tx + c(I12) * ty + c(I22) * tz)

            # ---- narrowphase: fill slabs (phi, n, K_n) --------------------
            cnt_i = jnp.zeros_like(act)   # (N, L)
            cnt_j_list = [jnp.zeros_like(act[0]) for _ in range(N)]
            for j in range(M_tot):
                if j < N:
                    # body collider: local coords in j's frame
                    rel = [w[c] - pos[j, c][None] for c in range(3)]
                    Rj = [R[k][j] for k in range(9)]  # (L,)
                    inv_s = 1.0 / scl[j]
                    loc = [(Rj[0 + c] * rel[0] + Rj[3 + c] * rel[1]
                            + Rj[6 + c] * rel[2]) * inv_s for c in range(3)]
                    phi, gx, gy, gz = _csg_evaln_l(
                        loc[0], loc[1], loc[2], ctyp[j], cop[j],
                        cpr[j], cof[j], S)
                    phi = phi * scl[j]
                    # world normal = R_j @ n_loc
                    nx = Rj[0] * gx + Rj[1] * gy + Rj[2] * gz
                    ny = Rj[3] * gx + Rj[4] * gy + Rj[5] * gz
                    nz = Rj[6] * gx + Rj[7] * gy + Rj[8] * gz
                    # self-pair / inactive masking (i == j zeroed at
                    # python level — static indices)
                    ok = jnp.stack([pair_ok[i][j] * (0.0 if i == j else 1.0)
                                    for i in range(N)])  # (N, L)
                    phi = jnp.where(ok[:, None] > 0, phi, 1e9)
                else:
                    m = j - N
                    rel = [w[c] - envc[m, c] for c in range(3)]
                    loc = [envR[m, 0, c] * rel[0] + envR[m, 1, c] * rel[1]
                           + envR[m, 2, c] * rel[2] for c in range(3)]
                    qx = jnp.abs(loc[0]) - envh[m, 0]
                    qy = jnp.abs(loc[1]) - envh[m, 1]
                    qz = jnp.abs(loc[2]) - envh[m, 2]
                    ox, oy, oz = (jnp.maximum(qx, 0.0), jnp.maximum(qy, 0.0),
                                  jnp.maximum(qz, 0.0))
                    d_out = jnp.sqrt(ox * ox + oy * oy + oz * oz + 1e-18)
                    qmax = jnp.maximum(qx, jnp.maximum(qy, qz))
                    phi = d_out + jnp.minimum(qmax, 0.0)
                    outside = qmax > 0.0
                    # outward normal: outside -> clamp vector, inside -> max face
                    inv_do = 1.0 / d_out
                    nlx = jnp.where(outside, ox * inv_do * jnp.sign(loc[0]),
                                    jnp.where(qx >= qmax, jnp.sign(loc[0]), 0.0))
                    nly = jnp.where(outside, oy * inv_do * jnp.sign(loc[1]),
                                    jnp.where(qy >= qmax, jnp.sign(loc[1]), 0.0))
                    nlz = jnp.where(outside, oz * inv_do * jnp.sign(loc[2]),
                                    jnp.where(qz >= qmax, jnp.sign(loc[2]), 0.0))
                    gn = jax.lax.rsqrt(nlx * nlx + nly * nly + nlz * nlz + 1e-12)
                    nlx, nly, nlz = nlx * gn, nly * gn, nlz * gn
                    nx = envR[m, 0, 0] * nlx + envR[m, 0, 1] * nly + envR[m, 0, 2] * nlz
                    ny = envR[m, 1, 0] * nlx + envR[m, 1, 1] * nly + envR[m, 1, 2] * nlz
                    nz = envR[m, 2, 0] * nlx + envR[m, 2, 1] * nly + envR[m, 2, 2] * nlz
                    phi = jnp.where(act[:, None] > 0, phi, 1e9)

                contact = (phi < 0.0).astype(phi.dtype)
                cnt_i = cnt_i + jnp.sum(contact, axis=1)
                if j < N:
                    cnt_j_list[j] = cnt_j_list[j] + jnp.sum(contact, axis=(0, 1))

                # K_n = 1/mi + 1/mj + n.[(Ii^-1 (ri x n)) x ri] + (j term)
                rix = [w[c] - pos[:, c][:, None] for c in range(3)]
                cx = rix[1] * nz - rix[2] * ny
                cy = rix[2] * nx - rix[0] * nz
                cz = rix[0] * ny - rix[1] * nx
                ax_, ay_, az_ = apply_iI(slice(None), cx, cy, cz)
                term_i = cx * ax_ + cy * ay_ + cz * az_
                if j < N:
                    rjx = [w[c] - pos[j, c][None] for c in range(3)]
                    jx = rjx[1] * nz - rjx[2] * ny
                    jy = rjx[2] * nx - rjx[0] * nz
                    jz = rjx[0] * ny - rjx[1] * nx
                    bx, by, bz = apply_iI(j, jx, jy, jz)
                    term_j = jx * bx + jy * by + jz * bz
                    kn = inv_m[:, None] + inv_m[j][None] + term_i + term_j
                else:
                    kn = inv_m[:, None] + term_i
                kn = jnp.maximum(kn, 1e-9)

                phi_s[j] = phi.astype(jnp.bfloat16)
                nx_s[j] = nx.astype(jnp.bfloat16)
                ny_s[j] = ny.astype(jnp.bfloat16)
                nz_s[j] = nz.astype(jnp.bfloat16)
                kn_s[j] = kn

            cnt_j = jnp.stack(cnt_j_list)
            denom = jnp.maximum(cnt_i + cnt_j, 1.0)
            scale_body = 1.0 / denom  # (N, L)

            # ---- Jacobi iterations (fori_loop: body traced once — the
            # python-unrolled version quadruples Mosaic compile time).
            # Split impulse (engine._solve_contacts): the real velocity
            # channel resolves only the actual relative approach; the
            # Baumgarte bias drives a separate pseudo-velocity channel
            # (plin/pang) that moves positions this step and is discarded.
            def jacobi_iter(_i, la):
                lin, ang, plin, pang = la
                zl = jnp.zeros_like(lin[:, 0])  # (N, L)
                zL = jnp.zeros_like(lin[0, 0])  # (L,)
                # [real, pseudo] accumulators on i: lin xyz + ang xyz
                acc = [[zl, zl, zl, zl, zl, zl] for _ in range(2)]
                # [real, pseudo] reaction lists on j: (rl, ra) each
                rx = [[[[zL, zL, zL] for _ in range(N)] for _ in range(2)]
                      for _ in range(2)]
                for j in range(M_tot):
                    phi = phi_s[j].astype(jnp.float32)
                    nx = nx_s[j].astype(jnp.float32)
                    ny = ny_s[j].astype(jnp.float32)
                    nz = nz_s[j].astype(jnp.float32)
                    kn = kn_s[j]
                    contact = phi < 0.0
                    pen = jnp.maximum(-phi, 0.0)
                    bias = inv_dt_b * jnp.maximum(pen - SLOP, 0.0)

                    rix = [w[c] - pos[:, c][:, None] for c in range(3)]
                    if j < N:
                        rjx = [w[c] - pos[j, c][None] for c in range(3)]
                        mu = fric[:, None] * fric[j][None]
                    else:
                        rjx = None
                        mu = fric[:, None] * envf[j - N]

                    def rel_vel(lv, av, ext_j):
                        """relative contact-point velocity of i vs j for one
                        channel; ext_j = env collider velocity (real channel
                        only; pseudo env velocity is zero)."""
                        vx = (lv[:, 0][:, None] + av[:, 1][:, None] * rix[2]
                              - av[:, 2][:, None] * rix[1])
                        vy = (lv[:, 1][:, None] + av[:, 2][:, None] * rix[0]
                              - av[:, 0][:, None] * rix[2])
                        vz = (lv[:, 2][:, None] + av[:, 0][:, None] * rix[1]
                              - av[:, 1][:, None] * rix[0])
                        if j < N:
                            vjx = (lv[j, 0][None] + av[j, 1][None] * rjx[2]
                                   - av[j, 2][None] * rjx[1])
                            vjy = (lv[j, 1][None] + av[j, 2][None] * rjx[0]
                                   - av[j, 0][None] * rjx[2])
                            vjz = (lv[j, 2][None] + av[j, 0][None] * rjx[1]
                                   - av[j, 1][None] * rjx[0])
                        else:
                            vjx, vjy, vjz = ext_j
                        return vx - vjx, vy - vjy, vz - vjz

                    def accum(ch, ix, iy, iz):
                        dlx, dly, dlz, dax, day, daz = acc[ch]
                        s_i = scale_body * inv_m  # (N, L)
                        dlx = dlx + jnp.sum(ix, axis=1) * s_i
                        dly = dly + jnp.sum(iy, axis=1) * s_i
                        dlz = dlz + jnp.sum(iz, axis=1) * s_i
                        tqx = jnp.sum(rix[1] * iz - rix[2] * iy, axis=1)
                        tqy = jnp.sum(rix[2] * ix - rix[0] * iz, axis=1)
                        tqz = jnp.sum(rix[0] * iy - rix[1] * ix, axis=1)
                        wx, wy, wz = apply_iI(slice(None), tqx, tqy, tqz)
                        acc[ch] = [dlx, dly, dlz, dax + wx * scale_body,
                                   day + wy * scale_body, daz + wz * scale_body]
                        if j < N:
                            # reaction on body j (impulse is ON i, so -imp on
                            # j); j is a static python index -> lists
                            rl, ra = rx[ch]
                            s_j = scale_body[j] * inv_m[j]
                            rl[j][0] = rl[j][0] - jnp.sum(ix, axis=(0, 1)) * s_j
                            rl[j][1] = rl[j][1] - jnp.sum(iy, axis=(0, 1)) * s_j
                            rl[j][2] = rl[j][2] - jnp.sum(iz, axis=(0, 1)) * s_j
                            tjx = -jnp.sum(rjx[1] * iz - rjx[2] * iy, axis=(0, 1))
                            tjy = -jnp.sum(rjx[2] * ix - rjx[0] * iz, axis=(0, 1))
                            tjz = -jnp.sum(rjx[0] * iy - rjx[1] * ix, axis=(0, 1))
                            bx, by, bz = apply_iI(j, tjx, tjy, tjz)
                            ra[j][0] = ra[j][0] + bx * scale_body[j]
                            ra[j][1] = ra[j][1] + by * scale_body[j]
                            ra[j][2] = ra[j][2] + bz * scale_body[j]

                    # real channel: normal impulse against approach only
                    # (no bias) + under-relaxed cone-clamped friction
                    m = j - N
                    rvx, rvy, rvz = rel_vel(
                        lin, ang,
                        None if j < N else (envv[m, 0], envv[m, 1], envv[m, 2]))
                    v_n = rvx * nx + rvy * ny + rvz * nz
                    jn = jnp.where(contact, jnp.maximum(-v_n / kn, 0.0), 0.0)
                    tx = rvx - v_n * nx
                    ty_ = rvy - v_n * ny
                    tz = rvz - v_n * nz
                    vt = jnp.sqrt(tx * tx + ty_ * ty_ + tz * tz + 1e-18)
                    jt = jnp.minimum(FRICTION_RELAX * vt / kn, mu * jn)
                    inv_vt = 1.0 / (vt + 1e-9)
                    accum(0, jn * nx - jt * tx * inv_vt,
                          jn * ny - jt * ty_ * inv_vt,
                          jn * nz - jt * tz * inv_vt)

                    # pseudo channel: normal-only, driven by the bias
                    # against the current pseudo velocities (env colliders
                    # carry none)
                    pvx, pvy, pvz = rel_vel(
                        plin, pang, None if j < N else (0.0, 0.0, 0.0))
                    p_n = pvx * nx + pvy * ny + pvz * nz
                    jp = jnp.where(contact,
                                   jnp.maximum((-p_n + bias) / kn, 0.0), 0.0)
                    accum(1, jp * nx, jp * ny, jp * nz)

                out = []
                for ch, (lv, av) in enumerate([(lin, ang), (plin, pang)]):
                    dlx, dly, dlz, dax, day, daz = acc[ch]
                    rl, ra = rx[ch]
                    dlx = dlx + jnp.stack([rl[b][0] for b in range(N)])
                    dly = dly + jnp.stack([rl[b][1] for b in range(N)])
                    dlz = dlz + jnp.stack([rl[b][2] for b in range(N)])
                    dax = dax + jnp.stack([ra[b][0] for b in range(N)])
                    day = day + jnp.stack([ra[b][1] for b in range(N)])
                    daz = daz + jnp.stack([ra[b][2] for b in range(N)])
                    out.append(lv + jnp.stack([dlx, dly, dlz], axis=1))
                    out.append(av + jnp.stack([dax, day, daz], axis=1))
                return tuple(out)

            pzero = jnp.zeros_like(lin)
            lin, ang, plin, pang = jax.lax.fori_loop(
                0, n_iter, jacobi_iter, (lin, ang, pzero, jnp.zeros_like(ang)))

            # ---- damping, static zeroing, integration --------------------
            lin = lin * lin_keep
            ang = ang * ang_keep
            dm = (dyn > 0)[:, None]
            lin = jnp.where(dm, lin, 0.0)
            ang = jnp.where(dm, ang, 0.0)
            plin = jnp.where(dm, plin, 0.0)
            pang = jnp.where(dm, pang, 0.0)
            # positions integrate real + pseudo velocities; only the real
            # ones persist into the next step (split impulse)
            pos = pos + jnp.where(dm, (lin + plin) * dt, 0.0)
            ang_int = ang + pang
            # dq = [0, ang_int] * quat ; quat += 0.5*dt*dq; normalize
            qw, qx_, qy_, qz_ = quat[:, 0], quat[:, 1], quat[:, 2], quat[:, 3]
            ox_, oy_, oz_ = ang_int[:, 0], ang_int[:, 1], ang_int[:, 2]
            dqw = -ox_ * qx_ - oy_ * qy_ - oz_ * qz_
            dqx = ox_ * qw + oy_ * qz_ - oz_ * qy_
            dqy = -ox_ * qz_ + oy_ * qw + oz_ * qx_
            dqz = ox_ * qy_ - oy_ * qx_ + oz_ * qw
            nqw = qw + 0.5 * dt * dqw
            nqx = qx_ + 0.5 * dt * dqx
            nqy = qy_ + 0.5 * dt * dqy
            nqz = qz_ + 0.5 * dt * dqz
            inv_n = jax.lax.rsqrt(nqw * nqw + nqx * nqx + nqy * nqy
                                  + nqz * nqz + 1e-12)
            new_quat = jnp.stack([nqw * inv_n, nqx * inv_n,
                                  nqy * inv_n, nqz * inv_n], axis=1)
            quat = jnp.where(dm, new_quat, quat)  # dm (N,1,L) vs (N,4,L)
            return (pos, quat, lin, ang)

        carry = (pos_ref[0], quat_ref[0], lin_ref[0], ang_ref[0])
        pos, quat, lin, ang = jax.lax.fori_loop(0, n_steps, step_body, carry)
        opos_ref[0] = pos
        oquat_ref[0] = quat
        olin_ref[0] = lin
        oang_ref[0] = ang

    return kernel


def _to_lanes(x, nb):
    """(B, ...) -> (nb, ..., L): split scenes into lane blocks, scene last."""
    B = x.shape[0]
    x = x.reshape(nb, LANES, *x.shape[1:])
    return jnp.moveaxis(x, 1, -1)


def _from_lanes(x):
    """(nb, ..., L) -> (B, ...)."""
    x = jnp.moveaxis(x, -1, 1)
    return x.reshape(x.shape[0] * LANES, *x.shape[2:])


@partial(jax.jit, static_argnames=("n_steps", "n_iter", "dt", "gravity",
                                   "interpret"))
def rollout_fused(state: SceneState, params: SceneParams, lib: ShapeLib,
                  env, n_steps: int, dt: float = None, gravity: float = -9.8,
                  n_iter: int = 4, linear_damping: float = 0.0095,
                  angular_damping: float = 0.0095, interpret: bool = False):
    """Drop-in for ``vmap(engine.rollout)`` over a scene batch (CSG
    narrowphase).  state/params have a leading scene axis B (padded to a
    multiple of 128 internally).  Returns the final SceneState batch."""
    dt = sim.engine.DT if dt is None else dt
    B, N = state.pos.shape[:2]
    pad = (-B) % LANES
    if pad:
        def padb(x):
            return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
        state = jax.tree.map(padb, state)
        params = jax.tree.map(padb, params)
    Bp = B + pad
    nb = Bp // LANES

    P = lib.surf_pts.shape[1]
    S = lib.csg.types.shape[1]
    M_env = env.center.shape[0]

    # per-scene gathers (once per rollout call, amortized over n_steps)
    surf = lib.surf_pts[params.shape_id] * params.scale[..., None, None]  # (Bp,N,P,3)
    surf = jnp.swapaxes(surf, -1, -2)  # (Bp, N, 3, P)
    ctypes = lib.csg.types[params.shape_id].astype(jnp.float32)  # (Bp,N,S)
    cops = lib.csg.ops[params.shape_id].astype(jnp.float32)
    cprm = lib.csg.params[params.shape_id]  # (Bp,N,S,3)
    coff = lib.csg.offsets[params.shape_id]

    act = state.active.astype(jnp.float32)
    dynm = (state.active & (params.mass < STATIC_MASS)).astype(jnp.float32)
    inv_m = jnp.where(dynm > 0, 1.0 / params.mass, 0.0)
    inv_I = jnp.where(dynm[..., None] > 0, 1.0 / params.inertia, 0.0)

    ins = [
        _to_lanes(state.pos, nb), _to_lanes(state.quat, nb),
        _to_lanes(state.linvel, nb), _to_lanes(state.angvel, nb),
        _to_lanes(act, nb), _to_lanes(dynm, nb),
        _to_lanes(inv_m, nb), _to_lanes(inv_I, nb),
        _to_lanes(params.friction, nb), _to_lanes(params.scale, nb),
        _to_lanes(surf, nb),
        _to_lanes(ctypes, nb), _to_lanes(cops, nb),
        _to_lanes(cprm, nb), _to_lanes(coff, nb),
        env.center, env.half,
        jax.vmap(tf.quat_to_matrix)(env.quat),
        jnp.where(env.enabled[:, None], env.vel, 0.0),
        env.friction,
    ]
    # disabled env boxes: push them far away instead of masking in-kernel
    ins[15] = jnp.where(env.enabled[:, None], ins[15], 1e6)

    kernel = _make_kernel(N, P, S, M_env, n_steps, n_iter, float(dt),
                          float(gravity), linear_damping, angular_damping)

    def spec(x):
        blk = (1,) + x.shape[1:]
        nd = len(x.shape) - 1
        return pl.BlockSpec(blk, lambda i, nd=nd: (i,) + (0,) * nd,
                            memory_space=pltpu.VMEM)

    in_specs = [spec(x) for x in ins[:15]] + [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in ins[15:]]
    out_shapes = [jax.ShapeDtypeStruct((nb, N, 3, LANES), jnp.float32),
                  jax.ShapeDtypeStruct((nb, N, 4, LANES), jnp.float32),
                  jax.ShapeDtypeStruct((nb, N, 3, LANES), jnp.float32),
                  jax.ShapeDtypeStruct((nb, N, 3, LANES), jnp.float32)]
    out_specs = [spec(jnp.zeros(s.shape, s.dtype)) for s in out_shapes]
    M_tot = N + M_env
    scratch = [
        pltpu.VMEM((M_tot, N, P, LANES), jnp.bfloat16),  # phi
        pltpu.VMEM((M_tot, N, P, LANES), jnp.bfloat16),  # nx
        pltpu.VMEM((M_tot, N, P, LANES), jnp.bfloat16),  # ny
        pltpu.VMEM((M_tot, N, P, LANES), jnp.bfloat16),  # nz
        pltpu.VMEM((M_tot, N, P, LANES), jnp.float32),   # K_n
    ]

    pos, quat, lin, ang = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_shape=out_shapes,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        # the step working set (contact slabs + eval temporaries) wants more
        # scoped VMEM than Mosaic's conservative 16M default; v5e has
        # headroom above that
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*ins)

    out = state.replace(pos=_from_lanes(pos), quat=_from_lanes(quat),
                        linvel=_from_lanes(lin), angvel=_from_lanes(ang))
    if pad:
        out = jax.tree.map(lambda x: x[:B], out)
    return out
