"""Fused contact-scan Pallas kernel: the whole `substeps` physics loop
as ONE TPU kernel, state resident in VMEM.

The XLA path (physics/fast.py) runs the 75-substep `lax.scan` as ~hundreds
of small HLO ops per substep, each round-tripping (B, C)-sized arrays
through HBM; at 1024 envs that is the per-op dispatch/bandwidth floor of
the whole env step (PERF.md). This kernel keeps the object state
(pos/quat/vel/fingers, ~16 floats per env) and all contact intermediates
in VMEM for the entire scan and only touches HBM for the per-substep
hand trajectory (13 floats/env/substep) and the final state write-out.

Layout: env-major tiles of E=8 envs (f32 sublane tile) x C=128 contact
lanes (4 primitive groups x NS=32 spheres -- table, left pad, right pad,
palm -- exactly one lane tile). All vector math is component form
(lists of (E, C) planes); rotations are quaternion component chains, so
the kernel is pure VPU work -- matmuls have no business here (PERF.md).

Numerics mirror physics/fast.py's substep OP FOR OP (same contact
model: spring normals + capped damping, cone-budgeted friction passes,
rigid-set translational stiction, torsional + pad rotational stiction,
gear-coupled penetration-limited fingers -- reference behavior:
env/panda_scene.py:354-387). tests/test_pallas_physics.py pins the
kernel against the lax.scan path to float tolerance; dispatch is
automatic on TPU backends behind GADDPG_PALLAS (same switch as the
point-op kernels).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaddpg_tpu.ops.pallas_kernels import pallas_enabled

E = 8          # envs per tile (f32 sublane tile)
NS = 32        # spheres per object (library max_spheres)
C = 4 * NS     # contact lanes: table + left pad + right pad + palm


# ---------------------------------------------------------------------------
# component-form vector helpers (lists of (E, ...) planes)
# ---------------------------------------------------------------------------

def _cross(a, b):
    return [
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ]


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _norm(a, eps=0.0):
    return jnp.sqrt(_dot(a, a) + eps)


def _qrot(qw, qv, v):
    """Rotate triplet v by quaternion (qw, qv); 2-cross form."""
    uv = _cross(qv, v)
    uuv = _cross(qv, uv)
    return [v[k] + 2.0 * (qw * uv[k] + uuv[k]) for k in range(3)]


def _clamp_passive(dv, v, cap, eps=1e-9):
    """clamp_passive_delta (physics/contact.py:34-54) on (E,1) triplets."""
    vn = _norm(v)
    vm = jnp.maximum(vn, eps)
    v_hat = [v[k] / vm for k in range(3)]
    along = _dot(dv, v_hat)
    perp = [dv[k] - along * v_hat[k] for k in range(3)]
    pn = _norm(perp)
    along_c = jnp.clip(along, -(vn + cap), cap)
    ps = jnp.minimum(1.0, cap / jnp.maximum(pn, eps))
    return [along_c * v_hat[k] + perp[k] * ps for k in range(3)]


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _make_kernel(p, n):
    """Kernel closure over the (static, hashable) PhysicsParams + length."""
    dt = p.dt
    fhe = tuple(float(x) for x in p.finger_half_extents)
    phe = tuple(float(x) for x in p.palm_half_extents)
    pc = tuple(float(x) for x in p.palm_center)
    half_ext = (fhe, fhe, phe)
    fzc = float(p.finger_z_center)

    def kernel(state_ref, hand_ref, sph_ref, radii_ref, mass_ref,
               inert_ref, fncl_ref, tgt_ref, out_ref):
        # ---- loop-invariant loads ----
        radii = radii_ref[:]                                  # (E, NS)
        sph_l = [sph_ref[k] for k in range(3)]                # (E, NS) x3
        mass = mass_ref[:]                                    # (E, 1)
        inert = [inert_ref[:, k:k + 1] for k in range(3)]     # (E, 1) x3
        inv_in = [1.0 / inert[k] for k in range(3)]
        fn_clamp = fncl_ref[:]                                # (E, C)
        tgt_l = tgt_ref[:, 0:1]
        tgt_r = tgt_ref[:, 1:2]
        zero_ns = jnp.zeros((E, NS), jnp.float32)
        # table lanes first: mask for pad-only passes
        lane = jax.lax.broadcasted_iota(jnp.int32, (E, C), 1)
        is_pad_lane = lane >= NS

        s0 = state_ref[:]
        carry0 = tuple(s0[:, k:k + 1] for k in range(16))

        def substep(t, carry):
            (px, py, pz, qw, qx, qy, qz, vx, vy, vz,
             wx, wy, wz, qfl, qfr, grip) = carry
            pos = [px, py, pz]
            qv = [qx, qy, qz]
            linvel = [vx, vy, vz]
            angvel = [wx, wy, wz]

            h = hand_ref[t]                                   # (E, 13)
            h_pos = [h[:, k:k + 1] for k in range(3)]
            hqw = h[:, 3:4]
            hqv = [h[:, 4 + k:5 + k] for k in range(3)]
            h_lin = [h[:, 7 + k:8 + k] for k in range(3)]
            h_ang = [h[:, 10 + k:11 + k] for k in range(3)]

            # ---- sphere world positions ----
            centers = _qrot(qw, qv, sph_l)
            centers = [centers[k] + pos[k] for k in range(3)]  # (E, NS)

            # ---- gripper boxes in hand frame ----
            offs = (
                (zero_ns[:, :1] * 0.0, qfl + fhe[1], jnp.full((E, 1), fzc)),
                (zero_ns[:, :1] * 0.0, -(qfr + fhe[1]), jnp.full((E, 1), fzc)),
                (jnp.full((E, 1), pc[0]), jnp.full((E, 1), pc[1]),
                 jnp.full((E, 1), pc[2])),
            )
            hqv_c = [-hqv[k] for k in range(3)]
            cmh = [centers[k] - h_pos[k] for k in range(3)]
            c_hand = _qrot(hqw, hqv_c, cmh)                   # (E, NS)

            pen_groups = []
            nrm_groups = [[], [], []]
            cpt_groups = [[], [], []]
            vsf_groups = [[], [], []]

            # table group (radius-0 padding spheres never contact --
            # mirrors the XLA scan's mask in physics/fast.py)
            real = (radii > 0).astype(jnp.float32)
            pen_tab = real * (radii - (centers[2] - p.table_z)) - (1.0 - real)
            pen_groups.append(pen_tab)
            n_tab = [jnp.zeros((E, NS)), jnp.zeros((E, NS)),
                     jnp.ones((E, NS))]
            for k in range(3):
                nrm_groups[k].append(n_tab[k])
                cpt_groups[k].append(centers[k] - n_tab[k] * radii)
                vsf_groups[k].append(zero_ns)

            # box groups
            pen_box = []
            for b in range(3):
                off = offs[b]
                he = half_ext[b]
                p_loc = [c_hand[k] - off[k] for k in range(3)]
                qd = [jnp.abs(p_loc[k]) - he[k] for k in range(3)]
                outside = [jnp.maximum(qd[k], 0.0) for k in range(3)]
                d_out = _norm(outside)
                d_in = jnp.minimum(
                    jnp.maximum(jnp.maximum(qd[0], qd[1]), qd[2]), 0.0
                )
                sdf = d_out + d_in
                inv_do = 1.0 / jnp.maximum(d_out, 1e-9)
                sgn = [jnp.sign(p_loc[k]) for k in range(3)]
                n_out = [outside[k] * sgn[k] * inv_do for k in range(3)]
                # argmax one-hot with first-index tie-break (jnp.argmax)
                is0 = (qd[0] >= qd[1]) & (qd[0] >= qd[2])
                is1 = (~is0) & (qd[1] >= qd[2])
                is2 = (~is0) & (~is1)
                onehot = [is0.astype(jnp.float32), is1.astype(jnp.float32),
                          is2.astype(jnp.float32)]
                n_in = [onehot[k] * sgn[k] for k in range(3)]
                use_out = d_out > 0
                n_loc = [jnp.where(use_out, n_out[k], n_in[k])
                         for k in range(3)]
                n_w = _qrot(hqw, hqv, n_loc)
                pen_b = real * (radii - sdf) - (1.0 - real)
                pen_groups.append(pen_b)
                pen_box.append(pen_b)
                cpts = [centers[k] - n_w[k] * radii for k in range(3)]
                box_t = _qrot(hqw, hqv, off)
                box_t = [box_t[k] + h_pos[k] for k in range(3)]
                rel = [cpts[k] - box_t[k] for k in range(3)]
                v_b = _cross(h_ang, rel)
                for k in range(3):
                    nrm_groups[k].append(n_w[k])
                    cpt_groups[k].append(cpts[k])
                    vsf_groups[k].append(h_lin[k] + v_b[k])

            pen = jnp.concatenate(pen_groups, axis=1)          # (E, C)
            nrm = [jnp.concatenate(nrm_groups[k], axis=1) for k in range(3)]
            cpts = [jnp.concatenate(cpt_groups[k], axis=1) for k in range(3)]
            v_surf = [jnp.concatenate(vsf_groups[k], axis=1) for k in range(3)]

            active = pen > 0
            activef = active.astype(jnp.float32)
            pen_c = pen * activef
            n_active = jnp.sum(activef, axis=1, keepdims=True)
            share = jnp.maximum(n_active, 1.0)

            r_c = [cpts[k] - pos[k] for k in range(3)]
            v_c = _cross(angvel, r_c)
            v_rel = [linvel[k] + v_c[k] - v_surf[k] for k in range(3)]

            qv_c = [-qv[k] for k in range(3)]

            def inv_mass_along(d):
                rxd = _cross(r_c, d)
                rxd_b = _qrot(qw, qv_c, rxd)
                return 1.0 / mass + (
                    rxd_b[0] ** 2 * inv_in[0]
                    + rxd_b[1] ** 2 * inv_in[1]
                    + rxd_b[2] ** 2 * inv_in[2]
                )

            w_n = inv_mass_along(nrm)
            damp_cap = 0.9 / (w_n * share * dt)
            vn = _dot(v_rel, nrm)
            fn = p.contact_stiffness * pen_c - damp_cap * vn * activef
            fn = jnp.minimum(jnp.maximum(fn, 0.0) * activef, fn_clamp)

            f_n = [fn * nrm[k] for k in range(3)]
            f_contact = [jnp.sum(f_n[k], axis=1, keepdims=True)
                         for k in range(3)]
            tq = _cross(r_c, f_n)
            torque = [jnp.sum(tq[k], axis=1, keepdims=True) for k in range(3)]

            tau_b0 = _qrot(qw, qv_c, torque)
            dw_body = [dt * tau_b0[k] * inv_in[k] for k in range(3)]
            w_body = _qrot(qw, qv_c, angvel)
            dv_lin = [dt * f_contact[k] / mass for k in range(3)]
            dv_c = _clamp_passive(dv_lin, linvel, p.contact_dv_max)
            dw_c_body = _clamp_passive(dw_body, w_body, p.contact_dw_max)

            iw = [inert[k] * w_body[k] for k in range(3)]
            gyro_b = _cross(w_body, iw)
            v_pred = [linvel[k] + dv_c[k] for k in range(3)]
            v_pred[2] = v_pred[2] + dt * p.gravity
            dwg = [dw_c_body[k] - dt * gyro_b[k] * inv_in[k] for k in range(3)]
            dw_w = _qrot(qw, qv, dwg)
            w_pred = [angvel[k] + dw_w[k] for k in range(3)]

            # ---- friction impulse passes ----
            budget = p.friction_mu * fn * dt
            have = activef * (fn > 0).astype(jnp.float32)

            wxr = _cross(w_pred, r_c)
            v_cc = [v_pred[k] + wxr[k] - v_surf[k] for k in range(3)]
            vn_c = _dot(v_cc, nrm)
            vt = [v_cc[k] - vn_c * nrm[k] for k in range(3)]
            vt_n = _norm(vt)
            inv_vtn = 1.0 / jnp.maximum(vt_n, 1e-9)
            t_dir = [vt[k] * inv_vtn for k in range(3)]
            w_t = inv_mass_along(t_dir)

            def apply_impulse(v, w, j):
                imp = [-j * t_dir[k] for k in range(3)]
                dv = [jnp.sum(imp[k], axis=1, keepdims=True) / mass
                      for k in range(3)]
                rxi = _cross(r_c, imp)
                srxi = [jnp.sum(rxi[k], axis=1, keepdims=True)
                        for k in range(3)]
                tau_i = _qrot(qw, qv_c, srxi)
                dwb = [tau_i[k] * inv_in[k] for k in range(3)]
                dww = _qrot(qw, qv, dwb)
                return ([v[k] + dv[k] for k in range(3)],
                        [w[k] + dww[k] for k in range(3)])

            j1 = jnp.minimum(vt_n / (w_t * share), budget) * have
            v_out, w_out = apply_impulse(v_pred, w_pred, j1)
            budget = budget - j1
            for _ in range(max(p.friction_iters - 1, 0)):
                wxr2 = _cross(w_out, r_c)
                v_cc2 = [v_out[k] + wxr2[k] - v_surf[k] for k in range(3)]
                vt_along = _dot(v_cc2, t_dir)
                j2 = jnp.clip(vt_along / (w_t * share), 0.0, budget) * have
                v_out, w_out = apply_impulse(v_out, w_out, j2)
                budget = budget - j2

            # ---- rigid-set translational stiction (see fast.py) ----
            v_lin3 = [v_out[k] - v_surf[k] for k in range(3)]
            vn3 = _dot(v_lin3, nrm)
            vt3 = [(v_lin3[k] - vn3 * nrm[k]) * have for k in range(3)]
            fn_sum = jnp.sum(fn, axis=1, keepdims=True)
            inv_fs = 1.0 / jnp.maximum(fn_sum, 1e-9)
            vbar = [jnp.sum(fn * vt3[k], axis=1, keepdims=True) * inv_fs
                    for k in range(3)]
            vbar_n = _norm(vbar)
            pool = jnp.sum(budget, axis=1, keepdims=True)
            scale = jnp.minimum(1.0, pool / jnp.maximum(mass * vbar_n, 1e-9))
            gate = (fn_sum > 0).astype(jnp.float32)
            v_out = [v_out[k] - vbar[k] * scale * gate for k in range(3)]

            # ---- torsional friction (see fast.py) ----
            w_sa = [jnp.concatenate(
                [zero_ns, jnp.broadcast_to(h_ang[k], (E, 3 * NS))], axis=1)
                for k in range(3)]
            if p.torsion_patch_radius > 0:
                wmn = [w_out[k] - w_sa[k] for k in range(3)]
                s_rel = _dot(wmn, nrm)
                n_b = _qrot(qw, qv_c, nrm)
                w_rot = (n_b[0] ** 2 * inv_in[0] + n_b[1] ** 2 * inv_in[1]
                         + n_b[2] ** 2 * inv_in[2])
                l_cap = p.friction_mu * p.torsion_patch_radius * fn * dt
                lj = jnp.clip(s_rel / (w_rot * share), -l_cap, l_cap) * have
                dl_b = [jnp.sum(n_b[k] * (-lj), axis=1, keepdims=True)
                        for k in range(3)]
                dlb_in = [dl_b[k] * inv_in[k] for k in range(3)]
                dl_w = _qrot(qw, qv, dlb_in)
                w_out = [w_out[k] + dl_w[k] for k in range(3)]

            # ---- pad rotational stiction (see fast.py) ----
            if p.pad_rot_stiction:
                pad_have = have * is_pad_lane.astype(jnp.float32)
                w_rel = [(w_out[k] - w_sa[k]) * pad_have for k in range(3)]
                fnp = fn * pad_have
                fnp_sum = jnp.sum(fnp, axis=1, keepdims=True)
                inv_fps = 1.0 / jnp.maximum(fnp_sum, 1e-9)
                wbar = [jnp.sum(fnp * w_rel[k], axis=1, keepdims=True)
                        * inv_fps for k in range(3)]
                lever = _norm(r_c) + p.torsion_patch_radius
                pool_a = jnp.sum(p.friction_mu * fnp * lever * dt,
                                 axis=1, keepdims=True)
                wbar_b = _qrot(qw, qv_c, wbar)
                iwb = [inert[k] * wbar_b[k] for k in range(3)]
                l_need = _norm(iwb)
                sc_a = jnp.minimum(1.0, pool_a / jnp.maximum(l_need, 1e-9))
                gate_a = (fnp_sum > 0).astype(jnp.float32)
                w_out = [w_out[k] - wbar[k] * sc_a * gate_a for k in range(3)]

            # ---- damping, clips, integration ----
            inv_ld = 1.0 / (1.0 + p.linear_damping * dt)
            inv_ad = 1.0 / (1.0 + p.angular_damping * dt)
            linvel = [jnp.clip(v_out[k] * inv_ld, -p.max_linvel, p.max_linvel)
                      for k in range(3)]
            angvel = [jnp.clip(w_out[k] * inv_ad, -p.max_angvel, p.max_angvel)
                      for k in range(3)]
            pos = [pos[k] + dt * linvel[k] for k in range(3)]
            # quat += 0.5*dt*quat_mul((0, w), quat); renormalize
            ww, wwx, wwy, wwz = 0.0, angvel[0], angvel[1], angvel[2]
            dqw = -wwx * qx - wwy * qy - wwz * qz
            dqx = wwx * qw + wwy * qz - wwz * qy
            dqy = wwy * qw - wwx * qz + wwz * qx
            dqz = wwz * qw + wwx * qy - wwy * qx
            nqw = qw + 0.5 * dt * dqw
            nqx = qx + 0.5 * dt * dqx
            nqy = qy + 0.5 * dt * dqy
            nqz = qz + 0.5 * dt * dqz
            qn = jnp.sqrt(nqw**2 + nqx**2 + nqy**2 + nqz**2)
            inv_qn = 1.0 / jnp.maximum(qn, 1e-9)
            nq = [nqw * inv_qn, nqx * inv_qn, nqy * inv_qn, nqz * inv_qn]

            # ---- fingers (gear-coupled / legacy; mirrors fast.py) ----
            pen_l = jnp.maximum(pen_box[0], 0.0)
            pen_r = jnp.maximum(pen_box[1], 0.0)
            step_lim = p.finger_vel_limit * dt
            k_stiff = p.contact_stiffness
            f_l = k_stiff * jnp.sum(pen_l, axis=1, keepdims=True)
            f_r = k_stiff * jnp.sum(pen_r, axis=1, keepdims=True)
            n_l = jnp.sum((pen_l > 0).astype(jnp.float32), axis=1,
                          keepdims=True)
            n_r = jnp.sum((pen_r > 0).astype(jnp.float32), axis=1,
                          keepdims=True)
            if p.finger_gear_coupling:
                s = 0.5 * (qfl + qfr)
                tgt_s = 0.5 * (tgt_l + tgt_r)
                s_cand = s + jnp.clip(tgt_s - s, -step_lim, step_lim)
                f_tot = f_l + f_r
                n_tot = n_l + n_r
                floor = s + jnp.clip(
                    (f_tot - 2.0 * p.finger_force)
                    / (k_stiff * jnp.maximum(n_tot, 1.0)),
                    -step_lim, step_lim,
                )
                s_new = jnp.clip(jnp.maximum(s_cand, floor), 0.0, 0.04)
                qfl = s_new
                qfr = s_new
            else:
                for qf, tgt, fp, npd in ((0, tgt_l, f_l, n_l),
                                         (1, tgt_r, f_r, n_r)):
                    cur = qfl if qf == 0 else qfr
                    cand = cur + jnp.clip(tgt - cur, -step_lim, step_lim)
                    floor = cur + jnp.clip(
                        (fp - p.finger_force)
                        / (k_stiff * jnp.maximum(npd, 1.0)),
                        -step_lim, step_lim,
                    )
                    new = jnp.clip(jnp.maximum(cand, floor), 0.0, 0.04)
                    if qf == 0:
                        qfl = new
                    else:
                        qfr = new

            box_pen_any = jnp.maximum(
                jnp.maximum(
                    jnp.max(pen_box[0], axis=1, keepdims=True),
                    jnp.max(pen_box[1], axis=1, keepdims=True),
                ),
                jnp.max(pen_box[2], axis=1, keepdims=True),
            )
            grip = jnp.maximum(grip, (box_pen_any > 0).astype(jnp.float32))

            return (pos[0], pos[1], pos[2], nq[0], nq[1], nq[2], nq[3],
                    linvel[0], linvel[1], linvel[2],
                    angvel[0], angvel[1], angvel[2], qfl, qfr, grip)

        final = jax.lax.fori_loop(0, n, substep, carry0)
        out_ref[:] = jnp.concatenate(final, axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("p", "n", "interpret"))
def contact_scan_pallas(p, n, state16, hand, sph3, radii, mass1, inert,
                        fn_clamp, tgt, interpret=False):
    """state16 (B, 16); hand (n, B, 13); sph3 (3, B, NS); radii (B, NS);
    mass1 (B, 1); inert (B, 3); fn_clamp (B, C); tgt (B, 2) -> (B, 16).

    B must be a multiple of E and NS == 32 (callers pad; see
    physics/fast.py's dispatch)."""
    B = state16.shape[0]
    assert B % E == 0 and sph3.shape[2] == NS
    grid = (B // E,)
    f32 = jnp.float32
    return pl.pallas_call(
        _make_kernel(p, n),
        out_shape=jax.ShapeDtypeStruct((B, 16), f32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((E, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, E, 13), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, E, NS), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, NS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((E, 16), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(state16.astype(f32), hand.astype(f32), sph3.astype(f32),
      radii.astype(f32), mass1.astype(f32), inert.astype(f32),
      fn_clamp.astype(f32), tgt.astype(f32))


def contact_scan_available() -> bool:
    """Dispatch switch: same policy as the point-op kernels."""
    return pallas_enabled()
