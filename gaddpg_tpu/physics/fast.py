"""Batched fast-path physics: the whole env batch in one program.

Same contact model as step.py (spring normals + impulse-capped damping,
iterated cone-budgeted friction, penetration-limited fingers,
accel-limited arm servo) restructured for throughput:

- operates on the full (B, ...) env batch directly -- no vmap of
  per-env programs;
- ZERO matmul-class ops in the loop: every rotation is quaternion
  component math (batched 4x4/3x3 matmuls are pathologically slow on
  the target device and no faster than elementwise chains on real TPU
  at these sizes);
- the arm joint trajectory and all hand poses/velocities for the
  `substeps` horizon are precomputed OUTSIDE the object scan (the arm
  is position-servoed and feels no reaction forces, so its trajectory
  is object-independent);
- the three gripper boxes (2 finger pads + palm) are evaluated as one
  stacked (B, 3, NS) contact batch.

Validation contract: behavior must match the reference-path
(minimal_rollout seeds, settle/lift tests), not op-for-op equality.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gaddpg_tpu.geometry.rotations import quat_mul, quat_rotate, quat_normalize
from gaddpg_tpu.physics.contact import clamp_passive_delta
from gaddpg_tpu.physics.types import PhysicsParams, PhysicsState
from gaddpg_tpu.utils.precision import f32_matmuls
from gaddpg_tpu.robot.panda import _ORIGINS, _T_HAND

# ---------------------------------------------------------------------------
# constant chain as quaternions (host-side)
# ---------------------------------------------------------------------------

def _mat_to_quat_np(m):
    from scipy.spatial.transform import Rotation as R

    q = R.from_matrix(m).as_quat()
    return np.roll(q, 1, axis=-1)


_OQ = jnp.asarray(_mat_to_quat_np(_ORIGINS[:, :3, :3]))   # (7, 4)
_OT = jnp.asarray(_ORIGINS[:, :3, 3])                      # (7, 3)
_HQ = jnp.asarray(_mat_to_quat_np(_T_HAND[:3, :3]))        # (4,)
_HT = jnp.asarray(_T_HAND[:3, 3])                          # (3,)


def fk_hand_batched(q):
    """Batched hand pose from arm joints q (..., 7) -> (pos, quat)."""
    batch = q.shape[:-1]
    pos = jnp.zeros(batch + (3,), q.dtype)
    rot = jnp.broadcast_to(
        jnp.array([1.0, 0, 0, 0], q.dtype), batch + (4,)
    )
    for i in range(7):
        pos = pos + quat_rotate(rot, jnp.broadcast_to(_OT[i], batch + (3,)))
        rot = quat_mul(rot, jnp.broadcast_to(_OQ[i], batch + (4,)))
        half = q[..., i] * 0.5
        zq = jnp.stack(
            [jnp.cos(half), jnp.zeros_like(half), jnp.zeros_like(half),
             jnp.sin(half)], axis=-1
        )
        rot = quat_mul(rot, zq)
    pos = pos + quat_rotate(rot, jnp.broadcast_to(_HT, batch + (3,)))
    rot = quat_mul(rot, jnp.broadcast_to(_HQ, batch + (4,)))
    return pos, rot


def arm_trajectory(p: PhysicsParams, q0, qd0, q_tgt, n: int):
    """Trapezoidal servo rollout: (n, B, 7) joint positions + final qd."""

    def body(carry, _):
        q, qd = carry
        err = q_tgt - q
        v_brake = jnp.sqrt(2.0 * p.arm_acc_limit * jnp.abs(err))
        v_des = jnp.sign(err) * jnp.minimum(v_brake, p.arm_vel_limit)
        qd = jnp.clip(v_des, qd - p.arm_acc_limit * p.dt,
                      qd + p.arm_acc_limit * p.dt)
        q = q + qd * p.dt
        return (q, qd), q

    (qn, qdn), q_traj = jax.lax.scan(body, (q0, qd0), None, length=n)
    return q_traj, qdn


# ---------------------------------------------------------------------------
# fused Pallas contact scan (ops/pallas_physics.py): the entire substep
# loop as one TPU kernel, state resident in VMEM. Dispatched on TPU
# backends (GADDPG_PALLAS=0 opts out); the lax.scan below is the XLA
# reference path and the parity target (tests/test_pallas_physics.py).
# ---------------------------------------------------------------------------

def _resolve_scan_impl(scan_impl):
    """None -> auto: Pallas on TPU backends unless GADDPG_PALLAS_PHYSICS=0.

    Explicit values ("xla" | "pallas" | "interpret") are for tests and
    benchmarks; `scan_impl` is a static jit arg so each choice compiles
    its own executable."""
    if scan_impl is not None:
        return scan_impl
    import os

    if os.environ.get("GADDPG_PALLAS_PHYSICS", "") == "0":
        return "xla"
    from gaddpg_tpu.ops.pallas_physics import contact_scan_available

    return "pallas" if contact_scan_available() else "xla"


def _pallas_contact_scan(p, n, obj, arm, sphere_sets, mass, inertia,
                         hand_pos, hand_quat, hand_lin, hand_ang,
                         interpret=False):
    """Pack state/constants into the kernel's tiled layouts, run, unpack.

    Pads B up to a multiple of the env tile and the sphere set up to the
    kernel's NS=32 lanes (padding spheres parked at z=+1e6 with radius 0
    can never contact)."""
    from gaddpg_tpu.ops import pallas_physics as pp

    B = mass.shape[0]
    ns = sphere_sets.shape[1]
    Bp = ((B + pp.E - 1) // pp.E) * pp.E

    state16 = jnp.concatenate(
        [obj.pos, obj.quat, obj.linvel, obj.angvel, arm.q[:, 7:9],
         jnp.zeros((B, 1))], axis=1,
    )
    hand = jnp.concatenate([hand_pos, hand_quat, hand_lin, hand_ang], axis=-1)

    sph = sphere_sets
    if ns < pp.NS:
        pad = jnp.zeros((B, pp.NS - ns, 4)).at[:, :, 2].set(1e6)
        sph = jnp.concatenate([sph, pad], axis=1)
    sph3 = jnp.moveaxis(sph[..., :3], -1, 0)             # (3, B, NS)
    radii = sph[..., 3]
    # fn_clamp groups are uniform per primitive, so rebuild at NS lanes
    fncl = jnp.concatenate(
        [
            jnp.full((B, pp.NS), p.table_max_force),
            jnp.full((B, 2 * pp.NS), 2.0 * p.finger_force),
            jnp.full((B, pp.NS), p.palm_max_force),
        ],
        axis=1,
    )
    tgt = arm.q_target[:, 7:9]

    def pad_b(x):
        if Bp == B:
            return x
        reps = [(0, 0)] * x.ndim
        ax = 1 if x.ndim == 3 and x.shape[0] in (3, n) else 0
        reps[ax] = (0, Bp - B)
        return jnp.pad(x, reps, mode="edge")

    out = pp.contact_scan_pallas(
        p, n, pad_b(state16), pad_b(hand), pad_b(sph3), pad_b(radii),
        pad_b(mass[:, None]), pad_b(inertia), pad_b(fncl), pad_b(tgt),
        interpret=interpret,
    )[:B]
    return (out[:, 0:3], out[:, 3:7], out[:, 7:10], out[:, 10:13],
            out[:, 13:15], out[:, 15] > 0.5)


# ---------------------------------------------------------------------------
# the object-dynamics scan
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("p", "substeps", "scan_impl"))
@f32_matmuls
def fast_physics_step(p: PhysicsParams, state: PhysicsState, sphere_sets,
                      mass, inertia, substeps=None, scan_impl=None):
    """Advance a (B,)-batched PhysicsState by `substeps` 1-ms ticks.

    sphere_sets (B, NS, 4); mass (B,); inertia (B, 3).
    Matches physics_step semantics (base at the world origin).
    `scan_impl`: None = auto (fused Pallas kernel on TPU backends, XLA
    lax.scan elsewhere); "xla" | "pallas" | "interpret" force a path.
    """
    n = substeps if substeps is not None else p.substeps
    impl = _resolve_scan_impl(scan_impl)
    B = mass.shape[0]
    arm = state.arm

    # ---- hoisted arm trajectory + hand poses/velocities ----
    q_traj, qd_final = arm_trajectory(
        p, arm.q[:, :7], arm.qd, arm.q_target[:, :7], n
    )
    q_all = jnp.concatenate([arm.q[None, :, :7], q_traj], axis=0)  # (n+1, B, 7)
    hand_pos_all, hand_quat_all = fk_hand_batched(q_all)
    hand_pos = hand_pos_all[1:]
    hand_quat = hand_quat_all[1:]
    hand_lin = (hand_pos_all[1:] - hand_pos_all[:-1]) / p.dt
    # angular velocity from quaternion increments: w = 2 (dq x q^-1).vec
    dq = hand_quat_all[1:] - hand_quat_all[:-1]
    qc = hand_quat_all[:-1] * jnp.array([1.0, -1, -1, -1])
    wq = quat_mul(dq, qc) * (2.0 / p.dt)
    hand_ang = wq[..., 1:]

    sph_local = sphere_sets[..., :3]          # (B, NS, 3)
    radii = sphere_sets[..., 3]               # (B, NS)
    ns = radii.shape[1]
    fhe = jnp.asarray(p.finger_half_extents)
    phe = jnp.asarray(p.palm_half_extents)
    half_ext = jnp.stack([fhe, fhe, phe])     # (3 boxes, 3)
    mass_c = mass[:, None]
    inv_inertia = 1.0 / inertia               # (B, 3)
    # loop-invariant constants (hoisted: every op inside the scan body
    # re-executes per substep)
    fn_clamp = jnp.concatenate(
        [
            jnp.full((B, ns), p.table_max_force),
            jnp.full((B, 2 * ns), 2.0 * p.finger_force),
            jnp.full((B, ns), p.palm_max_force),
        ],
        axis=1,
    )
    off_p_const = jnp.broadcast_to(jnp.asarray(p.palm_center), (B, 3))
    _dvw_caps = jnp.array([[p.contact_dv_max], [p.contact_dw_max]])  # (2, 1)

    def substep(carry, xs):
        pos, quat, linvel, angvel, q_f, grip_any = carry
        h_pos, h_quat, h_lin, h_ang = xs       # (B,3), (B,4), (B,3), (B,3)

        # ---- sphere world positions / velocities ----
        centers = pos[:, None, :] + quat_rotate(quat[:, None, :], sph_local)
        r_off = centers - pos[:, None, :]
        vels = linvel[:, None, :] + jnp.cross(angvel[:, None, :], r_off)

        # ---- gripper boxes: stacked (B, 3, NS) ----
        # box offsets in hand frame
        off_l = jnp.stack(
            [jnp.zeros((B,)), q_f[:, 0] + fhe[1], jnp.full((B,), p.finger_z_center)],
            axis=-1,
        )
        off_r = jnp.stack(
            [jnp.zeros((B,)), -(q_f[:, 1] + fhe[1]), jnp.full((B,), p.finger_z_center)],
            axis=-1,
        )
        box_off = jnp.stack([off_l, off_r, off_p_const], axis=1)  # (B,3,3) hand frame
        box_t = h_pos[:, None, :] + quat_rotate(h_quat[:, None, :], box_off)

        # one rotate of the sphere set into the hand frame; the three
        # boxes are axis-aligned there, so their SDFs need no further
        # rotation (saves two (B,3,NS,3)-sized quaternion rotates)
        hq_c = h_quat * jnp.array([1.0, -1, -1, -1])
        c_hand = quat_rotate(hq_c[:, None, :], centers - h_pos[:, None, :])
        p_loc = c_hand[:, None, :, :] - box_off[:, :, None, :]   # (B,3,NS,3)

        qd_box = jnp.abs(p_loc) - half_ext[None, :, None, :]     # (B,3,NS,3)
        outside = jnp.maximum(qd_box, 0.0)
        d_out = jnp.linalg.norm(outside, axis=-1)
        d_in = jnp.minimum(jnp.max(qd_box, axis=-1), 0.0)
        sdf = d_out + d_in
        n_out = outside * jnp.sign(p_loc)
        n_out = n_out / jnp.maximum(
            jnp.linalg.norm(n_out, axis=-1, keepdims=True), 1e-9
        )
        in_axis = jnp.argmax(qd_box, axis=-1)
        n_in = (in_axis[..., None] == jnp.arange(3)) * jnp.sign(p_loc)
        n_loc = jnp.where((d_out > 0)[..., None], n_out, n_in)
        n_box = quat_rotate(h_quat[:, None, None, :], n_loc)     # world
        # radius-0 padding spheres never contact (mask keeps ns < NS
        # library sets safe even if the body flips the parked padding
        # into a half-space test)
        real = radii > 0                                         # (B,NS)
        pen_box = jnp.where(real[:, None, :],
                            radii[:, None, :] - sdf, -1.0)       # (B,3,NS)

        # box surface velocity at contacts
        cpts_box = centers[:, None, :, :] - n_box * radii[:, None, :, None]
        v_box = h_lin[:, None, None, :] + jnp.cross(
            h_ang[:, None, None, :], cpts_box - box_t[:, :, None, :]
        )

        # ---- table plane ----
        pen_tab = jnp.where(
            real, radii - (centers[..., 2] - p.table_z), -1.0
        )                                                        # (B,NS)
        n_tab = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), centers.shape)
        cpts_tab = centers - n_tab * radii[..., None]

        # ---- flatten contacts: (B, C=4*NS) ----
        pen = jnp.concatenate([pen_tab, pen_box.reshape(B, 3 * ns)], axis=1)
        nrm = jnp.concatenate(
            [n_tab, n_box.reshape(B, 3 * ns, 3)], axis=1
        )
        cpts = jnp.concatenate([cpts_tab, cpts_box.reshape(B, 3 * ns, 3)], axis=1)
        v_surf = jnp.concatenate(
            [jnp.zeros_like(cpts_tab), v_box.reshape(B, 3 * ns, 3)], axis=1
        )

        active = pen > 0
        pen_c = jnp.where(active, pen, 0.0)
        n_active = jnp.sum(active, axis=1)                        # (B,)
        share = jnp.maximum(n_active, 1).astype(pen.dtype)[:, None]

        r_c = cpts - pos[:, None, :]
        v_c = linvel[:, None, :] + jnp.cross(angvel[:, None, :], r_c)
        v_rel = v_c - v_surf

        # inverse effective mass along the normal, all in quaternion math:
        # w_n = 1/m + sum_k (r x n)_body_k^2 / I_k
        q_c = quat * jnp.array([1.0, -1, -1, -1])

        def inv_mass_along(d):
            rxd = jnp.cross(r_c, d)
            rxd_b = quat_rotate(q_c[:, None, :], rxd)
            return 1.0 / mass_c + jnp.sum(
                rxd_b**2 * inv_inertia[:, None, :], axis=-1
            )

        w_n = inv_mass_along(nrm)
        damp_cap = 0.9 / (w_n * share * p.dt)
        vn = jnp.sum(v_rel * nrm, axis=-1)
        fn = p.contact_stiffness * pen_c - damp_cap * vn * active
        fn = jnp.minimum(jnp.maximum(fn, 0.0) * active, fn_clamp)

        f_n = fn[..., None] * nrm
        f_contact = jnp.sum(f_n, axis=1)
        torque = jnp.sum(jnp.cross(r_c, f_n), axis=1)
        # passive-contact dv/dw cap (see PhysicsParams.contact_dv_max):
        # braking up to reversal is free, speed gain is capped. Linear
        # and angular halves share one (B, 2, 3) clamp call -- the scan
        # body pays per HLO op, so halving the op count matters here.
        tau_b0 = quat_rotate(q_c, torque)
        dw_body = p.dt * tau_b0 * inv_inertia
        w_body = quat_rotate(q_c, angvel)
        dv_pair = jnp.stack([p.dt * f_contact / mass_c, dw_body], axis=1)
        v_pair = jnp.stack([linvel, w_body], axis=1)
        d_pair = clamp_passive_delta(dv_pair, v_pair, _dvw_caps)
        dv_c = d_pair[:, 0]
        dw_c_body = d_pair[:, 1]

        # gyroscopic term + I^-1 application via body frame
        gyro_b = jnp.cross(w_body, inertia * w_body)
        v_pred = linvel + dv_c
        v_pred = v_pred.at[:, 2].add(p.dt * p.gravity)
        w_pred = angvel + quat_rotate(
            quat, dw_c_body - p.dt * gyro_b * inv_inertia
        )

        # ---- friction impulse passes ----
        # Pass 1 establishes the slip direction t_dir and effective mass
        # w_t; later passes only re-measure the residual velocity along
        # t_dir (the direction barely rotates between passes, and
        # inv_mass_along is the most expensive block in the substep).
        budget = p.friction_mu * fn * p.dt
        have = fn > 0

        v_cc = v_pred[:, None, :] + jnp.cross(w_pred[:, None, :], r_c) - v_surf
        vn_c = jnp.sum(v_cc * nrm, axis=-1, keepdims=True)
        vt = v_cc - vn_c * nrm
        vt_n = jnp.linalg.norm(vt, axis=-1)
        t_dir = vt / jnp.maximum(vt_n[..., None], 1e-9)
        w_t = inv_mass_along(t_dir)

        def apply_impulse(v, w, j):
            imp = -j[..., None] * t_dir
            dv = jnp.sum(imp, axis=1) / mass_c
            tau_i = quat_rotate(q_c, jnp.sum(jnp.cross(r_c, imp), axis=1))
            dw = quat_rotate(quat, tau_i * inv_inertia)
            return v + dv, w + dw

        j1 = jnp.minimum(vt_n / (w_t * share), budget) * have
        v_out, w_out = apply_impulse(v_pred, w_pred, j1)
        budget = budget - j1
        for _ in range(max(p.friction_iters - 1, 0)):
            v_cc2 = v_out[:, None, :] + jnp.cross(w_out[:, None, :], r_c) - v_surf
            vt_along = jnp.sum(v_cc2 * t_dir, axis=-1)
            j2 = jnp.clip(vt_along / (w_t * share), 0.0, budget) * have
            v_out, w_out = apply_impulse(v_out, w_out, j2)
            budget = budget - j2

        # rigid-set translational stiction pass: per-contact Jacobi
        # shares are sized by w_t = 1/m + (r x t)^T I^-1 (r x t), which
        # assumes each impulse also stops slip through rotation -- but
        # for symmetric contact sets (a two-pad pinch) the angular
        # responses of opposing contacts CANCEL, so every pass removes
        # only the ~1/(1 + m*a) linear fraction and a pinched object
        # creeps out under gravity at ~cm/s. One aggregate impulse stops
        # the fn-weighted common-mode slip exactly, bounded by the
        # pooled remaining Coulomb budget; rotation-mode slip stays with
        # the per-contact passes above.
        # LINEAR slip only (no w x r term): subtracting a pure function
        # of v_out is a contraction -- rotational contact motion must
        # not leak into this pass or a body jammed while rotating gets
        # translational energy pumped in every substep.
        v_lin3 = v_out[:, None, :] - v_surf
        vn3 = jnp.sum(v_lin3 * nrm, axis=-1, keepdims=True)
        vt3 = (v_lin3 - vn3 * nrm) * have[..., None]
        fn_sum = jnp.sum(fn, axis=1, keepdims=True)
        vbar = jnp.sum(fn[..., None] * vt3, axis=1) / jnp.maximum(fn_sum, 1e-9)
        vbar_n = jnp.linalg.norm(vbar, axis=-1, keepdims=True)
        pool = jnp.sum(budget, axis=1, keepdims=True)
        scale = jnp.minimum(1.0, pool / jnp.maximum(mass_c * vbar_n, 1e-9))
        v_out = v_out - vbar * scale * (fn_sum > 0)

        # torsional (spinning) friction: one impulse pass resisting
        # rotation about each contact normal through the finite pad
        # patch (see PhysicsParams.torsion_patch_radius) -- without it a
        # pinched curved body swings out of the grasp about the closing
        # axis, which point-contact linear friction cannot resist.
        if p.torsion_patch_radius > 0:
            w_surf_ang = jnp.concatenate(
                [
                    jnp.zeros((B, ns, 3)),
                    jnp.broadcast_to(h_ang[:, None, :], (B, 3 * ns, 3)),
                ],
                axis=1,
            )
            s_rel = jnp.sum((w_out[:, None, :] - w_surf_ang) * nrm, axis=-1)
            n_b = quat_rotate(q_c[:, None, :], nrm)
            w_rot = jnp.sum(n_b**2 * inv_inertia[:, None, :], axis=-1)
            l_cap = p.friction_mu * p.torsion_patch_radius * fn * p.dt
            lj = jnp.clip(s_rel / (w_rot * share), -l_cap, l_cap) * have
            dl_b = jnp.sum(n_b * (-lj)[..., None], axis=1)
            w_out = w_out + quat_rotate(quat, dl_b * inv_inertia)

        # aggregate rotational stiction over the PAD contacts (see
        # PhysicsParams.pad_rot_stiction): stops the common-mode angular
        # slip of the object against the hand that the per-contact
        # passes under-remove in symmetric pinches (screw-out mode).
        if p.pad_rot_stiction:
            pad_have = have.at[:, :ns].set(False)          # exclude table
            w_surf_p = jnp.broadcast_to(h_ang[:, None, :], (B, 4 * ns, 3))
            w_rel = (w_out[:, None, :] - w_surf_p) * pad_have[..., None]
            fnp = fn * pad_have
            fnp_sum = jnp.sum(fnp, axis=1, keepdims=True)
            wbar = jnp.sum(fnp[..., None] * w_rel, axis=1) / jnp.maximum(
                fnp_sum, 1e-9
            )
            # pooled torque budget: lever = contact offset + pad patch
            lever = jnp.linalg.norm(r_c, axis=-1) + p.torsion_patch_radius
            pool_ang = jnp.sum(
                p.friction_mu * fnp * lever * p.dt, axis=1, keepdims=True
            )
            wbar_b = quat_rotate(q_c, wbar)
            l_need = jnp.linalg.norm(inertia * wbar_b, axis=-1, keepdims=True)
            scale_a = jnp.minimum(1.0, pool_ang / jnp.maximum(l_need, 1e-9))
            w_out = w_out - wbar * scale_a * (fnp_sum > 0)

        linvel = jnp.clip(v_out / (1.0 + p.linear_damping * p.dt),
                          -p.max_linvel, p.max_linvel)
        angvel = jnp.clip(w_out / (1.0 + p.angular_damping * p.dt),
                          -p.max_angvel, p.max_angvel)
        pos = pos + p.dt * linvel
        w_q = jnp.concatenate([jnp.zeros((B, 1)), angvel], axis=-1)
        quat = quat_normalize(quat + 0.5 * p.dt * quat_mul(w_q, quat))

        # ---- fingers: penetration-limited servo ----
        pen_l = jnp.where(pen_box[:, 0] > 0, pen_box[:, 0], 0.0)
        pen_r = jnp.where(pen_box[:, 1] > 0, pen_box[:, 1], 0.0)
        step_lim = p.finger_vel_limit * p.dt
        tgt_f = arm.q_target[:, 7:9]
        k = p.contact_stiffness
        f_pad = k * jnp.stack([jnp.sum(pen_l, axis=1), jnp.sum(pen_r, axis=1)], -1)
        n_pad = jnp.stack(
            [jnp.sum(pen_l > 0, axis=1), jnp.sum(pen_r > 0, axis=1)], -1
        ).astype(q_f.dtype)
        if p.finger_gear_coupling:
            # gear-coupled pair (see PhysicsParams.finger_gear_coupling):
            # one opening DOF driven by the TOTAL pad force
            s = jnp.mean(q_f, axis=-1, keepdims=True)
            tgt_s = jnp.mean(tgt_f, axis=-1, keepdims=True)
            s_cand = s + jnp.clip(tgt_s - s, -step_lim, step_lim)
            f_tot = jnp.sum(f_pad, axis=-1, keepdims=True)
            n_tot = jnp.sum(n_pad, axis=-1, keepdims=True)
            floor = s + jnp.clip(
                (f_tot - 2.0 * p.finger_force) / (k * jnp.maximum(n_tot, 1.0)),
                -step_lim, step_lim,
            )
            s_new = jnp.clip(jnp.maximum(s_cand, floor), 0.0, 0.04)
            q_f = jnp.broadcast_to(s_new, (B, 2))
        else:
            qf_cand = q_f + jnp.clip(tgt_f - q_f, -step_lim, step_lim)
            floor = q_f + jnp.clip(
                (f_pad - p.finger_force) / (k * jnp.maximum(n_pad, 1.0)),
                -step_lim, step_lim,
            )
            q_f = jnp.clip(jnp.maximum(qf_cand, floor), 0.0, 0.04)

        grip_now = jnp.any(pen_box.reshape(B, -1) > 0, axis=1)
        return (pos, quat, linvel, angvel, q_f, grip_any | grip_now), None

    obj = state.obj
    if impl in ("pallas", "interpret"):
        pos, quat, linvel, angvel, q_f, grip_any = _pallas_contact_scan(
            p, n, obj, arm, sphere_sets, mass, inertia,
            hand_pos, hand_quat, hand_lin, hand_ang,
            interpret=(impl == "interpret"),
        )
    else:
        carry0 = (
            obj.pos, obj.quat, obj.linvel, obj.angvel,
            arm.q[:, 7:9], jnp.zeros((B,), bool),
        )
        xs = (hand_pos, hand_quat, hand_lin, hand_ang)
        (pos, quat, linvel, angvel, q_f, grip_any), _ = jax.lax.scan(
            substep, carry0, xs
        )

    q_new = jnp.concatenate([q_traj[-1], q_f], axis=-1)
    return state.replace(
        arm=arm.replace(q=q_new, qd=qd_final),
        obj=obj.replace(pos=pos, quat=quat, linvel=linvel, angvel=angvel),
        contact_force=jnp.zeros((B,)),
        gripper_contact=grip_any,
    )
