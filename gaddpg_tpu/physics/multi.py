"""Multi-body batched physics: target + K dynamic clutter bodies per env.

The reference steps ALL scene bodies in PyBullet, so obstacles react to
pushes, get knocked over, and register robot-obstacle contact events
(reference: env/panda_scene.py:354-387, 995-1035, 1078-1095). This
module generalizes the validated single-object hot path (physics/fast.py)
to M = K+1 free bodies per env:

- all per-body machinery (table + gripper-box contacts, spring normals
  with impulse-capped damping, cone-budgeted Jacobi friction passes,
  passive-contact clamp, semi-implicit integration) runs with the body
  axis FOLDED into the batch axis: (B, M) bodies -> B*M independent
  "envs" sharing precomputed hand trajectories. Zero matmul-class ops,
  same op count as fast.py -- only the array sizes grow by M.
- the two coupling terms that cannot fold:
  1. fingers: the penetration-limited finger servo reacts to pad
     penetration from EVERY body (reshape (B, M, ...) -> sum over M);
  2. object-object contact: penalty spring-damper forces between
     per-body coarse sphere sets (ObjectLibrary.coarse_spheres), with
     stiction-exact tangential friction capped by the Coulomb cone
     (the stick impulse brakes slide to zero within the substep, using
     the pair's rotational effective mass along the slide). Computed
     as a full (M, M) antisymmetric tensor, so Newton's third law holds
     exactly and momentum is conserved up to table/gripper friction.

Behavior contract (not op-for-op): with clutter parked far away the
target's trajectory matches fast_physics_step (tests/test_multi_physics.py
asserts this); settled clutter stays put; pushed clutter moves and can
topple; gripper-clutter penetration raises the collision event.
"""

from functools import partial

import jax
import jax.numpy as jnp

from gaddpg_tpu.geometry.rotations import quat_mul, quat_rotate, quat_normalize
from gaddpg_tpu.physics.contact import clamp_passive_delta
from gaddpg_tpu.physics.fast import arm_trajectory, fk_hand_batched
from gaddpg_tpu.physics.types import BodyState, PhysicsParams, PhysicsState
from gaddpg_tpu.utils.precision import f32_matmuls


def _pair_forces(p: PhysicsParams, pos, quat, linvel, angvel, coarse, mass,
                 inertia):
    """Object-object contact forces between coarse sphere sets.

    pos/quat/linvel/angvel: (B, M, ...) body states; coarse (B, M, NC, 4)
    object-frame spheres (radius 0 = padding); mass (B, M). Returns
    per-body force and torque (B, M, 3). Entry (i, j) is the force ON i
    FROM j; the formula is odd under i<->j so the sum conserves momentum.

    Stability comes from a PAIR-level impulse cap instead of the
    per-body passive clamp (which is asymmetric -- unlimited braking on
    one body, capped acceleration on the other -- and would destroy
    momentum in impacts): the normal force may brake the pair's relative
    approach completely (inelastic impact, momentum -> common velocity)
    but may add at most contact_dv_max of relative separation speed per
    substep, so a deep overlap relaxes instead of ejecting. The cap
    scales a per-pair FORCE, identical on both bodies, so Newton's
    third law survives it.
    """
    rc = coarse[..., 3]                                          # (B,M,NC)
    cw = pos[:, :, None, :] + quat_rotate(quat[:, :, None, :], coarse[..., :3])
    # sphere-pair geometry: i index on axes (1,3), j on axes (2,4)
    d = cw[:, :, None, :, None, :] - cw[:, None, :, None, :, :]  # (B,M,M,NC,NC,3)
    dist = jnp.linalg.norm(d, axis=-1)
    nrm = d / jnp.maximum(dist, 1e-9)[..., None]
    pen = (rc[:, :, None, :, None] + rc[:, None, :, None, :]) - dist

    M = pos.shape[1]
    not_self = ~jnp.eye(M, dtype=bool)[None, :, :, None, None]
    live = (rc[:, :, None, :, None] > 0) & (rc[:, None, :, None, :] > 0)
    active = (pen > 0) & not_self & live
    pen_c = jnp.where(active, pen, 0.0)

    # contact point: mid-penetration between the two sphere surfaces
    cp = cw[:, :, None, :, None, :] - nrm * (
        rc[:, :, None, :, None, None] - 0.5 * pen_c[..., None]
    )
    # surface velocities of both bodies at the contact point
    r_i = cp - pos[:, :, None, None, None, :]
    r_j = cp - pos[:, None, :, None, None, :]
    v_i = linvel[:, :, None, None, None, :] + jnp.cross(
        angvel[:, :, None, None, None, :], r_i
    )
    v_j = linvel[:, None, :, None, None, :] + jnp.cross(
        angvel[:, None, :, None, None, :], r_j
    )
    v_rel = v_i - v_j
    vn = jnp.sum(v_rel * nrm, axis=-1)

    # damping must be impulse-capped for stability (an explicit damper
    # c > 2/(dt*w_pair) pumps the pair's rocking mode; these are light
    # objects, so 2*sqrt(k) would already be over the bound)
    w_pair = (1.0 / mass)[:, :, None, None, None] + (1.0 / mass)[:, None, :, None, None]
    n_active_pair = jnp.sum(active, axis=(3, 4))              # (B, M, M)
    share = jnp.maximum(n_active_pair, 1)[..., None, None].astype(pen_c.dtype)
    damp = 0.9 / (p.dt * w_pair * share)
    fn = p.contact_stiffness * pen_c - damp * vn * active

    # pair impulse cap: the force may brake the relative approach to
    # zero and push separation up to obj_obj_sep_vmax -- an absolute
    # ceiling, not a per-substep increment, so penetration relaxes at a
    # bounded speed no matter how many substeps it lasts
    dv_allow = jnp.maximum(-vn, 0.0) + jnp.maximum(
        p.obj_obj_sep_vmax - jnp.maximum(vn, 0.0), 0.0
    )
    f_cap = dv_allow / (p.dt * w_pair * share)
    fn = jnp.minimum(fn, f_cap)
    fn = jnp.clip(jnp.maximum(fn, 0.0) * active, 0.0, p.obj_obj_max_force)

    vt = v_rel - vn[..., None] * nrm
    vt_n = jnp.linalg.norm(vt, axis=-1)
    # stiction-exact tangential pass (round 4; was viscous): the force
    # brakes the relative slide to ZERO within the substep when the
    # Coulomb budget allows it, so stacked/leaning clutter holds instead
    # of creeping under sustained tangential load. The stick impulse
    # uses the pair's effective inverse mass ALONG THE SLIDE DIRECTION
    # -- 1/m + (r x t)^T I^-1 (r x t), same form as the single-body
    # friction stack in fast.py -- because the contact torque feeds
    # back into the contact-point velocity; the linear-only w_pair
    # would overshoot and ring.
    t_dir = vt / jnp.maximum(vt_n, 1e-9)[..., None]
    q_conj = quat * jnp.array([1.0, -1, -1, -1])
    rxt_i = quat_rotate(
        q_conj[:, :, None, None, None, :], jnp.cross(r_i, t_dir)
    )
    rxt_j = quat_rotate(
        q_conj[:, None, :, None, None, :], jnp.cross(r_j, t_dir)
    )
    inv_I = 1.0 / inertia
    w_rot = jnp.sum(
        rxt_i**2 * inv_I[:, :, None, None, None, :], axis=-1
    ) + jnp.sum(rxt_j**2 * inv_I[:, None, :, None, None, :], axis=-1)
    f_stick = 0.9 * vt_n / (p.dt * (w_pair + w_rot) * share)
    ft_mag = jnp.minimum(f_stick, p.friction_mu * fn)
    f_pair = fn[..., None] * nrm - ft_mag[..., None] * (
        vt / jnp.maximum(vt_n, 1e-9)[..., None]
    )

    force = jnp.sum(f_pair, axis=(2, 3, 4))                       # (B,M,3)
    torque = jnp.sum(jnp.cross(r_i, f_pair), axis=(2, 3, 4))

    # pair ROLLING stiction (round 4): coarse-sphere proxies make every
    # object-object contact a point contact with zero rolling
    # resistance, so a box stacked on a box "rolls" off the sphere
    # bumps even when slide stiction holds (a rolling contact point has
    # no relative slip for the tangential pass to brake). Real flat
    # faces resist rolling with a torque up to mu * N * patch_radius;
    # apply that as a stiction-style brake on the PAIR's relative
    # angular velocity, equal-and-opposite so total angular momentum is
    # conserved. Budget scales with the summed normal force, so free
    # flight and glancing hits keep their spin.
    w_rel = angvel[:, :, None, :] - angvel[:, None, :, :]         # (B,M,M,3)
    wn_rel = jnp.linalg.norm(w_rel, axis=-1)
    inv_I_pair = jnp.max(inv_I, axis=-1)[:, :, None] + jnp.max(
        inv_I, axis=-1
    )[:, None, :]                                                 # (B,M,M)
    tau_stick = 0.9 * wn_rel / (p.dt * jnp.maximum(inv_I_pair, 1e-9))
    fn_sum = jnp.sum(fn, axis=(3, 4))                             # (B,M,M)
    tau_budget = p.friction_mu * fn_sum * p.obj_obj_roll_patch
    tau_mag = jnp.minimum(tau_stick, tau_budget)
    tau_roll = -tau_mag[..., None] * (
        w_rel / jnp.maximum(wn_rel, 1e-9)[..., None]
    )
    torque = torque + jnp.sum(tau_roll, axis=2)
    return force, torque


@partial(jax.jit, static_argnames=("p", "substeps"))
@f32_matmuls
def multi_physics_step(p: PhysicsParams, state: PhysicsState, spheres,
                       coarse, mass, inertia, clutter: BodyState,
                       substeps=None):
    """Advance a (B,)-batched arm + M = K+1 free bodies by `substeps` ticks.

    state: PhysicsState with (B,) batch -- arm + target (body 0).
    clutter: BodyState with (B, K, ...) leaves -- bodies 1..K.
    spheres (B, M, NS, 4), coarse (B, M, NC, 4), mass (B, M),
    inertia (B, M, 3): per-body contact geometry/dynamics, body 0 first.

    Returns (new PhysicsState, new clutter BodyState, clutter_hit (B,))
    where clutter_hit = any gripper-box penetration by a clutter body
    during the step (the reference's robot-obstacle collision event).
    """
    n = substeps if substeps is not None else p.substeps
    B, M = mass.shape
    BM = B * M
    K = M - 1
    arm = state.arm

    # ---- hoisted arm trajectory + hand poses/velocities (as fast.py) ----
    q_traj, qd_final = arm_trajectory(
        p, arm.q[:, :7], arm.qd, arm.q_target[:, :7], n
    )
    q_all = jnp.concatenate([arm.q[None, :, :7], q_traj], axis=0)
    hand_pos_all, hand_quat_all = fk_hand_batched(q_all)
    hand_pos = hand_pos_all[1:]
    hand_quat = hand_quat_all[1:]
    hand_lin = (hand_pos_all[1:] - hand_pos_all[:-1]) / p.dt
    dq = hand_quat_all[1:] - hand_quat_all[:-1]
    qc = hand_quat_all[:-1] * jnp.array([1.0, -1, -1, -1])
    wq = quat_mul(dq, qc) * (2.0 / p.dt)
    hand_ang = wq[..., 1:]

    # every body in an env shares that env's hand: repeat along batch
    rep = lambda x: jnp.repeat(x, M, axis=1)     # (n, B, ...) -> (n, BM, ...)
    xs = (rep(hand_pos), rep(hand_quat), rep(hand_lin), rep(hand_ang))

    # ---- fold bodies into the batch axis ----
    obj = state.obj
    fold = lambda t, c: jnp.concatenate(
        [t[:, None], c], axis=1
    ).reshape((BM,) + t.shape[1:])
    pos0 = fold(obj.pos, clutter.pos)
    quat0 = fold(obj.quat, clutter.quat)
    lin0 = fold(obj.linvel, clutter.linvel)
    ang0 = fold(obj.angvel, clutter.angvel)

    sph_local = spheres[..., :3].reshape(BM, -1, 3)
    radii = spheres[..., 3].reshape(BM, -1)
    ns = radii.shape[1]
    mass_f = mass.reshape(BM)
    mass_c = mass_f[:, None]
    inertia_bm = inertia.reshape(BM, 3)
    inv_inertia = 1.0 / inertia_bm

    fhe = jnp.asarray(p.finger_half_extents)
    phe = jnp.asarray(p.palm_half_extents)
    half_ext = jnp.stack([fhe, fhe, phe])
    fn_clamp = jnp.concatenate(
        [
            jnp.full((BM, ns), p.table_max_force),
            jnp.full((BM, 2 * ns), 2.0 * p.finger_force),
            jnp.full((BM, ns), p.palm_max_force),
        ],
        axis=1,
    )
    off_p_const = jnp.broadcast_to(jnp.asarray(p.palm_center), (BM, 3))
    _dvw_caps = jnp.array([[p.contact_dv_max], [p.contact_dw_max]])

    def substep(carry, xs_t):
        pos, quat, linvel, angvel, q_f, grip_any, clut_any = carry
        h_pos, h_quat, h_lin, h_ang = xs_t     # (BM, ...)

        centers = pos[:, None, :] + quat_rotate(quat[:, None, :], sph_local)

        # ---- gripper boxes (finger state is per ENV: expand to BM) ----
        q_f_b = jnp.repeat(q_f, M, axis=0)     # (BM, 2)
        off_l = jnp.stack(
            [jnp.zeros((BM,)), q_f_b[:, 0] + fhe[1],
             jnp.full((BM,), p.finger_z_center)], axis=-1,
        )
        off_r = jnp.stack(
            [jnp.zeros((BM,)), -(q_f_b[:, 1] + fhe[1]),
             jnp.full((BM,), p.finger_z_center)], axis=-1,
        )
        box_off = jnp.stack([off_l, off_r, off_p_const], axis=1)
        box_t = h_pos[:, None, :] + quat_rotate(h_quat[:, None, :], box_off)

        hq_c = h_quat * jnp.array([1.0, -1, -1, -1])
        c_hand = quat_rotate(hq_c[:, None, :], centers - h_pos[:, None, :])
        p_loc = c_hand[:, None, :, :] - box_off[:, :, None, :]

        qd_box = jnp.abs(p_loc) - half_ext[None, :, None, :]
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
        n_box = quat_rotate(h_quat[:, None, None, :], n_loc)
        # radius-0 padding spheres never contact (mirrors fast.py)
        real = radii > 0
        pen_box = jnp.where(real[:, None, :], radii[:, None, :] - sdf, -1.0)

        cpts_box = centers[:, None, :, :] - n_box * radii[:, None, :, None]
        v_box = h_lin[:, None, None, :] + jnp.cross(
            h_ang[:, None, None, :], cpts_box - box_t[:, :, None, :]
        )

        # ---- table plane ----
        pen_tab = jnp.where(real, radii - (centers[..., 2] - p.table_z), -1.0)
        n_tab = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), centers.shape)
        cpts_tab = centers - n_tab * radii[..., None]

        pen = jnp.concatenate([pen_tab, pen_box.reshape(BM, 3 * ns)], axis=1)
        nrm = jnp.concatenate([n_tab, n_box.reshape(BM, 3 * ns, 3)], axis=1)
        cpts = jnp.concatenate(
            [cpts_tab, cpts_box.reshape(BM, 3 * ns, 3)], axis=1
        )
        v_surf = jnp.concatenate(
            [jnp.zeros_like(cpts_tab), v_box.reshape(BM, 3 * ns, 3)], axis=1
        )

        active = pen > 0
        pen_c = jnp.where(active, pen, 0.0)
        n_active = jnp.sum(active, axis=1)
        share = jnp.maximum(n_active, 1).astype(pen.dtype)[:, None]

        r_c = cpts - pos[:, None, :]
        v_c = linvel[:, None, :] + jnp.cross(angvel[:, None, :], r_c)
        v_rel = v_c - v_surf

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

        # the arm/table contact deltas go through the asymmetric passive
        # clamp (the arm servo is an energy source); object-object forces
        # are pair-impulse-capped inside _pair_forces and added AFTER the
        # clamp so momentum transfer between bodies is never clipped
        # one-sidedly
        tau_b0 = quat_rotate(q_c, torque)
        dw_body = p.dt * tau_b0 * inv_inertia
        w_body = quat_rotate(q_c, angvel)
        dv_pair = jnp.stack([p.dt * f_contact / mass_c, dw_body], axis=1)
        v_pair = jnp.stack([linvel, w_body], axis=1)
        d_pair = clamp_passive_delta(dv_pair, v_pair, _dvw_caps)
        dv_c = d_pair[:, 0]
        dw_c_body = d_pair[:, 1]

        if K > 0:
            f_oo, tau_oo = _pair_forces(
                p,
                pos.reshape(B, M, 3), quat.reshape(B, M, 4),
                linvel.reshape(B, M, 3), angvel.reshape(B, M, 3),
                coarse, mass, inertia,
            )
            dv_c = dv_c + p.dt * f_oo.reshape(BM, 3) / mass_c
            dw_c_body = dw_c_body + p.dt * quat_rotate(
                q_c, tau_oo.reshape(BM, 3)
            ) * inv_inertia

        gyro_b = jnp.cross(w_body, inertia_bm * w_body)
        v_pred = linvel + dv_c
        v_pred = v_pred.at[:, 2].add(p.dt * p.gravity)
        w_pred = angvel + quat_rotate(
            quat, dw_c_body - p.dt * gyro_b * inv_inertia
        )

        # ---- friction impulse passes (identical structure to fast.py) ----
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

        # rigid-set translational stiction pass (mirrors fast.py): stops
        # the fn-weighted common-mode slip the per-contact Jacobi shares
        # under-remove when opposing contacts' angular responses cancel
        # linear slip only -- see fast.py for why w x r must be excluded
        v_lin3 = v_out[:, None, :] - v_surf
        vn3 = jnp.sum(v_lin3 * nrm, axis=-1, keepdims=True)
        vt3 = (v_lin3 - vn3 * nrm) * have[..., None]
        fn_sum = jnp.sum(fn, axis=1, keepdims=True)
        vbar = jnp.sum(fn[..., None] * vt3, axis=1) / jnp.maximum(fn_sum, 1e-9)
        vbar_n = jnp.linalg.norm(vbar, axis=-1, keepdims=True)
        pool = jnp.sum(budget, axis=1, keepdims=True)
        scale = jnp.minimum(1.0, pool / jnp.maximum(mass_c * vbar_n, 1e-9))
        v_out = v_out - vbar * scale * (fn_sum > 0)

        # torsional (spinning) friction (mirrors fast.py)
        if p.torsion_patch_radius > 0:
            w_surf_ang = jnp.concatenate(
                [
                    jnp.zeros((BM, ns, 3)),
                    jnp.broadcast_to(h_ang[:, None, :], (BM, 3 * ns, 3)),
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

        # aggregate rotational stiction over the PAD contacts (mirrors
        # fast.py; see PhysicsParams.pad_rot_stiction)
        if p.pad_rot_stiction:
            pad_have = have.at[:, :ns].set(False)          # exclude table
            w_surf_p = jnp.broadcast_to(h_ang[:, None, :], (BM, 4 * ns, 3))
            w_rel = (w_out[:, None, :] - w_surf_p) * pad_have[..., None]
            fnp = fn * pad_have
            fnp_sum = jnp.sum(fnp, axis=1, keepdims=True)
            wbar = jnp.sum(fnp[..., None] * w_rel, axis=1) / jnp.maximum(
                fnp_sum, 1e-9
            )
            lever = jnp.linalg.norm(r_c, axis=-1) + p.torsion_patch_radius
            pool_ang = jnp.sum(
                p.friction_mu * fnp * lever * p.dt, axis=1, keepdims=True
            )
            wbar_b = quat_rotate(q_c, wbar)
            l_need = jnp.linalg.norm(
                inertia_bm * wbar_b, axis=-1, keepdims=True
            )
            scale_a = jnp.minimum(1.0, pool_ang / jnp.maximum(l_need, 1e-9))
            w_out = w_out - wbar * scale_a * (fnp_sum > 0)

        linvel = jnp.clip(v_out / (1.0 + p.linear_damping * p.dt),
                          -p.max_linvel, p.max_linvel)
        angvel = jnp.clip(w_out / (1.0 + p.angular_damping * p.dt),
                          -p.max_angvel, p.max_angvel)
        pos = pos + p.dt * linvel
        w_q = jnp.concatenate([jnp.zeros((BM, 1)), angvel], axis=-1)
        quat = quat_normalize(quat + 0.5 * p.dt * quat_mul(w_q, quat))

        # ---- fingers: squeezed by EVERY body's pad penetration ----
        pen_pads = pen_box.reshape(B, M, 3, ns)[:, :, :2]   # (B, M, 2, ns)
        pen_pads = jnp.where(pen_pads > 0, pen_pads, 0.0)
        step_lim = p.finger_vel_limit * p.dt
        tgt_f = arm.q_target[:, 7:9]
        k = p.contact_stiffness
        f_pad = k * jnp.sum(pen_pads, axis=(1, 3))          # (B, 2)
        n_pad = jnp.sum(pen_pads > 0, axis=(1, 3)).astype(q_f.dtype)
        if p.finger_gear_coupling:
            # gear-coupled pair (mirrors fast.py; see
            # PhysicsParams.finger_gear_coupling)
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

        pen_bm = jnp.any(pen_box > 0, axis=(1, 2)).reshape(B, M)
        grip_now = pen_bm[:, 0]
        clut_now = jnp.any(pen_bm[:, 1:], axis=1) if K > 0 else jnp.zeros(
            (B,), bool
        )
        return (pos, quat, linvel, angvel, q_f,
                grip_any | grip_now, clut_any | clut_now), None

    carry0 = (
        pos0, quat0, lin0, ang0,
        arm.q[:, 7:9], jnp.zeros((B,), bool), jnp.zeros((B,), bool),
    )
    (pos, quat, linvel, angvel, q_f, grip_any, clut_any), _ = jax.lax.scan(
        substep, carry0, xs
    )

    unfold = lambda a: a.reshape((B, M) + a.shape[1:])
    pos_u, quat_u = unfold(pos), unfold(quat)
    lin_u, ang_u = unfold(linvel), unfold(angvel)

    q_new = jnp.concatenate([q_traj[-1], q_f], axis=-1)
    new_state = state.replace(
        arm=arm.replace(q=q_new, qd=qd_final),
        obj=obj.replace(
            pos=pos_u[:, 0], quat=quat_u[:, 0],
            linvel=lin_u[:, 0], angvel=ang_u[:, 0],
        ),
        contact_force=jnp.zeros((B,)),
        gripper_contact=grip_any,
    )
    new_clutter = clutter.replace(
        pos=pos_u[:, 1:], quat=quat_u[:, 1:],
        linvel=lin_u[:, 1:], angvel=ang_u[:, 1:],
    )
    return new_state, new_clutter, clut_any
