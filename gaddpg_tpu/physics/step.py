"""The 1 kHz physics substep and the 150-substep policy-step scan.

Substep structure (see contact.py for why friction is an impulse pass):

1. arm position servo (rate-limited) -> new hand pose + velocity
2. contact geometry for table / finger pads / palm as one flat array
3. normal spring forces + gravity -> predicted velocity
4. friction Jacobi impulses against the predicted velocity (stiction)
5. integrate object pose; penetration-limited finger closing
"""

from functools import partial

import jax
import jax.numpy as jnp

from gaddpg_tpu.geometry.rotations import quat_to_mat, quat_integrate
from gaddpg_tpu.physics.contact import (
    clamp_passive_delta,
    concat_contacts,
    friction_impulses,
    normal_forces,
    sphere_box_contacts,
    sphere_plane_contacts,
)
from gaddpg_tpu.physics.types import PhysicsParams, PhysicsState
from gaddpg_tpu.robot.panda import fk_hand
from gaddpg_tpu.utils.precision import f32_matmuls


def _rot_delta_to_omega(r_new, r_old, dt):
    """Angular velocity from consecutive rotation matrices (small angle)."""
    d = r_new @ r_old.T
    w = jnp.stack([d[2, 1] - d[1, 2], d[0, 2] - d[2, 0], d[1, 0] - d[0, 1]]) * 0.5
    return w / dt


def _finger_box_pose(hand, side, q_f, p: PhysicsParams):
    """World pose of a finger-pad box; side=+1 left (+y), -1 right."""
    t = jnp.eye(4).at[1, 3].set(side * (q_f + p.finger_half_extents[1])).at[2, 3].set(
        p.finger_z_center
    )
    return hand @ t


def gripper_box_poses(hand, q_l, q_r, p: PhysicsParams):
    """World poses of the three gripper collision boxes (left finger,
    right finger, palm) -- shared by contact resolution and the
    camera's analytic occluders."""
    pose_l = _finger_box_pose(hand, +1.0, q_l, p)
    pose_r = _finger_box_pose(hand, -1.0, q_r, p)
    palm = hand @ jnp.eye(4).at[:3, 3].set(jnp.asarray(p.palm_center))
    return pose_l, pose_r, palm


def physics_substep(p: PhysicsParams, state: PhysicsState, sphere_set, mass,
                    inertia_diag, base_pose):
    """One 1 ms substep for one env. All args env-local; vmap outside."""
    arm = state.arm
    obj = state.obj

    # ---- arm servo: trapezoidal (vel+acc limited) position tracking ----
    # An instant jump to the velocity limit demands a friction impulse
    # the grasp cone cannot supply within one substep: the grasped
    # object micro-slips at every policy-step boundary and creeps out of
    # the gripper. Accel-limited ramps keep the required impulse inside
    # the cone.
    err = arm.q_target[:7] - arm.q[:7]
    v_brake = jnp.sqrt(2.0 * p.arm_acc_limit * jnp.abs(err))
    v_des = jnp.sign(err) * jnp.minimum(v_brake, p.arm_vel_limit)
    qd = jnp.clip(v_des, arm.qd - p.arm_acc_limit * p.dt,
                  arm.qd + p.arm_acc_limit * p.dt)
    q_arm = arm.q[:7] + qd * p.dt
    hand_prev = fk_hand(arm.q[:7], base_pose)
    hand = fk_hand(q_arm, base_pose)
    hand_lin = (hand[:3, 3] - hand_prev[:3, 3]) / p.dt
    hand_ang = _rot_delta_to_omega(hand[:3, :3], hand_prev[:3, :3], p.dt)
    box_vel = (hand_lin, hand_ang)

    # ---- object spheres in world ----
    r_obj = quat_to_mat(obj.quat)
    centers = obj.pos + sphere_set[:, :3] @ r_obj.T
    radii = sphere_set[:, 3]
    inv_iw = r_obj @ jnp.diag(1.0 / inertia_diag) @ r_obj.T

    # ---- contact geometry (one flat array) ----
    pose_l = _finger_box_pose(hand, +1.0, arm.q[7], p)
    pose_r = _finger_box_pose(hand, -1.0, arm.q[8], p)
    palm_pose = hand @ jnp.eye(4).at[:3, 3].set(jnp.asarray(p.palm_center))

    fhe = jnp.asarray(p.finger_half_extents)
    c_table = sphere_plane_contacts(centers, radii, p.table_z,
                                    max_force=p.table_max_force)
    c_l = sphere_box_contacts(centers, radii, pose_l, fhe, box_vel,
                              max_force=2.0 * p.finger_force)
    c_r = sphere_box_contacts(centers, radii, pose_r, fhe, box_vel,
                              max_force=2.0 * p.finger_force)
    c_palm = sphere_box_contacts(centers, radii, palm_pose,
                                 jnp.asarray(p.palm_half_extents), box_vel,
                                 max_force=p.palm_max_force)
    contacts = concat_contacts(c_table, c_l, c_r, c_palm)
    ns = sphere_set.shape[0]
    n_active = jnp.sum(contacts.pen > 0)

    # ---- normal forces + gravity -> predicted velocity ----
    r_pts = contacts.point - obj.pos
    v_pts = obj.linvel + jnp.cross(obj.angvel, r_pts)
    # normal damping capped at the velocity-zeroing share
    rxn = jnp.cross(r_pts, contacts.normal)
    w_n = 1.0 / mass + jnp.einsum("ci,ij,cj->c", rxn, inv_iw, rxn)
    damp_cap = 0.9 / (w_n * jnp.maximum(n_active, 1) * p.dt)
    fn = normal_forces(contacts, v_pts, p.contact_stiffness, damp_cap)

    f_normal = fn[:, None] * contacts.normal
    f_contact = jnp.sum(f_normal, axis=0)
    torque = jnp.sum(jnp.cross(r_pts, f_normal), axis=0)
    # passive-contact dv/dw cap (see PhysicsParams.contact_dv_max):
    # braking up to full reversal margin is free; speed gain is capped
    dv_c = clamp_passive_delta(
        p.dt * f_contact / mass, obj.linvel, p.contact_dv_max
    )
    dw_c = clamp_passive_delta(
        p.dt * (inv_iw @ torque), obj.angvel, p.contact_dw_max
    )

    gyro = jnp.cross(obj.angvel, (r_obj @ jnp.diag(inertia_diag) @ r_obj.T) @ obj.angvel)
    v_pred = obj.linvel + dv_c + p.dt * jnp.array([0.0, 0.0, p.gravity])
    w_pred = obj.angvel + dw_c - p.dt * (inv_iw @ gyro)
    total_f = f_contact + jnp.array([0.0, 0.0, p.gravity * mass])

    # ---- friction impulse passes (stiction against predicted velocity) ----
    # Jacobi with 1/n shares removes ~90% of tangential velocity per
    # pass (angular terms of opposing contacts partially cancel);
    # iterating drives residual slip to ~0 so grasps hold statically.
    def fric_iter(_, carry):
        v, w, budget = carry
        d_lin, d_ang, budget = friction_impulses(
            contacts, fn, v, w, obj.pos, mass, inv_iw,
            p.friction_mu, p.dt, n_active, budget=budget,
        )
        return v + d_lin, w + d_ang, budget

    cone0 = p.friction_mu * fn * p.dt
    v_out, w_out, budget_left = jax.lax.fori_loop(
        0, p.friction_iters, fric_iter, (v_pred, w_pred, cone0)
    )

    # rigid-set translational stiction pass (see fast.py): per-contact
    # Jacobi shares under-stop common-mode slip when opposing contacts'
    # angular responses cancel (deep pinches on light objects); one
    # aggregate impulse stops the fn-weighted mean slip, bounded by the
    # pooled remaining Coulomb budget.
    # linear slip only -- see fast.py for why w x r must be excluded
    v_lin3 = v_out[None, :] - contacts.surf_vel
    vn3 = jnp.sum(v_lin3 * contacts.normal, axis=-1, keepdims=True)
    vt3 = (v_lin3 - vn3 * contacts.normal) * (fn > 0)[:, None]
    fn_sum = jnp.sum(fn)
    vbar = jnp.sum(fn[:, None] * vt3, axis=0) / jnp.maximum(fn_sum, 1e-9)
    vbar_n = jnp.linalg.norm(vbar)
    pool = jnp.sum(budget_left)
    scale = jnp.minimum(1.0, pool / jnp.maximum(mass * vbar_n, 1e-9))
    v_out = v_out - vbar * scale * (fn_sum > 0)

    # torsional (spinning) friction about each contact normal: the pad
    # patch resists the swing-about-the-closing-axis mode that point
    # contacts leave free (see PhysicsParams.torsion_patch_radius)
    if p.torsion_patch_radius > 0:
        w_surf_ang = jnp.concatenate(
            [jnp.zeros((ns, 3)), jnp.broadcast_to(hand_ang, (3 * ns, 3))]
        )
        s_rel = jnp.sum((w_out[None, :] - w_surf_ang) * contacts.normal, -1)
        w_rot = jnp.einsum(
            "ci,ij,cj->c", contacts.normal, inv_iw, contacts.normal
        )
        share_t = jnp.maximum(n_active, 1)
        l_cap = p.friction_mu * p.torsion_patch_radius * fn * p.dt
        lj = jnp.clip(s_rel / (w_rot * share_t), -l_cap, l_cap) * (fn > 0)
        w_out = w_out - inv_iw @ jnp.sum(contacts.normal * lj[:, None], axis=0)

    # aggregate rotational stiction over the PAD contacts (mirrors
    # fast.py; see PhysicsParams.pad_rot_stiction): stops the
    # common-mode object-vs-hand angular slip that symmetric pinches
    # leave (screw-out mode), bounded by the pooled Coulomb torque
    # budget. Table contacts excluded so free rolling is untouched.
    if p.pad_rot_stiction:
        nc = contacts.pen.shape[0]
        pad_have = (fn > 0) & (jnp.arange(nc) >= ns)
        w_rel = (w_out[None, :] - hand_ang[None, :]) * pad_have[:, None]
        fnp = fn * pad_have
        fnp_sum = jnp.sum(fnp)
        wbar = jnp.sum(fnp[:, None] * w_rel, axis=0) / jnp.maximum(fnp_sum, 1e-9)
        lever = jnp.linalg.norm(r_pts, axis=-1) + p.torsion_patch_radius
        pool_ang = jnp.sum(p.friction_mu * fnp * lever * p.dt)
        i_world = r_obj @ jnp.diag(inertia_diag) @ r_obj.T
        l_need = jnp.linalg.norm(i_world @ wbar)
        scale_a = jnp.minimum(1.0, pool_ang / jnp.maximum(l_need, 1e-9))
        w_out = w_out - wbar * scale_a * (fnp_sum > 0)

    linvel = v_out / (1.0 + p.linear_damping * p.dt)
    angvel = w_out / (1.0 + p.angular_damping * p.dt)
    linvel = jnp.clip(linvel, -p.max_linvel, p.max_linvel)
    angvel = jnp.clip(angvel, -p.max_angvel, p.max_angvel)
    pos = obj.pos + p.dt * linvel
    quat = quat_integrate(obj.quat, angvel, p.dt)

    # ---- fingers: penetration-limited quasi-static servo ----
    # The finger tracks its target at the velocity limit but the total
    # pad spring force may not exceed finger_force, so the steady grip
    # force equals finger_force exactly -- monotone, no chatter.
    pen_l = jnp.where(c_l.pen > 0, c_l.pen, 0.0)
    pen_r = jnp.where(c_r.pen > 0, c_r.pen, 0.0)
    q_f = arm.q[7:9]
    step_lim = p.finger_vel_limit * p.dt
    k = p.contact_stiffness
    f_pad = jnp.stack([k * jnp.sum(pen_l), k * jnp.sum(pen_r)])
    n_pad = jnp.stack([jnp.sum(pen_l > 0), jnp.sum(pen_r > 0)]).astype(q_f.dtype)
    if p.finger_gear_coupling:
        # gear-coupled pair (mirrors fast.py; see
        # PhysicsParams.finger_gear_coupling)
        s = jnp.mean(q_f)
        tgt_s = jnp.mean(arm.q_target[7:9])
        s_cand = s + jnp.clip(tgt_s - s, -step_lim, step_lim)
        f_tot = jnp.sum(f_pad)
        n_tot = jnp.sum(n_pad)
        floor = s + jnp.clip(
            (f_tot - 2.0 * p.finger_force) / (k * jnp.maximum(n_tot, 1.0)),
            -step_lim, step_lim,
        )
        s_new = jnp.clip(jnp.maximum(s_cand, floor), 0.0, 0.04)
        q_f = jnp.stack([s_new, s_new])
    else:
        qf_cand = q_f + jnp.clip(arm.q_target[7:9] - q_f, -step_lim, step_lim)
        floor = q_f + jnp.clip(
            (f_pad - p.finger_force) / (k * jnp.maximum(n_pad, 1.0)),
            -step_lim, step_lim,
        )
        q_f = jnp.clip(jnp.maximum(qf_cand, floor), 0.0, 0.04)

    q_new = jnp.concatenate([q_arm, q_f])
    grip_contact = (jnp.max(pen_l) > 0) | (jnp.max(pen_r) > 0) | (
        jnp.max(c_palm.pen) > 0
    )

    return state.replace(
        arm=arm.replace(q=q_new, qd=qd),
        obj=obj.replace(pos=pos, quat=quat, linvel=linvel, angvel=angvel),
        contact_force=jnp.linalg.norm(total_f),
        gripper_contact=state.gripper_contact | grip_contact,
    )


@partial(jax.jit, static_argnames=("p", "substeps"))
@f32_matmuls
def physics_step(p: PhysicsParams, state: PhysicsState, sphere_set, mass,
                 inertia_diag, base_pose, substeps=None):
    """One policy step = `substeps` (default p.substeps) physics substeps.

    Resets the gripper-contact accumulator at the start, like the
    per-step `collision_check` (reference: env/panda_scene.py:1078-1095).
    """
    n = substeps if substeps is not None else p.substeps
    state = state.replace(gripper_contact=jnp.asarray(False))

    def body(s, _):
        return physics_substep(p, s, sphere_set, mass, inertia_diag, base_pose), None

    state, _ = jax.lax.scan(body, state, None, length=n)
    return state
