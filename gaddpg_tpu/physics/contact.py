"""Contact geometry + normal forces for sphere sets vs analytic primitives.

The contact pipeline is two-phase (see step.py):

1. geometry pass -> penetration, normal, contact point, surface velocity
   for every (sphere, primitive) pair, concatenated into one flat
   contact array;
2. normal spring(+capped damping) forces are integrated with gravity
   into a predicted velocity, and *friction is then applied as Jacobi
   impulses against the predicted velocity*.

Phase 2 friction gives true stiction: an explicit Coulomb force painted
on the current velocity can never hold a grasped object statically --
gravity re-injects g*dt of slip every substep and the object creeps out
of the gripper (~1 cm/s at 1 kHz). Impulses against the post-force
velocity cancel that drift exactly, up to the mu*Fn*dt cone bound.
"""

from typing import NamedTuple

import jax.numpy as jnp


class Contacts(NamedTuple):
    """Flat contact arrays (C = total candidate contacts)."""

    pen: jnp.ndarray        # (C,) penetration depth (<=0 inactive)
    normal: jnp.ndarray     # (C, 3) outward normal (pushes body along +n)
    point: jnp.ndarray      # (C, 3) world contact point
    surf_vel: jnp.ndarray   # (C, 3) velocity of the *other* surface
    fn_scale: jnp.ndarray   # (C,) per-contact normal force clamp


def clamp_passive_delta(dv, v, dv_max, eps=1e-9):
    """Constrain a contact-driven velocity delta to passive behavior.

    Decomposed against the current velocity v: the braking component
    (along -v) may run to full reversal plus a dv_max margin -- so an
    incoming object is always stopped, never tunnels -- while the
    speed-increasing components (along +v and perpendicular) are capped
    at dv_max per substep. Penalty springs backed by the position-servo
    arm are an unbounded energy source; this is what keeps a deep
    squeeze or table press from releasing as an ejection.

    Shape-agnostic over leading batch dims; last axis is the vector.
    """
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    v_hat = v / jnp.maximum(vn, eps)
    along = jnp.sum(dv * v_hat, axis=-1, keepdims=True)
    perp = dv - along * v_hat
    pn = jnp.linalg.norm(perp, axis=-1, keepdims=True)
    along_c = jnp.clip(along, -(vn + dv_max), dv_max)
    perp_c = perp * jnp.minimum(1.0, dv_max / jnp.maximum(pn, eps))
    return along_c * v_hat + perp_c


def sphere_plane_contacts(centers, radii, plane_z, max_force=jnp.inf):
    # radius-0 padding spheres (library sets with ns < NS) must never
    # contact: the half-space test would otherwise fire if the body's
    # rotation swings the far-parked padding below the table
    pen = jnp.where(radii > 0, radii - (centers[:, 2] - plane_z), -1.0)
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), centers.shape)
    pts = centers - n * radii[:, None]
    return Contacts(
        pen=pen,
        normal=n,
        point=pts,
        surf_vel=jnp.zeros_like(centers),
        fn_scale=jnp.full(pen.shape, max_force),
    )


def box_sdf_normal(p, half_extents):
    """SDF and outward normal of an axis-aligned box at points p (N, 3)."""
    q = jnp.abs(p) - jnp.asarray(half_extents)
    outside = jnp.maximum(q, 0.0)
    d_out = jnp.linalg.norm(outside, axis=-1)
    d_in = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    sdf = d_out + d_in

    n_out = outside * jnp.sign(p)
    n_out = n_out / jnp.maximum(jnp.linalg.norm(n_out, axis=-1, keepdims=True), 1e-9)
    inside_axis = jnp.argmax(q, axis=-1)
    n_in = _one_hot(inside_axis, 3) * jnp.sign(p)
    is_out = (d_out > 0)[:, None]
    normal = jnp.where(is_out, n_out, n_in)
    return sdf, normal


def _one_hot(idx, n):
    return (idx[..., None] == jnp.arange(n)).astype(jnp.float32)


def sphere_box_contacts(centers_w, radii, box_pose, half_extents, box_vel,
                        max_force=jnp.inf):
    """Spheres vs an oriented box moving with box_vel = (lin, ang)."""
    rot = box_pose[:3, :3]
    p_local = (centers_w - box_pose[:3, 3]) @ rot
    sdf, n_local = box_sdf_normal(p_local, half_extents)
    pen = jnp.where(radii > 0, radii - sdf, -1.0)  # mask padding spheres
    n_world = n_local @ rot.T
    pts = centers_w - n_world * radii[:, None]
    box_lin, box_ang = box_vel
    v_surf = box_lin + jnp.cross(box_ang, pts - box_pose[:3, 3])
    return Contacts(
        pen=pen,
        normal=n_world,
        point=pts,
        surf_vel=v_surf,
        fn_scale=jnp.full(pen.shape, max_force),
    )


def concat_contacts(*contact_sets):
    return Contacts(*[
        jnp.concatenate([getattr(c, f) for c in contact_sets])
        for f in Contacts._fields
    ])


def normal_forces(c: Contacts, body_vels, stiffness, damp_cap):
    """Spring + impulse-capped damping along the normal; fn in [0, clamp].

    body_vels: (C, 3) velocity of the body surface points at contacts.
    """
    active = c.pen > 0
    pen_c = jnp.where(active, c.pen, 0.0)
    vn = jnp.sum((body_vels - c.surf_vel) * c.normal, axis=-1)
    fn = stiffness * pen_c - damp_cap * vn * active
    fn = jnp.clip(jnp.maximum(fn, 0.0) * active, 0.0, c.fn_scale)
    return fn


def friction_impulses(c: Contacts, fn, v_pred, w_pred, com, mass, inv_iw,
                      mu, dt, n_active, budget=None):
    """One Jacobi friction pass against the predicted velocity.

    Each contact removes at most its 1/n share of the predicted relative
    tangential velocity (computed with the directional effective mass
    w_t = 1/m + (r x t)^T I^-1 (r x t)), clamped to the *remaining*
    Coulomb cone budget (mu*fn*dt across all passes of a substep).
    Returns (d_linvel, d_angvel, new_budget).
    """
    r = c.point - com
    v_body = v_pred + jnp.cross(w_pred, r)
    v_rel = v_body - c.surf_vel
    vn = jnp.sum(v_rel * c.normal, axis=-1, keepdims=True)
    vt = v_rel - vn * c.normal
    vt_norm = jnp.linalg.norm(vt, axis=-1)
    t_dir = vt / jnp.maximum(vt_norm[:, None], 1e-9)

    rxt = jnp.cross(r, t_dir)
    w_t = 1.0 / mass + jnp.einsum("ci,ij,cj->c", rxt, inv_iw, rxt)
    share = jnp.maximum(n_active, 1).astype(vt_norm.dtype)
    j_stick = vt_norm / (w_t * share)          # impulse to zero vt share
    if budget is None:
        budget = mu * fn * dt                   # full Coulomb bound
    j = jnp.minimum(j_stick, budget) * (fn > 0)

    imp = -j[:, None] * t_dir                   # (C, 3) impulse on body
    d_lin = jnp.sum(imp, axis=0) / mass
    d_ang = inv_iw @ jnp.sum(jnp.cross(r, imp), axis=0)
    return d_lin, d_ang, budget - j
