"""PandaGraspEnv: functional vectorized 6-DoF grasping environment.

Re-design of `PandaYCBEnv` (reference: env/panda_scene.py:115-1352) as a
pure JAX program. One env step:

    task-space delta action -> warm-started DLS IK -> joint servo targets
    -> 150 x 1 ms physics substeps -> wrist-camera point render ->
    accumulation -> 4x1030 point state -> termination heuristics

World frame: robot base at the origin ON the table plane (z=0), i.e.
the reference world shifted by its base offset
(reference: env/panda_gripper_hand_camera.py:32 puts the base at
z=-0.65 == the table top; objects spawn at x 0.5-0.6, y +-0.125
relative to the base, reference: env/panda_scene.py:1000-1001).

Everything vmaps over the env axis; `PandaGraspEnv.step` has no Python
branching on traced values.
"""

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from gaddpg_tpu.envs.assets import ObjectLibrary
from gaddpg_tpu.expert.chomp import PLAN_STEPS, plan_action, plan_to_goal
from gaddpg_tpu.expert.goals import nearest_grasp_goal
from gaddpg_tpu.expert.servo import expert_action as servo_expert_action
from gaddpg_tpu.expert.servo import expert_plan_length
from gaddpg_tpu.geometry.rotations import quat_to_mat
from gaddpg_tpu.geometry.se3 import (
    pack_pose_rot_first,
    se3_from_quat_pos,
    se3_inverse,
    unpack_action,
)
from gaddpg_tpu.models.heads import TASK6D_HIGH
from gaddpg_tpu.physics.fast import fast_physics_step
from gaddpg_tpu.physics.multi import multi_physics_step
from gaddpg_tpu.physics.step import gripper_box_poses, physics_step
from gaddpg_tpu.physics.types import ArmState, BodyState, PhysicsParams, PhysicsState
from gaddpg_tpu.render.camera import (
    CameraParams,
    box_zdepth,
    depth_to_points,
    plane_zdepth,
    render_depth_points,
    render_rgbdm,
    spheres_zdepth,
    visible_target_depth,
)
from gaddpg_tpu.render.pointcloud import (
    OBSTACLE_LABEL,
    PointCloudState,
    accumulate_points,
    build_point_state,
    create_pc_state,
)
from gaddpg_tpu.robot.ik import dls_ik, ik_from_seeds
from gaddpg_tpu.robot.panda import (
    ARM_POINT_RADII, DEFAULT_JOINTS, arm_collision_points, fk_hand,
)
from gaddpg_tpu.utils.precision import f32_matmuls

# camera optical frame relative to the hand: optical +z == hand +z
# (the reference's effective look direction after its GL round trip,
# reference: env/panda_scene.py:829-861), offset 36 mm forward/up
# (reference: env/panda_scene.py:200-202).
T_CAM = jnp.eye(4).at[0, 3].set(0.036).at[2, 3].set(0.036)


@dataclasses.dataclass(frozen=True)
class EnvParams:
    physics: PhysicsParams = PhysicsParams()
    # 64x64 wrist camera: the point state is resampled to 1024 points
    # anyway, and the reference's own termination heuristic is calibrated
    # at 64x64 (reference: core/utils.py:340-343); 4x fewer pixels than
    # the 112x112 image path.
    camera: CameraParams = CameraParams(width=64, height=64)
    max_steps: int = 20                  # RL_MAX_STEP
    uniform_num_pts: int = 1024
    pt_accumulate_ratio: float = 0.95
    pc_capacity: int = 2048
    new_points_per_step: int = 512
    init_near: float = 0.2               # ENV_NEAR
    init_far: float = 0.5                # ENV_FAR
    spawn_x: Tuple[float, float] = (0.50, 0.60)
    spawn_y: Tuple[float, float] = (-0.125, 0.125)
    # cluttered scenes: K extra static objects placed on a jittered grid
    # (reference places 1 target + load_obj_num-1 obstacles,
    # reference: env/panda_scene.py:995-1035); 0 = single-object scenes
    num_clutter: int = 0
    # CHOMP-style trajectory-optimizer expert (expert/chomp.py) -- the
    # default, like the reference's always-on OMG planner; it treats the
    # target as an approach obstacle so the expert never sweeps through
    # it. False falls back to the straight goal servo.
    use_planner: bool = True
    # grid kept inside the arm's validity envelope (reset requires
    # 0.15 < tcp-target distance < 0.6)
    clutter_grid_x: Tuple[float, float] = (0.45, 0.69)
    clutter_grid_y: Tuple[float, float] = (-0.14, 0.14)
    clutter_jitter: float = 0.015
    # scene resample attempts per reset (the reference retries invalid
    # scenes up to ENV_RESET_TRIALS times, reference:
    # core/train_online.py:180-188); >1 costs proportionally more reset
    # compute in SPMD but multiplies down the invalid-scene rate
    reset_tries: int = 2
    # clutter surface points enter the accumulated cloud labeled
    # OBSTACLE_LABEL (pointcloud.py) so the policy can SEE what it must
    # avoid -- an extension past the reference's target-only cloud,
    # whose clutter policies are collision-blind (collisions only
    # logged, reference: env/panda_scene.py:1078-1095). 0 disables
    # (reference-faithful target-only observations).
    clutter_points_per_step: int = 256
    # 10 iters of the analytic-jacobian DLS solve cost less than 8 of
    # the old forward-mode solve (24.0 vs 25.9 ms at 1024 envs on the
    # dev chip) and keep the 8-seed lift contract at 7/8 (the analytic
    # rewrite's float-level trajectory shift lost seed 6 at 8 iters)
    step_ik_iters: int = 10
    settle_substeps: int = 200
    termination_heuristics: bool = True
    use_image: bool = False              # emit RGBDM image observations
    # per-episode visual domain randomization for image mode: random
    # target albedo, occluder tint (table-texture proxy), lighting gain,
    # and per-frame pixel noise (reference randomizes table/object
    # textures per episode, reference: env/panda_scene.py:599-618,680-690)
    domain_rand: bool = False
    lift_height: float = 0.08            # success (reference: :877)
    fall_height: float = 0.03            # failure (reference: :868)
    retract_lift_steps: int = 10
    retract_step_dz: float = 0.03


@struct.dataclass
class EnvState:
    phys: PhysicsState
    pc: PointCloudState
    obj_idx: jnp.ndarray          # int32
    env_step: jnp.ndarray         # int32
    init_obj_z: jnp.ndarray       # f32
    goal_obj: jnp.ndarray         # (4,4) grasp goal in object frame
    collided: jnp.ndarray         # bool: contact this step
    collided_before: jnp.ndarray  # bool: any contact so far
    done: jnp.ndarray             # bool
    valid_scene: jnp.ndarray      # bool (check_scene analogue)
    # dynamic clutter bodies (K = EnvParams.num_clutter; (0,) when unused)
    # -- simulated by physics/multi.py, so pushes move/topple them like
    # the reference's fully simulated obstacles
    clutter_idx: jnp.ndarray      # (K,) int32 library indices
    clutter_pos: jnp.ndarray      # (K, 3)
    clutter_quat: jnp.ndarray     # (K, 4) wxyz
    clutter_linvel: jnp.ndarray   # (K, 3)
    clutter_angvel: jnp.ndarray   # (K, 3)
    # expert plan (populated when EnvParams.use_planner)
    plan: jnp.ndarray             # (PLAN_STEPS, 7) joint waypoints
    plan_ok: jnp.ndarray          # bool
    plan_step: jnp.ndarray        # int32 progress along the plan
    # per-episode visual-randomization seed (EnvParams.domain_rand):
    # fixed for the episode like the reference's per-episode textures
    # (reference: env/panda_scene.py:599-618,680-690)
    vis_seed: jnp.ndarray         # int32


@struct.dataclass
class Observation:
    point_state: jnp.ndarray   # (4, 6 + num_pts)
    num_points: jnp.ndarray    # int32 accumulated-point count
    joint_pos: jnp.ndarray     # (9,)
    ef_pose: jnp.ndarray       # (4, 4) hand in world
    goal_pose: jnp.ndarray     # (7,) [q, t] hand->goal
    image: jnp.ndarray         # (5, H, W) RGBDM when use_image else (5, 1, 1)


class PandaGraspEnv:
    """Bundles static params + the object library; methods are pure."""

    def __init__(self, params: EnvParams, lib: ObjectLibrary):
        self.p = params
        self.lib = lib
        self.base_pose = jnp.eye(4)

    # ------------------------------------------------------------------
    def _obj_pose(self, obj: BodyState):
        return se3_from_quat_pos(obj.quat, obj.pos)

    def _hand(self, state: EnvState):
        return fk_hand(state.phys.arm.q[:7], self.base_pose)

    def _goal_world(self, state: EnvState):
        return self._obj_pose(state.phys.obj) @ state.goal_obj

    def _camera_pose_inv(self, hand):
        return se3_inverse(hand @ T_CAM)

    def _clutter_spheres_world(self, state: EnvState):
        """(K*NS, 4) world-frame clutter sphere sets (radius 0 = pad)."""
        sph = self.lib.spheres[state.clutter_idx]          # (K, NS, 4)
        rot = jax.vmap(quat_to_mat)(state.clutter_quat)    # (K, 3, 3)
        centers = (
            jnp.einsum("kij,knj->kni", rot, sph[..., :3])
            + state.clutter_pos[:, None, :]
        )
        return jnp.concatenate([centers, sph[..., 3:]], -1).reshape(-1, 4)

    def _clutter_surface_world(self, state: EnvState):
        """(K*NP, 3) world-frame clutter surface samples (occluders)."""
        surf = self.lib.surface_points[state.clutter_idx]  # (K, NP, 3)
        rot = jax.vmap(quat_to_mat)(state.clutter_quat)
        pts = (
            jnp.einsum("kij,knj->kni", rot, surf)
            + state.clutter_pos[:, None, :]
        )
        return pts.reshape(-1, 3)

    def _clutter_collision(self, state: EnvState, hand):
        """True when any gripper box OR arm-skeleton sphere penetrates a
        clutter sphere -- the collision event for obstacles. The
        reference queries EVERY robot link, so a forearm/elbow sweep
        through an obstacle is a collision too
        (reference: env/panda_scene.py:1078-1095)."""
        p = self.p.physics
        sph = self._clutter_spheres_world(state)  # (M, 4)
        boxes = gripper_box_poses(hand, state.phys.arm.q[7],
                                  state.phys.arm.q[8], p)
        hes = (p.finger_half_extents, p.finger_half_extents,
               p.palm_half_extents)
        hit = jnp.asarray(False)
        for pose, he in zip(boxes, hes):
            local = (sph[:, :3] - pose[:3, 3]) @ pose[:3, :3]
            out = jnp.maximum(jnp.abs(local) - jnp.asarray(he), 0.0)
            d = jnp.linalg.norm(out, axis=-1) - sph[:, 3]
            hit = hit | jnp.any((d < 0.0) & (sph[:, 3] > 0.0))
        arm_pts = arm_collision_points(state.phys.arm.q[:7])   # (N, 3)
        d = jnp.linalg.norm(
            arm_pts[:, None, :] - sph[None, :, :3], axis=-1
        ) - ARM_POINT_RADII[:, None] - sph[None, :, 3]
        hit = hit | jnp.any((d < 0.0) & (sph[None, :, 3] > 0.0))
        return hit

    def _occluder_depth(self, state: EnvState, hand, cam_pose):
        """Per-pixel z-depth of everything that can hide the target:
        the table plane and the three gripper boxes, ray-cast
        analytically (the reference's full-scene render + segmentation,
        reference: env/panda_scene.py:414-436)."""
        p = self.p
        occ = plane_zdepth(p.camera, cam_pose, p.physics.table_z)
        fhe = p.physics.finger_half_extents
        phe = p.physics.palm_half_extents
        boxes = gripper_box_poses(
            hand, state.phys.arm.q[7], state.phys.arm.q[8], p.physics
        )
        for pose, he in zip(boxes, (fhe, fhe, phe)):
            occ = jnp.minimum(occ, box_zdepth(p.camera, cam_pose, pose, he))
        # upstream arm links can fold into view near joint limits; the
        # reference's full-scene render occludes through them too. The
        # link7->hand spheres are excluded: they envelop the wrist-mounted
        # camera itself (0.05 m radius vs 0.051 m camera offset) and the
        # palm/finger boxes above already model the visible wrist geometry.
        arm_pts = arm_collision_points(state.phys.arm.q[:7])[:-3]
        occ = jnp.minimum(
            occ,
            spheres_zdepth(p.camera, cam_pose, arm_pts, ARM_POINT_RADII[:-3]),
        )
        return occ

    # ------------------------------------------------------------------
    def _observe(self, state: EnvState, key) -> Tuple[EnvState, Observation]:
        state, obs, _ = self._observe_impl(state, key)
        return state, obs

    def _observe_impl(self, state: EnvState, key):
        """Returns (state, obs, vis_depth) where vis_depth is the
        occlusion-culled target depth image reused by _termination."""
        p = self.p
        hand = self._hand(state)
        obj_pose = self._obj_pose(state.phys.obj)
        surf = self.lib.surface_points[state.obj_idx]  # (NP, 3)
        surf_w = surf @ obj_pose[:3, :3].T + obj_pose[:3, 3]

        cam = hand @ T_CAM
        cam_inv = self._camera_pose_inv(hand)
        occ_static = self._occluder_depth(state, hand, cam)
        occ = occ_static
        if p.num_clutter:
            csurf_w = self._clutter_surface_world(state)
            cd = render_depth_points(p.camera, cam_inv, csurf_w)
            occ = jnp.minimum(occ_static, jnp.where(cd > 0, cd, jnp.inf))
        vis_depth = visible_target_depth(p.camera, cam_inv, surf_w, occ_depth=occ)
        pts_cam, pts_valid = depth_to_points(
            p.camera, vis_depth, max_points=p.new_points_per_step
        )
        pts_w = pts_cam @ cam[:3, :3].T + cam[:3, 3]

        k1, k2, k3 = jax.random.split(key, 3)
        pc = accumulate_points(
            state.pc, k1, pts_w, pts_valid, state.env_step, p.pt_accumulate_ratio
        )
        if p.num_clutter and p.clutter_points_per_step:
            # visible CLUTTER surface enters the cloud labeled as
            # obstacle: occluded by the static occluders and by the
            # target itself (symmetric z-test to the target cull above)
            td = render_depth_points(p.camera, cam_inv, surf_w)
            occ_c = jnp.minimum(occ_static, jnp.where(td > 0, td, jnp.inf))
            vis_c = visible_target_depth(
                p.camera, cam_inv, csurf_w, occ_depth=occ_c)
            cpts_cam, cvalid = depth_to_points(
                p.camera, vis_c, max_points=p.clutter_points_per_step)
            cpts_w = cpts_cam @ cam[:3, :3].T + cam[:3, 3]
            pc = accumulate_points(
                pc, k3, cpts_w, cvalid, state.env_step,
                p.pt_accumulate_ratio, label=OBSTACLE_LABEL,
            )
        point_state, n_pts = build_point_state(
            pc, k2, se3_inverse(hand), p.uniform_num_pts
        )

        if self.p.use_image:
            # deterministic pseudo-albedo per object index
            oi = state.obj_idx.astype(jnp.float32)
            albedo = 0.35 + 0.6 * jnp.abs(
                jnp.sin(oi * jnp.array([1.7, 2.9, 4.3]) + jnp.array([0.0, 2.0, 4.0]))
            )
            rand_kw = {}
            if self.p.domain_rand:
                # per-episode texture/lighting draw (fixed within the
                # episode via vis_seed), per-frame sensor noise
                kv = jax.random.PRNGKey(state.vis_seed)
                ka, ko, kl, kn = jax.random.split(kv, 4)
                albedo = jax.random.uniform(ka, (3,), minval=0.1, maxval=0.95)
                rand_kw = dict(
                    occluder_color=jax.random.uniform(
                        ko, (3,), minval=0.15, maxval=0.85
                    ),
                    light_gain=jax.random.uniform(kl, (), minval=0.6, maxval=1.4),
                    noise_key=jax.random.fold_in(kn, state.env_step),
                    noise_std=0.02,
                )
            image = render_rgbdm(
                self.p.camera, cam_inv, surf_w, albedo, occ_depth=occ,
                **rand_kw,
            )
        else:
            image = jnp.zeros((5, 1, 1))

        goal_rel = se3_inverse(hand) @ self._goal_world(state)
        obs = Observation(
            point_state=point_state,
            num_points=n_pts,
            joint_pos=state.phys.arm.q,
            ef_pose=hand,
            goal_pose=pack_pose_rot_first(goal_rel),
            image=image,
        )
        return state.replace(pc=pc), obs, vis_depth

    # ------------------------------------------------------------------
    @f32_matmuls
    def sample_scene(self, key, obj_idx=None):
        """Randomize a scene (reference: env/panda_scene.py:995-1035,
        777-827). Returns a Scene dict usable with `reset_scene`.

        With num_clutter > 0 the target + K clutter objects land on
        distinct cells of a jittered 3x3 grid -- deterministic minimum
        separation with fully static shapes (the reference rejection-
        samples pairwise distances, reference: :1008-1024)."""
        p = self.p
        K = p.num_clutter
        ks = jax.random.split(key, 12)
        if obj_idx is None:
            obj_idx = jax.random.randint(ks[0], (), 0, self.lib.num_objects)
        obj_idx = jnp.asarray(obj_idx, jnp.int32)

        if K:
            gx = jnp.linspace(p.clutter_grid_x[0], p.clutter_grid_x[1], 4)
            gy = jnp.linspace(p.clutter_grid_y[0], p.clutter_grid_y[1], 4)
            cx = (gx[:-1] + gx[1:]) / 2
            cy = (gy[:-1] + gy[1:]) / 2
            cells = jnp.stack(jnp.meshgrid(cx, cy, indexing="ij"), -1).reshape(-1, 2)
            perm = jax.random.permutation(ks[1], cells.shape[0])
            chosen = cells[perm[: K + 1]] + jax.random.uniform(
                ks[2], (K + 1, 2), minval=-p.clutter_jitter, maxval=p.clutter_jitter
            )
            x, y = chosen[0, 0], chosen[0, 1]
            clutter_idx = jax.random.randint(ks[8], (K,), 0, self.lib.num_objects)
            c_yaw = jax.random.uniform(ks[9], (K,), minval=-jnp.pi, maxval=jnp.pi)
            clutter_quat = jnp.stack(
                [jnp.cos(c_yaw / 2), jnp.zeros(K), jnp.zeros(K), jnp.sin(c_yaw / 2)],
                axis=-1,
            )
            clutter_pos = jnp.concatenate(
                [chosen[1:], self.lib.rest_height[clutter_idx][:, None]], axis=-1
            )
        else:
            x = jax.random.uniform(ks[1], (), minval=p.spawn_x[0], maxval=p.spawn_x[1])
            y = jax.random.uniform(ks[2], (), minval=p.spawn_y[0], maxval=p.spawn_y[1])
            clutter_idx = jnp.zeros((0,), jnp.int32)
            clutter_quat = jnp.zeros((0, 4))
            clutter_pos = jnp.zeros((0, 3))
        yaw = jax.random.uniform(ks[3], (), minval=-jnp.pi, maxval=jnp.pi)
        quat = jnp.array([jnp.cos(yaw / 2), 0.0, 0.0, jnp.sin(yaw / 2)])
        pos = jnp.stack([x, y, self.lib.rest_height[obj_idx] + 2e-3])

        # arm init: spherical sample around the target, hand z at target
        theta = jax.random.uniform(ks[4], (), minval=0.0, maxval=2 * jnp.pi / 3)
        phi = jax.random.uniform(ks[5], (), minval=jnp.pi / 2, maxval=3 * jnp.pi / 2)
        r = jax.random.uniform(ks[6], (), minval=p.init_near, maxval=p.init_far)
        offset = r * jnp.stack(
            [jnp.sin(theta) * jnp.cos(phi), jnp.sin(theta) * jnp.sin(phi), jnp.cos(theta)]
        )
        trans = pos + offset + jax.random.uniform(ks[7], (3,), minval=-0.03, maxval=0.03)
        trans = jnp.stack(
            [
                jnp.clip(trans[0], 0.0, 0.5),
                jnp.clip(trans[1], -0.3, 0.3),
                jnp.clip(trans[2], 0.2, 0.6),
            ]
        )
        z_axis = pos - trans
        z_axis = z_axis / jnp.maximum(jnp.linalg.norm(z_axis), 1e-6)
        up = jnp.array([0.0, 0.0, -1.0])
        x_axis = jnp.cross(up, z_axis)
        x_norm = jnp.linalg.norm(x_axis)
        x_axis = jnp.where(x_norm > 1e-3, x_axis / jnp.maximum(x_norm, 1e-6),
                           jnp.array([1.0, 0.0, 0.0]))
        y_axis = jnp.cross(z_axis, x_axis)
        rot = jnp.stack([x_axis, y_axis, z_axis], axis=-1)
        q_init, ik_ok = ik_from_seeds(trans, rot)
        q_init = jnp.where(ik_ok, q_init, DEFAULT_JOINTS)
        return {
            "obj_idx": obj_idx,
            "obj_pos": pos,
            "obj_quat": quat,
            "joints": q_init,
            "ik_ok": ik_ok,
            "clutter_idx": clutter_idx,
            "clutter_pos": clutter_pos,
            "clutter_quat": clutter_quat,
        }

    @f32_matmuls
    def reset_scene(self, scene, key) -> Tuple[EnvState, Observation]:
        """Deterministic reset from a Scene dict (the scene-file protocol,
        reference: env/panda_scene.py:336-343 place_objects_from_scene)."""
        p = self.p
        obj_idx = scene["obj_idx"]
        obj = BodyState(
            pos=scene["obj_pos"], quat=scene["obj_quat"],
            linvel=jnp.zeros(3), angvel=jnp.zeros(3),
        )
        ik_ok = scene.get("ik_ok", jnp.asarray(True))
        q = jnp.concatenate([scene["joints"], jnp.array([0.04, 0.04])])
        phys = PhysicsState(
            arm=ArmState(q=q, qd=jnp.zeros(7), q_target=q),
            obj=obj,
            contact_force=jnp.asarray(0.0),
            gripper_contact=jnp.asarray(False),
        )
        K = p.num_clutter
        clutter_idx = scene.get("clutter_idx", jnp.zeros((K,), jnp.int32))
        # scenes without clutter keys park the (now simulated) default
        # bodies far away -- a dynamic body defaulted to the origin would
        # settle onto the table and perturb the episode (advisor finding)
        clutter_pos = scene.get(
            "clutter_pos", jnp.tile(jnp.array([0.0, 0.0, 1e3]), (K, 1))
        )
        clutter_quat = scene.get(
            "clutter_quat", jnp.tile(jnp.array([1.0, 0, 0, 0]), (K, 1))
        )
        clutter_vel = jnp.zeros((K, 3))
        # settle (jointly with the clutter bodies when the scene has any,
        # so initial penetrations between objects relax before step 0)
        if K:
            idx = jnp.concatenate([obj_idx[None], clutter_idx])[None]
            phys_b = jax.tree_util.tree_map(lambda x: x[None], phys)
            clut_b = BodyState(
                pos=clutter_pos[None], quat=clutter_quat[None],
                linvel=clutter_vel[None], angvel=clutter_vel[None],
            )
            phys_b, clut_b, _ = multi_physics_step(
                p.physics, phys_b, self.lib.spheres[idx],
                self.lib.coarse_spheres[idx], self.lib.mass[idx],
                self.lib.inertia[idx], clut_b, substeps=p.settle_substeps,
            )
            phys = jax.tree_util.tree_map(lambda x: x[0], phys_b)
            clutter_pos, clutter_quat = clut_b.pos[0], clut_b.quat[0]
        else:
            phys = physics_step(
                p.physics, phys, self.lib.spheres[obj_idx],
                self.lib.mass[obj_idx], self.lib.inertia[obj_idx],
                self.base_pose, substeps=p.settle_substeps,
            )

        state = EnvState(
            phys=phys,
            pc=create_pc_state(p.pc_capacity),
            obj_idx=obj_idx,
            env_step=jnp.asarray(0, jnp.int32),
            init_obj_z=phys.obj.pos[2],
            goal_obj=jnp.eye(4),
            collided=jnp.asarray(False),
            collided_before=jnp.asarray(False),
            done=jnp.asarray(False),
            valid_scene=jnp.asarray(True),
            clutter_idx=clutter_idx,
            clutter_pos=clutter_pos,
            clutter_quat=clutter_quat,
            clutter_linvel=jnp.zeros((K, 3)),
            clutter_angvel=jnp.zeros((K, 3)),
            plan=jnp.tile(q[:7], (PLAN_STEPS, 1)),
            plan_ok=jnp.asarray(True),
            plan_step=jnp.asarray(0, jnp.int32),
            vis_seed=jax.random.randint(
                jax.random.fold_in(key, 23), (), 0, jnp.iinfo(jnp.int32).max
            ),
        )
        state = self._update_goal(state)
        if p.use_planner:
            state = self.replan(state)

        obs_key = jax.random.fold_in(key, 17)
        state, obs = self._observe(state, obs_key)

        # scene validity (reference: core/utils.py:132-149): tcp distance
        # in range, enough target pixels, IK solvable, and a reachable
        # grasp exists (generalizes the reference's 'pitcher' name filter)
        hand = self._hand(state)
        tcp = hand[:3, 3] + hand[:3, :3] @ jnp.array([0.0, 0.0, 0.13])
        dist = jnp.linalg.norm(phys.obj.pos - tcp)
        goal_w, _, grasp_found = nearest_grasp_goal(
            hand, self._obj_pose(state.phys.obj),
            self.lib.grasps[obj_idx], self.lib.grasp_valid[obj_idx],
            clutter_spheres=(
                self._clutter_spheres_world(state) if p.num_clutter else None
            ),
        )
        # goal must be kinematically reachable, else the episode is
        # skipped -- the reference drops episodes whose planner fails
        # (reference: core/train_online.py:227-229)
        _, goal_reachable = ik_from_seeds(
            goal_w[:3, 3], goal_w[:3, :3], iters=20
        )
        # point-count threshold scales with camera resolution (the
        # reference's 100-point check is calibrated at its render size,
        # reference: core/utils.py:140)
        min_pts = max(8, (50 * p.camera.height * p.camera.width) // 4096)
        valid = (
            ik_ok
            & (dist > 0.15)
            & (dist < 0.6)
            & (obs.num_points > min_pts)
            & grasp_found
            & goal_reachable
            & state.plan_ok
        )
        return state.replace(valid_scene=valid), obs

    @f32_matmuls
    def reset(self, key, obj_idx=None) -> Tuple[EnvState, Observation]:
        """Randomized episode reset: sample a scene, then init from it.

        Up to `reset_tries` scene candidates are evaluated and the first
        valid one kept (the reference's retry loop,
        reference: core/train_online.py:180-188, as masked selects)."""
        tries = max(self.p.reset_tries, 1)
        keys = jax.random.split(key, 2 * tries)
        state, obs = None, None
        for r in range(tries):
            scene = self.sample_scene(keys[2 * r], obj_idx)
            st, ob = self.reset_scene(scene, keys[2 * r + 1])
            if state is None:
                state, obs = st, ob
            else:
                keep_old = state.valid_scene
                sel = lambda a, b: jnp.where(keep_old, a, b)
                state = jax.tree_util.tree_map(sel, state, st)
                obs = jax.tree_util.tree_map(sel, obs, ob)
        return state, obs

    # ------------------------------------------------------------------
    def _update_goal(self, state: EnvState) -> EnvState:
        """Re-query the nearest reachable grasp unless a collision froze it
        (reference: env/panda_scene.py:1280-1286)."""
        hand = self._hand(state)
        obj_pose = self._obj_pose(state.phys.obj)
        clutter = (
            self._clutter_spheres_world(state) if self.p.num_clutter else None
        )
        goal_w, _, found = nearest_grasp_goal(
            hand, obj_pose, self.lib.grasps[state.obj_idx],
            self.lib.grasp_valid[state.obj_idx], clutter_spheres=clutter,
        )
        goal_obj = se3_inverse(obj_pose) @ goal_w
        keep_old = state.collided_before | ~found
        goal_obj = jnp.where(keep_old, state.goal_obj, goal_obj)
        return state.replace(goal_obj=goal_obj)

    # ------------------------------------------------------------------
    def _apply_action(self, state: EnvState, action):
        """Task-space delta -> IK -> servo targets
        (reference: env/panda_scene.py:740-775)."""
        p = self.p
        high = jnp.asarray(TASK6D_HIGH)
        action = jnp.clip(action, -high, high)
        hand = self._hand(state)
        target = hand @ unpack_action(action)
        q_arm, _, _ = dls_ik(
            state.phys.arm.q[:7], target[:3, 3], target[:3, :3],
            iters=p.step_ik_iters,
        )
        q_target = jnp.concatenate([q_arm, jnp.array([0.04, 0.04])])
        return state.replace(
            phys=state.phys.replace(arm=state.phys.arm.replace(q_target=q_target))
        )

    def _physics(self, state: EnvState, substeps=None) -> EnvState:
        p = self.p
        if p.num_clutter:
            idx = jnp.concatenate([state.obj_idx[None], state.clutter_idx])[None]
            phys_b = jax.tree_util.tree_map(lambda x: x[None], state.phys)
            clut_b = BodyState(
                pos=state.clutter_pos[None], quat=state.clutter_quat[None],
                linvel=state.clutter_linvel[None],
                angvel=state.clutter_angvel[None],
            )
            phys_b, clut_b, hit = multi_physics_step(
                p.physics, phys_b, self.lib.spheres[idx],
                self.lib.coarse_spheres[idx], self.lib.mass[idx],
                self.lib.inertia[idx], clut_b, substeps=substeps,
            )
            phys = jax.tree_util.tree_map(lambda x: x[0], phys_b)
            # collision event = physical robot-obstacle contact
            # (reference: env/panda_scene.py:1078-1095)
            collided = phys.gripper_contact | hit[0]
            state = state.replace(
                phys=phys,
                clutter_pos=clut_b.pos[0], clutter_quat=clut_b.quat[0],
                clutter_linvel=clut_b.linvel[0],
                clutter_angvel=clut_b.angvel[0],
            )
        else:
            phys = physics_step(
                p.physics, state.phys,
                self.lib.spheres[state.obj_idx],
                self.lib.mass[state.obj_idx], self.lib.inertia[state.obj_idx],
                self.base_pose, substeps=substeps,
            )
            collided = phys.gripper_contact
            state = state.replace(phys=phys)
        return state.replace(
            collided=collided,
            collided_before=state.collided_before | collided,
        )

    def _termination(self, state: EnvState, depth_img):
        """Depth heuristic + max steps + fallen target
        (reference: env/panda_scene.py:496-521)."""
        p = self.p
        h, w = p.camera.height, p.camera.width
        d = jnp.where(depth_img > 0, depth_img, 10.0)
        roi = d[int(38.0 * h / 64):, int(24.0 * w / 64): int(48.0 * w / 64)]
        depth_h = jnp.sum(roi < 0.045) > 10
        depth_h = depth_h & jnp.asarray(p.termination_heuristics)
        fallen = (state.phys.obj.pos[2] - state.init_obj_z) < -p.fall_height
        timeout = state.env_step >= p.max_steps
        return depth_h | fallen | timeout

    # ------------------------------------------------------------------
    @f32_matmuls
    def step(self, state: EnvState, action, key):
        """One policy step. Returns (state, obs, reward, done, info)."""
        state = self._apply_action(state, action)
        state = self._physics(state)
        state = self._update_goal(state)

        k_obs = jax.random.fold_in(key, 1)
        state, obs, vis_depth = self._observe_impl(state, k_obs)
        done = self._termination(state, vis_depth)
        state = state.replace(
            env_step=state.env_step + 1,
            plan_step=state.plan_step + 1,
            done=state.done | done,
        )
        reward = jnp.asarray(0.0)  # lift reward paid at retract
        info = {
            "collided": state.collided,
            "goal_dist": jnp.linalg.norm(obs.goal_pose[4:7]),
            "point_num": obs.num_points,
            "obj_z": state.phys.obj.pos[2],
        }
        return state, obs, reward, state.done, info

    # ------------------------------------------------------------------
    # Batched hot path: same semantics as step()/retract(), but physics
    # runs through fast_physics_step on the whole env batch (the vmapped
    # per-env path spends its time in pathologically small batched ops).
    # ------------------------------------------------------------------
    def _physics_batched(self, states: EnvState, substeps=None) -> EnvState:
        if self.p.num_clutter:
            idx = jnp.concatenate(
                [states.obj_idx[:, None], states.clutter_idx], axis=1
            )
            clut = BodyState(
                pos=states.clutter_pos, quat=states.clutter_quat,
                linvel=states.clutter_linvel, angvel=states.clutter_angvel,
            )
            phys, clut, hits = multi_physics_step(
                self.p.physics, states.phys, self.lib.spheres[idx],
                self.lib.coarse_spheres[idx], self.lib.mass[idx],
                self.lib.inertia[idx], clut, substeps=substeps,
            )
            collided = phys.gripper_contact | hits
            states = states.replace(
                phys=phys,
                clutter_pos=clut.pos, clutter_quat=clut.quat,
                clutter_linvel=clut.linvel, clutter_angvel=clut.angvel,
            )
        else:
            phys = fast_physics_step(
                self.p.physics, states.phys,
                self.lib.spheres[states.obj_idx],
                self.lib.mass[states.obj_idx],
                self.lib.inertia[states.obj_idx],
                substeps=substeps,
            )
            collided = phys.gripper_contact
            states = states.replace(phys=phys)
        return states.replace(
            collided=collided,
            collided_before=states.collided_before | collided,
        )

    @f32_matmuls
    def step_batched(self, states: EnvState, actions, keys, requery_goal=None):
        """Batched step() over (B,) states; keys (B, 2)-shaped PRNG keys.

        `requery_goal` (B,) bool: re-pick the nearest grasp this step.
        The reference only re-queries for explore episodes; the expert
        tracks the fixed goal of its plan
        (reference: core/train_online.py:253 nearest=explore).
        """
        states = jax.vmap(self._apply_action)(states, actions)
        states = self._physics_batched(states)
        new_goal_states = jax.vmap(self._update_goal)(states)
        if requery_goal is None:
            states = new_goal_states
        else:
            states = states.replace(
                goal_obj=jnp.where(
                    requery_goal[:, None, None],
                    new_goal_states.goal_obj, states.goal_obj,
                )
            )

        obs_keys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
        states, obs, vis_depth = jax.vmap(self._observe_impl)(states, obs_keys)
        done = jax.vmap(self._termination)(states, vis_depth)
        states = states.replace(
            env_step=states.env_step + 1,
            plan_step=states.plan_step + 1,
            done=states.done | done,
        )
        reward = jnp.zeros(actions.shape[0])
        info = {
            "collided": states.collided,
            "goal_dist": jnp.linalg.norm(obs.goal_pose[:, 4:7], axis=-1),
            "point_num": obs.num_points,
            "obj_z": states.phys.obj.pos[:, 2],
        }
        return states, obs, reward, states.done, info

    @f32_matmuls
    def step_joint(self, states: EnvState, q_targets, keys):
        """Joint-space action variant (PandaJointSpace / config actions,
        reference: env/panda_scene.py:744-747): absolute 9-dof targets
        bypass the task-space IK."""
        states = states.replace(
            phys=states.phys.replace(
                arm=states.phys.arm.replace(q_target=q_targets)
            )
        )
        states = self._physics_batched(states)
        states = jax.vmap(self._update_goal)(states)
        obs_keys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
        states, obs = jax.vmap(self._observe)(states, obs_keys)
        states = states.replace(
            env_step=states.env_step + 1,
            plan_step=states.plan_step + 1,
        )
        return states, obs

    @f32_matmuls
    def retract_batched(self, states: EnvState, keys):
        """Batched retract(): close fingers, lift, score."""
        p = self.p
        close_t = states.phys.arm.q_target.at[:, 7:9].set(0.0)
        states = states.replace(
            phys=states.phys.replace(arm=states.phys.arm.replace(q_target=close_t))
        )
        states = self._physics_batched(states, substeps=2 * p.physics.substeps)

        def lift_body(s, _):
            def one(env_state):
                hand = self._hand(env_state)
                target_pos = hand[:3, 3] + jnp.array([0.0, 0.0, p.retract_step_dz])
                q_arm, _, _ = dls_ik(
                    env_state.phys.arm.q[:7], target_pos, hand[:3, :3],
                    iters=p.step_ik_iters,
                )
                return jnp.concatenate([q_arm, jnp.zeros(2)])

            q_t = jax.vmap(one)(s)
            s = s.replace(
                phys=s.phys.replace(arm=s.phys.arm.replace(q_target=q_t))
            )
            return self._physics_batched(s), None

        states, _ = jax.lax.scan(lift_body, states, None,
                                 length=p.retract_lift_steps)
        lifted = (states.phys.obj.pos[:, 2] - states.init_obj_z) > p.lift_height
        return states, lifted.astype(jnp.float32)

    # ------------------------------------------------------------------
    @f32_matmuls
    def retract(self, state: EnvState, key):
        """Close fingers, lift 10 x 3 cm, score the lift
        (reference: env/panda_scene.py:455-494)."""
        p = self.p

        # close fingers
        close_t = state.phys.arm.q_target.at[7:9].set(0.0)
        state = state.replace(
            phys=state.phys.replace(arm=state.phys.arm.replace(q_target=close_t))
        )
        state = self._physics(state, substeps=300)

        def lift_body(s, _):
            hand = self._hand(s)
            target_pos = hand[:3, 3] + jnp.array([0.0, 0.0, p.retract_step_dz])
            q_arm, _, _ = dls_ik(
                s.phys.arm.q[:7], target_pos, hand[:3, :3], iters=p.step_ik_iters,
            )
            q_t = jnp.concatenate([q_arm, jnp.zeros(2)])
            s = s.replace(
                phys=s.phys.replace(arm=s.phys.arm.replace(q_target=q_t))
            )
            s = self._physics(s)
            return s, None

        state, _ = jax.lax.scan(
            lift_body, state, None, length=p.retract_lift_steps
        )
        lifted = (state.phys.obj.pos[2] - state.init_obj_z) > p.lift_height
        reward = lifted.astype(jnp.float32)
        return state, reward

    # ------------------------------------------------------------------
    @f32_matmuls
    def replan(self, state: EnvState) -> EnvState:
        """(Re)compute the expert trajectory from the current joints to
        the current grasp goal around the clutter (the reference replans
        mid-episode for DAgger, reference: env/panda_scene.py:920-993)."""
        spheres = self._clutter_spheres_world(state)
        obj_pose = self._obj_pose(state.phys.obj)
        sph = self.lib.spheres[state.obj_idx]
        target_sph = jnp.concatenate(
            [sph[:, :3] @ obj_pose[:3, :3].T + obj_pose[:3, 3], sph[:, 3:]],
            axis=-1,
        )
        plan, ok = plan_to_goal(
            state.phys.arm.q[:7], self._goal_world(state), spheres,
            table_z=self.p.physics.table_z, target_spheres=target_sph,
        )
        return state.replace(
            plan=plan, plan_ok=ok, plan_step=jnp.asarray(0, jnp.int32)
        )

    @f32_matmuls
    def expert_action(self, state: EnvState):
        """Expert action: plan-following (clutter/planner mode) or the
        straight goal servo (single-object scenes)."""
        if self.p.use_planner:
            return plan_action(self._hand(state), state.plan, state.plan_step)
        return servo_expert_action(self._hand(state), self._goal_world(state))

    @f32_matmuls
    def expert_steps(self, state: EnvState):
        if self.p.use_planner:
            return jnp.asarray(float(PLAN_STEPS))
        rel = se3_inverse(self._hand(state)) @ self._goal_world(state)
        return expert_plan_length(rel, self.p.max_steps)
