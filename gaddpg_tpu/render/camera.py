"""Point-splat depth camera.

Camera model matches the reference wrist camera: 90-degree FOV, square
112x112 image, near 0.035 / far 2.0 (reference: env/panda_scene.py:838-847).
Convention: +z optical axis forward, +x right, +y down (pinhole); the
hand->camera extrinsic comes from the URDF camera joint
(gaddpg_tpu.robot.panda.T_CAMERA).
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CameraParams:
    width: int = 112
    height: int = 112
    fov_deg: float = 90.0
    near: float = 0.035
    far: float = 2.0

    @property
    def focal(self) -> float:
        import math

        return self.width / 2.0 / math.tan(math.radians(self.fov_deg) / 2.0)


@partial(jax.jit, static_argnames=("cam",))
def render_depth_points(cam: CameraParams, cam_pose_inv, points_world, valid=None):
    """Z-buffer world points into a depth image.

    cam_pose_inv: (4, 4) world->camera transform.
    points_world: (N, 3) surface samples of the target object.
    Returns depth (H, W) with 0 = no hit, like the reference's masked
    depth (backprojection treats depth==0 as invalid,
    reference: core/utils.py:460).
    """
    h, w = cam.height, cam.width
    p_cam = points_world @ cam_pose_inv[:3, :3].T + cam_pose_inv[:3, 3]
    z = p_cam[:, 2]
    ok = (z > cam.near) & (z < cam.far)
    if valid is not None:
        ok = ok & valid
    f = cam.focal
    u = jnp.round(f * p_cam[:, 0] / z + w / 2.0 - 0.5).astype(jnp.int32)
    v = jnp.round(f * p_cam[:, 1] / z + h / 2.0 - 0.5).astype(jnp.int32)
    ok = ok & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    flat = jnp.where(ok, v * w + u, h * w)  # OOB slot dropped
    depth = jnp.full((h * w,), jnp.inf).at[flat].min(
        jnp.where(ok, z, jnp.inf), mode="drop"
    )
    depth = jnp.where(jnp.isinf(depth), 0.0, depth)
    return depth.reshape(h, w)


@partial(jax.jit, static_argnames=("cam",))
def render_rgbdm(cam: CameraParams, cam_pose_inv, points_world, albedo,
                 valid=None):
    """RGBDM image (5, H, W) from target surface points.

    Channel layout matches the reference's processed image state
    (reference: env/panda_scene.py:433-437,1163-1176): RGB in [0, 1],
    metric depth, mask with 0 = target pixels / 1 = background.

    RGB is a proxy shading (albedo attenuated by a depth-based factor):
    the flagship policy is point-cloud-based (use_image=False in every
    reference config), so image observations are provided for the
    ResNet variant's input contract, not photometric fidelity.
    """
    h, w = cam.height, cam.width
    depth = render_depth_points(cam, cam_pose_inv, points_world, valid)
    hit = depth > 0
    shade = jnp.where(hit, 1.0 / (1.0 + 2.0 * depth), 0.0)
    rgb = albedo[:, None, None] * shade[None]
    mask = jnp.where(hit, 0.0, 1.0)
    return jnp.concatenate([rgb, depth[None], mask[None]], axis=0)


@partial(jax.jit, static_argnames=("cam", "max_points"))
def visible_points(cam: CameraParams, cam_pose_inv, points_world, valid=None,
                   max_points: int = 512):
    """Backprojected visible-surface samples, camera frame.

    Renders the depth image and backprojects pixel centers -- the same
    pipeline as `backproject_camera_target`
    (reference: core/utils.py:454-472) minus the OpenGL y-flip round
    trip (we stay in the pinhole frame end to end).

    Hit-pixel compaction is a prefix-sum scatter (hit k lands in slot
    k), not a sort: top_k over the full image was the single hottest op
    in the observation path.

    Returns (pts (max_points, 3) camera frame, valid mask (max_points,)).
    """
    h, w = cam.height, cam.width
    depth = render_depth_points(cam, cam_pose_inv, points_world, valid).reshape(-1)
    hit = depth > 0
    slot = jnp.cumsum(hit) - 1  # hit pixel k -> slot k
    slot = jnp.where(hit & (slot < max_points), slot, max_points)  # OOB drop
    pix = jnp.arange(h * w, dtype=jnp.int32)
    idx = jnp.zeros((max_points,), jnp.int32).at[slot].set(pix, mode="drop")
    n_hit = jnp.sum(hit)
    picked = jnp.arange(max_points) < n_hit
    z = jnp.take(depth, idx)
    u = (idx % w).astype(jnp.float32) + 0.5 - w / 2.0
    v = (idx // w).astype(jnp.float32) + 0.5 - h / 2.0
    f = cam.focal
    pts = jnp.stack([u * z / f, v * z / f, z], axis=-1)
    return pts, picked
