"""Wrist-camera simulation: point-splat depth/mask render + analytic
occluders + backprojection.

Replaces PyBullet's TinyRenderer `getCameraImage`
(reference: env/panda_scene.py:414-421) for the policy's observation
path. The policy consumes only the *target-masked backprojected point
cloud* (reference: core/utils.py:454-472), so instead of triangle
rasterization we z-buffer the target's surface point samples into the
wrist image, ray-cast the scene occluders analytically (table plane +
gripper boxes -- exact and hole-free, see camera.plane_zdepth /
box_zdepth), and backproject the surviving unoccluded target pixels --
identical information content to the reference's full-scene render +
segmentation, a handful of elementwise ops per env.
"""

from gaddpg_tpu.render.camera import (
    CameraParams,
    box_zdepth,
    depth_to_points,
    plane_zdepth,
    render_depth_points,
    render_rgbdm,
    visible_points,
    visible_target_depth,
)
from gaddpg_tpu.render.pointcloud import (
    HAND_LABEL,
    OBSTACLE_LABEL,
    TARGET_LABEL,
    PointCloudState,
    create_pc_state,
    accumulate_points,
    build_point_state,
)
