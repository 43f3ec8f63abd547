"""Wrist-camera simulation: point-splat depth/mask render + backprojection.

Replaces PyBullet's TinyRenderer `getCameraImage`
(reference: env/panda_scene.py:414-421) for the policy's observation
path. The policy consumes only the *target-masked backprojected point
cloud* (reference: core/utils.py:454-472), so instead of triangle
rasterization we z-buffer the target's surface point samples into the
112x112 wrist image and backproject surviving pixels -- identical
information content, one scatter-min per env.
"""

from gaddpg_tpu.render.camera import (
    CameraParams,
    render_depth_points,
    visible_points,
)
from gaddpg_tpu.render.pointcloud import (
    PointCloudState,
    create_pc_state,
    accumulate_points,
    build_point_state,
)
