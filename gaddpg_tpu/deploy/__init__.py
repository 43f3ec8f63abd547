"""Deployment: real-camera observation construction (sim-real shared).

The reference's ROS node (reference: core/test_realworld_ros_final.py)
wraps hardware I/O around one portable core: turning a real RGBD frame
+ target mask into the exact 4x1030 point state the policy saw in sim
(reference: camera_image_to_state :902-965, update_curr_acc_points
:826, bias_target_pc_regularize :811). That core lives here, free of
ROS/MoveIt; robot-side I/O plugs in around it.
"""

from gaddpg_tpu.deploy.realworld import RealsenseStateBuilder, backproject_depth
