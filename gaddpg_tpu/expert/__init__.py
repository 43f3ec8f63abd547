"""On-device expert: grasp-goal queries and a goal-servo planner.

Stands in for the external OMG trajectory optimizer
(reference: env/panda_scene.py:881-993, OMG submodule): the grasp
database provides goal poses (the ACRONYM `grasps_poses` analogue), the
nearest-goal query mirrors `_get_nearest_goal_pose`
(reference: env/panda_scene.py:1237-1278), and the servo planner
produces standoff-then-approach task-space actions at rollout rate. A
full CHOMP-style batched trajectory optimizer over scene SDFs is the
planned upgrade for cluttered scenes.
"""

from gaddpg_tpu.expert.goals import nearest_grasp_goal, reachable_grasp_mask
from gaddpg_tpu.expert.servo import expert_action, expert_plan_length
