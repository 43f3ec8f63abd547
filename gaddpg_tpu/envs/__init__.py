"""Environments: the vectorized Panda grasping env and its assets.

`PandaGraspEnv` is the functional analogue of the reference
`PandaYCBEnv` (reference: env/panda_scene.py): pure
`(params, state, action, key) -> (state, obs, reward, done, info)`
that vmaps to thousands of parallel envs on one chip.
"""

from gaddpg_tpu.envs.assets import (
    ObjectLibrary,
    build_library,
    box_asset,
    cylinder_asset,
    ycb_proxy_specs,
    extra_shape_specs,
)
from gaddpg_tpu.envs.grasp_env import (
    PandaGraspEnv,
    EnvParams,
    EnvState,
    Observation,
)
