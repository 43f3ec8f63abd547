"""Neural networks: PointNet++ state encoders, Gaussian policy, twin-Q.

Flax re-designs of the reference architectures
(reference: core/networks.py) with identical layer widths/contract:
- `PointNetFeature`: separate policy / value (critic) PointNet++
  encoders; the critic path consumes the action tiled as point channels
  ("sa_channel_concat", reference: core/utils.py:291-297).
- `GaussianPolicy`: tanh-squashed Gaussian with a 7-d grasp-pose
  auxiliary head (normalized quaternion + translation).
- `QNetwork`: twin Q MLPs plus a 7-d critic grasp auxiliary head.
"""

from gaddpg_tpu.models.pointnet import PointNetEncoder, PointNetFeature, GoalFeature
from gaddpg_tpu.models.heads import GaussianPolicy, QNetwork, TASK6D_HIGH, TASK6D_LOW
from gaddpg_tpu.models.resnet import ImageFeature, ResNet18Feature
