"""Point-cloud primitives: FPS, ball query, grouping, regularization.

TPU-native replacements for the reference's `pointnet2_ops` CUDA
extension (reference: core/networks.py:10, core/utils.py:32). All ops are
static-shape, vmap-safe, and compile to fused XLA; the hot grouped-MLP
path lives in models/pointnet.py as plain matmuls on the MXU.
"""

from gaddpg_tpu.ops.sampling import (
    furthest_point_sampling,
    ball_query,
    gather_points,
    group_points,
    regularize_point_count,
)
