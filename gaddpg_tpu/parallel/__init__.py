"""Device-mesh parallelism helpers.

The reference scales with Ray CPU actors + DataParallel
(reference: core/trainer.py:300-330, core/utils.py:202). Here the whole
program is SPMD over a `jax.sharding.Mesh`: env batch and replay shard
over the data axis, learner params replicate, and XLA inserts the
gradient all-reduces over ICI. At GA-DDPG's model scale (~15M params)
data parallelism is the only profitable axis (SURVEY.md section 2.2);
the mesh helpers still accept extra axes for larger future models.
"""

from gaddpg_tpu.parallel.mesh import (
    make_mesh,
    shard_leading_axis,
    replicate,
    make_sharded_update,
)
