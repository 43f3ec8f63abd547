"""Training: fused vectorized rollout + learner loop.

Replaces the reference's Ray orchestration (reference:
core/train_online.py, core/trainer.py) with two jitted programs:

- `rollout_episodes`: N parallel envs play one episode each inside a
  `lax.scan` (expert / policy / DAgger / DART branching as masked
  selects), then a masked retract scores lifts -- the entire Ray actor
  farm as one XLA program;
- agent updates stream batches straight from the on-device replay.

The driver loop in `loop.py` alternates them and handles schedules,
checkpoints and metrics.
"""

from gaddpg_tpu.train.config import TrainConfig, load_config
from gaddpg_tpu.train.schedules import explore_schedule, noise_schedule
from gaddpg_tpu.train.rollout import RolloutWorker
from gaddpg_tpu.train.loop import Trainer
