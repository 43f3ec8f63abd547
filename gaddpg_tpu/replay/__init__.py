"""On-device replay: sharded ring buffers + reference .npz compatibility.

Replaces the reference's Ray-hosted numpy buffer actor
(reference: core/replay_memory.py, core/trainer.py:296-298) with a pure
pytree that lives in HBM: pushes are jitted scatters from the rollout
program, sampling is a gather inside the learner step -- no serialization
hop, no object store.
"""

from gaddpg_tpu.replay.buffer import (
    ReplayBuffer,
    create_buffer,
    add_episode,
    add_episodes,
    sample,
    upper_idx,
)
from gaddpg_tpu.replay.npz_io import save_npz, load_npz
