"""Learning agents: BC and DDPG/TD3 with goal-auxiliary losses.

Jitted functional re-designs of the reference's torch agents
(reference: core/agent.py, core/ddpg.py, core/bc.py, core/loss.py).
Instead of 4 modules x (net + optimizer + scheduler) objects mutated in
place, each agent is a pure `update(state, batch) -> (state, metrics)`
on a single `AgentState` pytree, so the whole learner step is one XLA
program that pjit shards over the batch axis.
"""

from gaddpg_tpu.agents.losses import (
    goal_pred_loss,
    pose_bc_loss,
    smooth_l1,
)
from gaddpg_tpu.agents.config import AgentConfig
from gaddpg_tpu.agents.state import AgentState, create_agent_state
from gaddpg_tpu.agents.ddpg import ddpg_update, select_action, extract_feature
from gaddpg_tpu.agents.bc import bc_update
