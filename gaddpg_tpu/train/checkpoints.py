"""Checkpoint save/load for AgentState + replay buffer.

Role of the reference's per-module torch checkpoints + .npz buffer dump
(reference: core/agent.py:282-431, core/replay_memory.py:274-356), as a
single msgpack file per snapshot (`agent_latest`, `agent_epoch_N`)
holding every param/optimizer/target tensor and the update step.
"""

import os
from typing import Optional

import jax
import numpy as np
from flax import serialization

from gaddpg_tpu.agents.state import AgentState


def save_agent(state: AgentState, output_dir: str, surfix: str = "latest"):
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, f"agent_{surfix}.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(state)))
    return path


def load_agent(template: AgentState, output_dir: str,
               surfix: str = "latest") -> Optional[AgentState]:
    path = os.path.join(output_dir, f"agent_{surfix}.msgpack")
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
