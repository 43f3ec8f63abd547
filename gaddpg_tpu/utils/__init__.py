"""Shared utilities: episode recording, timers."""

from gaddpg_tpu.utils.recording import EpisodeRecorder
