"""Policy and critic heads (reference: core/networks.py:253-377).

Plain MLPs (no norm layers) so their target copies are simple parameter
snapshots, like the reference where only the heads have target networks.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

LOG_SIG_MAX = 2.0
LOG_SIG_MIN = -10.0
_EPS = 1e-6

# PandaTaskSpace6D bounds (reference: core/utils.py:505-510).
TASK6D_HIGH = jnp.array([0.06, 0.06, 0.06, jnp.pi / 6, jnp.pi / 6, jnp.pi / 6])
TASK6D_LOW = -TASK6D_HIGH

_xavier = nn.initializers.xavier_uniform()


def _normalize_quat_head(x):
    """Normalize the first 4 dims (quaternion) of a 7-d pose prediction."""
    q = x[..., :4]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
    return jnp.concatenate([q, x[..., 4:]], axis=-1)


class GaussianPolicy(nn.Module):
    """Tanh-squashed Gaussian policy with a 7-d grasp auxiliary head."""

    action_dim: int = 6
    hidden: int = 256
    extra_pred_dim: int = 7
    action_high: tuple = tuple(float(x) for x in TASK6D_HIGH)
    action_low: tuple = tuple(float(x) for x in TASK6D_LOW)

    @nn.compact
    def __call__(self, state):
        """state (B, F) -> (mean, log_std, extra_pred)."""
        h = nn.relu(nn.Dense(self.hidden, kernel_init=_xavier)(state))
        h = nn.relu(nn.Dense(self.hidden, kernel_init=_xavier)(h))
        mean = nn.Dense(self.action_dim, kernel_init=_xavier)(h)
        extra = nn.Dense(self.extra_pred_dim, kernel_init=_xavier)(h)
        if self.extra_pred_dim >= 7:
            # first 7 dims = [quat, trans] grasp prediction; any extra
            # dims (e.g. the collision logit) pass through unnormalized
            extra = _normalize_quat_head(extra)
        log_std = nn.Dense(self.action_dim, kernel_init=_xavier)(h)
        log_std = jnp.clip(log_std, LOG_SIG_MIN, LOG_SIG_MAX)
        return mean, log_std, extra

    def sample(self, state, key: Optional[jax.Array] = None):
        """Returns (squashed_mean, log_prob, sampled_action, extra_pred).

        Matches the reference sample contract
        (reference: core/networks.py:353-371). With key=None the action
        equals the deterministic squashed mean.
        """
        mean, log_std, extra = self(state)
        scale = jnp.asarray(self.action_high, mean.dtype)
        std = jnp.exp(log_std)
        if key is None:
            x_t = mean
        else:
            x_t = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
        y_t = jnp.tanh(x_t)
        action = y_t * scale
        log_prob = (
            -0.5 * ((x_t - mean) / std) ** 2 - log_std - 0.5 * jnp.log(2 * jnp.pi)
        )
        log_prob = log_prob - jnp.log(scale * (1 - y_t**2) + _EPS)
        log_prob = jnp.sum(log_prob, axis=-1, keepdims=True)
        squashed_mean = jnp.tanh(mean) * scale
        return squashed_mean, log_prob, action, extra


class QNetwork(nn.Module):
    """Twin Q + 7-d auxiliary pose head.

    With sa_channel_concat the action rides inside the state feature, so
    no explicit action input is concatenated
    (reference: core/ddpg.py:91-99, config sa_channel_concat=True).
    """

    hidden: int = 256
    extra_pred_dim: int = 7

    @nn.compact
    def __call__(self, state, action=None):
        xu = state if action is None else jnp.concatenate([state, action], axis=-1)
        h1 = nn.relu(nn.Dense(self.hidden, kernel_init=_xavier, name="q1_l1")(xu))
        h1 = nn.relu(nn.Dense(self.hidden, kernel_init=_xavier, name="q1_l2")(h1))
        q1 = nn.Dense(1, kernel_init=_xavier, name="q1_out")(h1)

        h2 = nn.relu(nn.Dense(self.hidden, kernel_init=_xavier, name="q2_l1")(xu))
        h2 = nn.relu(nn.Dense(self.hidden, kernel_init=_xavier, name="q2_l2")(h2))
        q2 = nn.Dense(1, kernel_init=_xavier, name="q2_out")(h2)

        aux = None
        if self.extra_pred_dim > 0:
            h3 = nn.relu(nn.Dense(self.hidden, kernel_init=_xavier, name="aux_l1")(state))
            h3 = nn.relu(nn.Dense(self.hidden, kernel_init=_xavier, name="aux_l2")(h3))
            aux = nn.Dense(self.extra_pred_dim, kernel_init=_xavier, name="aux_out")(h3)
            if self.extra_pred_dim == 7:
                aux = _normalize_quat_head(aux)
        return q1, q2, aux
