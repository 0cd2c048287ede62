"""Q-network MLP for the custom DQN trainer.

Flax re-design of the reference's torch module (reference: dqn.py:566-658
``DQN``): input = the observation vector, one 256-unit hidden layer at the
default ``num_hidden=2`` (the reference builds ``num_hidden - 2`` middle
layers, dqn.py:578), ReLU activations, linear head over the discrete jerk
actions, optional dropout (dqn.py:580-591).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["DQNNet"]


class DQNNet(nn.Module):
    num_outputs: int = 5
    hidden_size: int = 256
    num_hidden: int = 2
    dropout: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_size)(x)
        if self.dropout:
            x = nn.Dropout(0.5, deterministic=deterministic)(x)
        x = nn.relu(x)
        for _ in range(self.num_hidden - 2):
            x = nn.Dense(self.hidden_size)(x)
            if self.dropout:
                x = nn.Dropout(0.5, deterministic=deterministic)(x)
            x = nn.relu(x)
        return nn.Dense(self.num_outputs)(x)
