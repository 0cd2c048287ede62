"""Rainbow network: NoisyNet linear layers + C51 distributional head.

The reference uses the ``autonomous-learning-library`` classic-control
Rainbow preset (reference: rainbow.py:46-49); its internals live outside
the repo, so the components are re-derived from the published Rainbow
recipe (C51 categorical value distribution, factorized-Gaussian NoisyNets
for exploration, dueling aggregation).  PER and multi-step targets are
handled by the trainer (agents/rainbow.py) on top of rl/replay.py.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["NoisyDense", "RainbowNet"]


class NoisyDense(nn.Module):
    """Factorized-Gaussian noisy linear layer (Fortunato et al. 2018)."""

    features: int
    sigma0: float = 0.5

    @nn.compact
    def __call__(self, x, rng=None):
        in_f = x.shape[-1]
        bound = 1.0 / jnp.sqrt(in_f)
        w_mu = self.param("w_mu", nn.initializers.uniform(scale=2 * bound),
                          (in_f, self.features))
        b_mu = self.param("b_mu", nn.initializers.uniform(scale=2 * bound),
                          (self.features,))
        sigma_init = self.sigma0 / jnp.sqrt(in_f)
        w_sigma = self.param("w_sigma",
                             nn.initializers.constant(sigma_init),
                             (in_f, self.features))
        b_sigma = self.param("b_sigma",
                             nn.initializers.constant(sigma_init),
                             (self.features,))
        if rng is None:
            return x @ w_mu + b_mu
        k1, k2 = jax.random.split(rng)
        f = lambda e: jnp.sign(e) * jnp.sqrt(jnp.abs(e))
        eps_in = f(jax.random.normal(k1, (in_f,)))
        eps_out = f(jax.random.normal(k2, (self.features,)))
        w = w_mu + w_sigma * jnp.outer(eps_in, eps_out)
        b = b_mu + b_sigma * eps_out
        return x @ w + b


class RainbowNet(nn.Module):
    """Dueling C51 head over discrete jerk actions."""

    num_actions: int = 5
    num_atoms: int = 51
    hidden: int = 256
    sigma0: float = 0.5

    @nn.compact
    def __call__(self, x, rng=None):
        keys = jax.random.split(rng, 3) if rng is not None else [None] * 3
        x = nn.relu(NoisyDense(self.hidden, self.sigma0)(x, keys[0]))
        value = NoisyDense(self.num_atoms, self.sigma0)(x, keys[1])
        adv = NoisyDense(self.num_actions * self.num_atoms,
                         self.sigma0)(x, keys[2])
        adv = adv.reshape(x.shape[:-1] + (self.num_actions, self.num_atoms))
        logits = value[..., None, :] + adv - adv.mean(axis=-2, keepdims=True)
        return logits  # (..., actions, atoms)


def atom_support(v_min: float = -10.0, v_max: float = 10.0,
                 num_atoms: int = 51) -> jnp.ndarray:
    return jnp.linspace(v_min, v_max, num_atoms)
