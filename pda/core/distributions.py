"""Diagonal Gaussian latent distribution — pure, jittable.

TPU-native replacement for the torch ``Independent(Normal(mu, exp(log_sigma)), 1)``
latent used by the reference PUNet
(reference: prob_utils/my_models/probabilistic_unet.py:139-141).
Instead of a stateful distribution object we carry (mu, log_sigma) as a small
NamedTuple of arrays so it can flow through jit/vmap/scan and shardings.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DiagGaussian(NamedTuple):
    """A batch of axis-aligned Gaussians over the latent space.

    mu, log_sigma: float arrays of shape (..., latent_dim).
    """

    mu: jax.Array
    log_sigma: jax.Array

    @property
    def sigma(self) -> jax.Array:
        return jnp.exp(self.log_sigma)

    def sample(self, key: jax.Array) -> jax.Array:
        """Reparameterized sample: mu + sigma * eps.

        The reference distinguishes ``rsample()`` (training) from ``sample()``
        (testing) (probabilistic_unet.py:295-309); in JAX both are the same
        expression — gradient flow is controlled by ``stop_gradient`` at the
        call site instead.
        """
        eps = jax.random.normal(key, self.mu.shape, dtype=self.mu.dtype)
        return self.mu + jnp.exp(self.log_sigma) * eps

    def sample_n(self, key: jax.Array, n: int) -> jax.Array:
        """Draw ``n`` samples at once -> shape (n, ..., latent_dim).

        One fused sampling op replaces the reference's per-sample Python loop
        (e.g. prob_utils/my_trainer/punet_trainer.py:16).
        """
        eps = jax.random.normal(key, (n, *self.mu.shape), dtype=self.mu.dtype)
        return self.mu[None] + jnp.exp(self.log_sigma)[None] * eps

    def log_prob(self, z: jax.Array) -> jax.Array:
        """Log density, summed over the (last) latent axis."""
        log_unnorm = -0.5 * jnp.square((z - self.mu) / jnp.exp(self.log_sigma))
        log_norm = -0.5 * jnp.log(2.0 * jnp.pi) - self.log_sigma
        return jnp.sum(log_unnorm + log_norm, axis=-1)


def kl_divergence(q: DiagGaussian, p: DiagGaussian) -> jax.Array:
    """Analytic KL(q || p) for diagonal Gaussians, summed over the latent axis.

    Matches torch ``kl.kl_divergence(posterior, prior)`` on Independent Normals
    (reference: probabilistic_unet.py:324-339). Returns shape (...,) — one value
    per batch element.
    """
    var_ratio = jnp.exp(2.0 * (q.log_sigma - p.log_sigma))
    t1 = jnp.square((q.mu - p.mu) / jnp.exp(p.log_sigma))
    return 0.5 * jnp.sum(var_ratio + t1 - 1.0 - jnp.log(var_ratio), axis=-1)


def mc_kl_divergence(q: DiagGaussian, p: DiagGaussian, z: jax.Array) -> jax.Array:
    """Monte-Carlo KL estimate log q(z) - log p(z) (reference :336-338)."""
    return q.log_prob(z) - p.log_prob(z)
