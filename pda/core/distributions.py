"""Diagonal Gaussian latent distribution — pure, jittable.

TPU-native replacement for the torch ``Independent(Normal(mu, exp(log_sigma)), 1)``
latent used by the reference PUNet
(reference: prob_utils/my_models/probabilistic_unet.py:139-141).
Instead of a stateful distribution object we carry (mu, log_sigma) as a small
NamedTuple of arrays so it can flow through jit/vmap/scan and shardings.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def sharded_normal(
    key: jax.Array,
    shape,
    dtype,
    axis_name: Optional[str] = None,
    batch_axis: int = 0,
) -> jax.Array:
    """``jax.random.normal`` whose result is EXACTLY the local slice of a
    global-batch draw when running inside ``shard_map`` over ``axis_name``.

    Every shard holds the same replicated ``key``; drawing locally would give
    all shards identical noise for different data (and break loss equality
    with the single-device program). Instead the full global-batch noise is
    drawn (latent-sized arrays — cheap) and each shard slices its block, so a
    sharded step reproduces the unsharded step bit-for-bit.
    """
    if axis_name is None:
        return jax.random.normal(key, shape, dtype)
    n = jax.lax.axis_size(axis_name)
    gshape = (
        *shape[:batch_axis],
        shape[batch_axis] * n,
        *shape[batch_axis + 1 :],
    )
    g = jax.random.normal(key, gshape, dtype)
    i = jax.lax.axis_index(axis_name)
    return jax.lax.dynamic_slice_in_dim(
        g, i * shape[batch_axis], shape[batch_axis], batch_axis
    )


class DiagGaussian(NamedTuple):
    """A batch of axis-aligned Gaussians over the latent space.

    mu, log_sigma: float arrays of shape (..., latent_dim).
    """

    mu: jax.Array
    log_sigma: jax.Array

    @property
    def sigma(self) -> jax.Array:
        return jnp.exp(self.log_sigma)

    def sample(self, key: jax.Array, axis_name: Optional[str] = None) -> jax.Array:
        """Reparameterized sample: mu + sigma * eps.

        The reference distinguishes ``rsample()`` (training) from ``sample()``
        (testing) (probabilistic_unet.py:295-309); in JAX both are the same
        expression — gradient flow is controlled by ``stop_gradient`` at the
        call site instead. ``axis_name``: inside shard_map, draw the noise as
        the local slice of the global-batch draw (see :func:`sharded_normal`).
        """
        eps = sharded_normal(key, self.mu.shape, self.mu.dtype, axis_name)
        return self.mu + jnp.exp(self.log_sigma) * eps

    def sample_n(
        self, key: jax.Array, n: int, axis_name: Optional[str] = None
    ) -> jax.Array:
        """Draw ``n`` samples at once -> shape (n, ..., latent_dim).

        One fused sampling op replaces the reference's per-sample Python loop
        (e.g. prob_utils/my_trainer/punet_trainer.py:16).
        """
        eps = sharded_normal(
            key, (n, *self.mu.shape), self.mu.dtype, axis_name, batch_axis=1
        )
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
