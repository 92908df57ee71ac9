"""Kolmogorov–Smirnov statistic against Uniform(0,1)
(/root/reference/include/albatross/src/stats/ks_test.hpp:22)."""

from __future__ import annotations

import jax.numpy as jnp


def uniform_ks_test(samples) -> jnp.ndarray:
    """sup |F_empirical(x) - x| over sorted samples."""
    s = jnp.sort(jnp.asarray(samples))
    n = s.shape[0]
    grid_hi = jnp.arange(1, n + 1, dtype=s.dtype) / n
    grid_lo = jnp.arange(0, n, dtype=s.dtype) / n
    return jnp.maximum(jnp.max(jnp.abs(grid_hi - s)), jnp.max(jnp.abs(s - grid_lo)))
