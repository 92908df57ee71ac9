"""Differential entropy of Gaussians
(/root/reference/include/albatross/src/evaluation/differential_entropy.hpp:20-50):
H = ½ log det(2πe Σ)."""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..ops.linalg import CholeskyFactor

LOG_2PIE = math.log(2.0 * math.pi * math.e)


def differential_entropy(covariance) -> jnp.ndarray:
    covariance = jnp.asarray(covariance)
    if covariance.ndim == 1:
        from ..ops.compensated import accurate_sum_of_logs

        n = covariance.shape[0]
        return 0.5 * (n * LOG_2PIE + accurate_sum_of_logs(covariance))
    chol = CholeskyFactor.factorize(covariance)
    n = covariance.shape[0]
    return 0.5 * (n * LOG_2PIE + chol.log_determinant())
