"""Scalar gaussian log-pdf
(/root/reference/include/albatross/src/stats/gaussian.hpp:19-27)."""

from __future__ import annotations

import math

import jax.numpy as jnp

LOG_2PI = math.log(2.0 * math.pi)


def gaussian_log_pdf(deviation, variance):
    deviation = jnp.asarray(deviation, dtype=jnp.result_type(deviation, float))
    return -0.5 * (LOG_2PI + jnp.log(variance) + deviation * deviation / variance)


def gaussian_pdf(deviation, variance):
    """N(0, variance) density at ``deviation`` (gaussian.hpp pdf)."""
    return jnp.exp(gaussian_log_pdf(deviation, variance))
