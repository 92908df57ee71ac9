"""Batched distance metrics.

TPU-native re-design of the reference distance metrics
(/root/reference/include/albatross/src/covariance_functions/distance_metrics.hpp:30-90).

The reference computes distances one scalar pair at a time; here each metric
produces the full pairwise matrix for feature *batches* in one shot so the
inner contraction (`x · y`) runs on the MXU via a single matmul.  Metrics are
immutable, hashable, parameter-free dataclasses — static metadata on kernels.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

EPSILON = 1e-16  # acos clamping guard (distance_metrics.hpp:18)


def as_matrix(X) -> jnp.ndarray:
    """Coerce a feature batch to (N, D)."""
    X = jnp.asarray(X)
    if X.ndim == 1:
        return X[:, None]
    if X.ndim == 2:
        return X
    return X.reshape(X.shape[0], -1)


@dataclasses.dataclass(frozen=True)
class DistanceMetric:
    @property
    def name(self) -> str:
        raise NotImplementedError

    def pairwise(self, X, Y) -> jnp.ndarray:
        """(N, M) matrix of distances between feature batches."""
        raise NotImplementedError

    def diag(self, X) -> jnp.ndarray:
        """Distance of each feature to itself — zero for all our metrics."""
        X = as_matrix(X)
        return jnp.zeros(X.shape[0], dtype=X.dtype)


@dataclasses.dataclass(frozen=True)
class EuclideanDistance(DistanceMetric):
    """|x - y| for scalars, ||x - y|| for vectors."""

    @property
    def name(self) -> str:
        return "euclidean_distance"

    # Below this many feature dimensions the exact elementwise broadcast is
    # used; above it the MXU matmul trick wins.  The matmul runs at HIGHEST
    # precision: TPU's default f32 matmul is a single bf16 pass, which
    # catastrophically cancels |x|²+|y|²−2x·y for large-magnitude features
    # (observed as NaN Cholesky on v5e with x ~ O(100)).
    _BROADCAST_MAX_D = 8

    def pairwise_squared(self, X, Y) -> jnp.ndarray:
        """Squared pairwise distances; no sqrt for kernels (like the squared
        exponential) that only need d²."""
        X, Y = as_matrix(X), as_matrix(Y)
        if X.shape[-1] <= self._BROADCAST_MAX_D:
            diff = X[:, None, :] - Y[None, :, :]
            return jnp.sum(diff * diff, axis=-1)
        x2 = jnp.sum(X * X, axis=-1)
        y2 = jnp.sum(Y * Y, axis=-1)
        xy = jax.lax.dot(X, Y.T, precision=jax.lax.Precision.HIGHEST)
        d2 = x2[:, None] + y2[None, :] - 2.0 * xy
        return jnp.maximum(d2, 0.0)

    def pairwise(self, X, Y) -> jnp.ndarray:
        X, Y = as_matrix(X), as_matrix(Y)
        if X.shape[-1] == 1:
            # 1-D features: exact |x - y| (matches the reference's fabs path).
            return jnp.abs(X[:, 0][:, None] - Y[:, 0][None, :])
        return jnp.sqrt(self.pairwise_squared(X, Y))


@dataclasses.dataclass(frozen=True)
class RadialDistance(DistanceMetric):
    """| ||x|| - ||y|| | (distance_metrics.hpp:47-62)."""

    @property
    def name(self) -> str:
        return "radial_distance"

    def pairwise(self, X, Y) -> jnp.ndarray:
        X, Y = as_matrix(X), as_matrix(Y)
        nx = jnp.linalg.norm(X, axis=-1)
        ny = jnp.linalg.norm(Y, axis=-1)
        return jnp.abs(nx[:, None] - ny[None, :])


@dataclasses.dataclass(frozen=True)
class AngularDistance(DistanceMetric):
    """Great-circle angle via acos of normalized dot products, with the
    reference's special-casing near ±1 (distance_metrics.hpp:64-90)."""

    @property
    def name(self) -> str:
        return "angular_distance"

    def pairwise(self, X, Y) -> jnp.ndarray:
        X, Y = as_matrix(X), as_matrix(Y)
        nx = jnp.linalg.norm(X, axis=-1)
        ny = jnp.linalg.norm(Y, axis=-1)
        dots = jax.lax.dot(X, Y.T, precision=jax.lax.Precision.HIGHEST) / (
            nx[:, None] * ny[None, :]
        )
        angles = jnp.arccos(jnp.clip(dots, -1.0 + EPSILON, 1.0 - EPSILON))
        return jnp.where(
            dots > 1.0 - EPSILON,
            0.0,
            jnp.where(dots < -1.0 + EPSILON, math.pi, angles),
        )
