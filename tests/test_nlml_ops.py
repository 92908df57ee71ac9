"""GEMM-composed potri primitives (ops/nlml.py): trtri, lauum, spd inverse
match dense linalg at both the small (dense fallback) and blocked scales."""

import jax.numpy as jnp
import numpy as np
import pytest

from albatross_tpu.ops.nlml import (
    blocked_lauum,
    spd_inverse_from_factor,
    tri_inverse_full,
)


@pytest.mark.parametrize("n", [300, 2304, 2113])
def test_potri_primitives(rng, n):
    """n=2113: >2048 and divisible by no block candidate — exercises the
    identity-tail pad-and-mask path, so non-divisible N keeps the GEMM
    (compile-memory-safe) route instead of dense substitution."""
    A = rng.standard_normal((n, n))
    K = A @ A.T + n * np.eye(n)
    L = np.linalg.cholesky(K)
    W = tri_inverse_full(jnp.asarray(L))
    np.testing.assert_allclose(np.asarray(W), np.linalg.inv(L), atol=1e-9)
    M = blocked_lauum(jnp.asarray(np.asarray(W)))
    np.testing.assert_allclose(
        np.asarray(M), np.asarray(W).T @ np.asarray(W), atol=1e-9
    )
    Kinv = spd_inverse_from_factor(jnp.asarray(L))
    np.testing.assert_allclose(np.asarray(Kinv), np.linalg.inv(K), atol=1e-8)


def test_cholesky_factor_inverse_family(rng):
    from albatross_tpu.ops.linalg import CholeskyFactor

    n = 96
    A = rng.standard_normal((n, n))
    K = jnp.asarray(A @ A.T + n * np.eye(n))
    chol = CholeskyFactor.factorize(K)
    Kinv = np.linalg.inv(np.asarray(K))
    np.testing.assert_allclose(np.asarray(chol.inverse()), Kinv, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(chol.inverse_diagonal()), np.diagonal(Kinv), atol=1e-9
    )
    blocks = chol.inverse_blocks([np.arange(5), np.arange(5, 12)])
    np.testing.assert_allclose(np.asarray(blocks[0]), Kinv[:5, :5], atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(blocks[1]), Kinv[5:12, 5:12], atol=1e-9
    )
