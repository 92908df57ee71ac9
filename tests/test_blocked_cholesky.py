"""Blocked-Cholesky variants and the fused factorize+whiten path."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.linalg import solve_triangular

from albatross_tpu.ops.blocked_cholesky import (
    blocked_cholesky,
    blocked_cholesky_cols,
)
from albatross_tpu.ops.linalg import CholeskyFactor


def _spd(rng, n):
    A = rng.standard_normal((n, n))
    return jnp.asarray(A @ A.T + n * np.eye(n))


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.mark.parametrize("n,b", [(96, 32), (100, 32), (256, 64)])
def test_blocked_matches_builtin(rng, n, b):
    K = _spd(rng, n)
    L_ref = jnp.linalg.cholesky(K)
    np.testing.assert_allclose(blocked_cholesky(K, b), L_ref, atol=1e-8)
    np.testing.assert_allclose(
        blocked_cholesky(K, b, use_inverse=False), L_ref, atol=1e-8
    )
    if n % b == 0:
        np.testing.assert_allclose(
            blocked_cholesky_cols(K, b), L_ref, atol=1e-8
        )


@pytest.mark.parametrize("n,b", [(96, 32), (100, 32), (32, 64)])
def test_fused_whiten_matches_triangular_solve(rng, n, b):
    K = _spd(rng, n)
    y = jnp.asarray(rng.standard_normal(n))
    L, z = blocked_cholesky(K, b, rhs=y)
    z_ref = solve_triangular(jnp.linalg.cholesky(K), y[:, None], lower=True)
    np.testing.assert_allclose(z, z_ref[:, 0], atol=1e-8)
    Lc, zc = blocked_cholesky_cols(K, b, rhs=y)
    np.testing.assert_allclose(zc, z_ref[:, 0], atol=1e-8)
    np.testing.assert_allclose(Lc, jnp.linalg.cholesky(K), atol=1e-8)


def test_factorize_whiten_small_and_large_agree(rng):
    # n > 2048 exercises the blocked fused path inside factorize_whiten
    n = 2176
    x = np.sort(rng.uniform(0, 10, n))
    d = x[:, None] - x[None, :]
    K = jnp.asarray(np.exp(-0.5 * d**2) + 0.5 * np.eye(n))
    y = jnp.asarray(rng.standard_normal(n))
    chol, white = CholeskyFactor.factorize_whiten(K, y)
    ref = chol.sqrt_solve(y)
    np.testing.assert_allclose(white, ref, atol=1e-7)
    # quadratic form matches a dense solve
    np.testing.assert_allclose(
        jnp.sum(white * white), y @ chol.solve(y), rtol=1e-9
    )


def test_gp_log_likelihood_fused_matches_safe(rng):
    import albatross_tpu as ab

    x = jnp.asarray(np.sort(rng.uniform(0, 10, 64)))
    y = jnp.sin(x) + 0.1 * jnp.asarray(rng.standard_normal(64))
    kernel = ab.SquaredExponential(1.0, 1.0) + ab.IndependentNoise(0.1)
    data = ab.RegressionDataset.create(x, y)
    fused = ab.gp_from_covariance(kernel, jitter=1e-8)
    safe = ab.gp_from_covariance(
        kernel, jitter=1e-8, safe_factorization=True
    )
    np.testing.assert_allclose(
        fused.log_likelihood(data), safe.log_likelihood(data), rtol=1e-10
    )


def test_blocked_tri_inverse(rng):
    from albatross_tpu.ops.blocked_cholesky import blocked_tri_inverse

    for n, sub in [(128, 32), (96, 32), (100, 32), (64, 128)]:
        K = _spd(rng, n)
        L = jnp.linalg.cholesky(K)
        W = blocked_tri_inverse(L, sub)
        np.testing.assert_allclose(W @ L, np.eye(n), atol=1e-8)
        assert np.allclose(np.triu(np.asarray(W), 1), 0.0)


def test_two_level_cols_matches_builtin(rng):
    n, b, sub = 256, 64, 32
    K = _spd(rng, n)
    y = jnp.asarray(rng.standard_normal(n))
    L_ref = jnp.linalg.cholesky(K)
    L, z = blocked_cholesky_cols(K, b, rhs=y, panel_sub=sub)
    np.testing.assert_allclose(L, L_ref, atol=1e-8)
    z_ref = solve_triangular(L_ref, y[:, None], lower=True)[:, 0]
    np.testing.assert_allclose(z, z_ref, atol=1e-8)


def test_no_assemble_nlml_path(rng):
    """assemble=False returns (diag(L), whitened) identical to the
    assembled factor — the NLML hot loop skips the O(N²) factor write."""
    from albatross_tpu.ops.blocked_cholesky import blocked_cholesky_cols

    n = 3072  # > one block: exercises the column-panel diag gather
    A = rng.standard_normal((n, n))
    K = jnp.asarray(A @ A.T + n * np.eye(n))
    y = jnp.asarray(rng.standard_normal(n))
    L, z = blocked_cholesky_cols(K, rhs=y)
    diag, z2 = blocked_cholesky_cols(K, rhs=y, assemble=False)
    np.testing.assert_array_equal(np.asarray(diag), np.diagonal(np.asarray(L)))
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z2))
    with pytest.raises(ValueError, match="requires rhs"):
        blocked_cholesky_cols(K, assemble=False)


def test_fused_panel_factorizer_matches_builtin(rng):
    """config.PANEL_FACTORIZER="fused" swaps the panel chol+inverse for the
    sub-blocked recursion; the factor and the NLML must match the builtin
    path (f64 CPU: to reduction-order tolerance)."""
    from albatross_tpu import config
    from albatross_tpu.ops.blocked_cholesky import (
        blocked_cholesky_cols,
        fused_panel_chol_inverse,
    )

    n, b = 1024, 512
    Araw = rng.standard_normal((n, n))
    K = jnp.asarray(Araw @ Araw.T + n * np.eye(n))
    y = jnp.asarray(rng.standard_normal(n))

    # unit: fused panel (L, W) against the direct computation
    Akk = np.asarray(K)[:b, :b]
    L_ref = np.linalg.cholesky(Akk)
    Lf, Wf = fused_panel_chol_inverse(jnp.asarray(Akk), 128)
    np.testing.assert_allclose(np.asarray(Lf), L_ref, rtol=1e-10, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(Wf) @ L_ref, np.eye(b), atol=1e-9
    )

    # pipeline: full factorization + whiten equivalence via the config knob
    L0, z0 = blocked_cholesky_cols(K, block_size=b, rhs=y)
    prev = config.PANEL_FACTORIZER
    try:
        config.PANEL_FACTORIZER = "fused"
        blocked_cholesky_cols.clear_cache()
        L1, z1 = blocked_cholesky_cols(K, block_size=b, rhs=y)
    finally:
        config.PANEL_FACTORIZER = prev
        blocked_cholesky_cols.clear_cache()
    np.testing.assert_allclose(np.asarray(L1), np.asarray(L0), atol=1e-8)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z0), atol=1e-8)
