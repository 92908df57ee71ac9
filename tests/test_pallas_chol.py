"""Pallas fused panel chol+inverse (ops/pallas_chol.py).

Runs in interpreter mode on CPU (same convention as test_pallas_gram);
sizes stay small — interpret mode executes the 128-step tile recursion in
python.  The TPU measurements live in benchmarks/exp_pallas_panel.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from albatross_tpu.ops.pallas_chol import pallas_panel_cholinv


def _spd(rng, b):
    A = rng.standard_normal((b, b))
    return jnp.asarray((A @ A.T + b * np.eye(b)).astype(np.float32))


@pytest.mark.parametrize("b", [128, 256])
def test_panel_cholinv_matches_numpy(rng, b):
    K = _spd(rng, b)
    U, Wu = pallas_panel_cholinv(K, interpret=True)
    U, Wu = np.asarray(U), np.asarray(Wu)
    L_ref = np.linalg.cholesky(np.asarray(K, np.float64))
    W_ref = np.linalg.inv(L_ref)
    assert np.max(np.abs(U.T - L_ref)) / np.max(np.abs(L_ref)) < 1e-5
    assert np.max(np.abs(Wu.T - W_ref)) / np.max(np.abs(W_ref)) < 1e-4
    # honest triangulars: strict lower is exactly zero
    np.testing.assert_array_equal(np.tril(U, -1), 0.0)
    np.testing.assert_array_equal(np.tril(Wu, -1), 0.0)


def test_panel_cholinv_shape_guards(rng):
    with pytest.raises(ValueError, match="b % 128"):
        pallas_panel_cholinv(jnp.eye(100, dtype=jnp.float32), interpret=True)
    with pytest.raises(ValueError, match="b % 128"):
        pallas_panel_cholinv(jnp.eye(1152, dtype=jnp.float32), interpret=True)


@pytest.mark.slow
def test_blocked_pipeline_with_pallas_factorizer(rng):
    """panel_factorizer="pallas" through blocked_cholesky_cols reproduces
    the factorization, whitening, and no-assemble diag."""
    from albatross_tpu.ops.blocked_cholesky import blocked_cholesky_cols

    n, b = 1024, 256
    K = _spd(rng, n)
    y = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    L_ref = np.linalg.cholesky(np.asarray(K, np.float64))
    z_ref = np.linalg.solve(L_ref, np.asarray(y, np.float64))

    diag, z = blocked_cholesky_cols(
        K, block_size=b, rhs=y, assemble=False, panel_factorizer="pallas"
    )
    assert np.max(np.abs(np.asarray(diag) - np.diag(L_ref)) / np.diag(L_ref)) < 1e-5
    assert np.max(np.abs(np.asarray(z) - z_ref)) / np.max(np.abs(z_ref)) < 1e-4
    L = blocked_cholesky_cols(K, block_size=b, panel_factorizer="pallas")
    assert np.max(np.abs(np.asarray(L) - L_ref)) / np.max(np.abs(L_ref)) < 1e-5
