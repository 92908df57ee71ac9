"""Pallas fused gram kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from albatross_tpu.kernels.radial import (
    exponential_covariance,
    matern_32_covariance,
    matern_52_covariance,
    squared_exponential_covariance,
)
from albatross_tpu.ops.pallas_gram import (
    fused_radial_gram,
    pallas_radial_gram,
)

PROFILES = {
    "squared_exponential": squared_exponential_covariance,
    "exponential": exponential_covariance,
    "matern_32": matern_32_covariance,
    "matern_52": matern_52_covariance,
}


@pytest.mark.parametrize("profile", sorted(PROFILES))
def test_pallas_gram_matches_closed_form(profile, rng):
    X = jnp.asarray(rng.uniform(0, 100, 300), dtype=jnp.float32)
    Y = jnp.asarray(rng.uniform(0, 100, 140), dtype=jnp.float32)
    K = pallas_radial_gram(X, Y, 5.0, 2.0, profile, interpret=True)
    D = np.abs(np.asarray(X)[:, None] - np.asarray(Y)[None, :])
    ref = np.asarray(PROFILES[profile](jnp.asarray(D), 5.0, 2.0))
    np.testing.assert_allclose(np.asarray(K), ref, atol=2e-6)


def test_pallas_gram_multidim(rng):
    X = jnp.asarray(rng.uniform(0, 10, (260, 3)), dtype=jnp.float32)
    K = pallas_radial_gram(X, X, 2.0, 1.5, "matern_52", interpret=True)
    D = np.linalg.norm(
        np.asarray(X)[:, None, :] - np.asarray(X)[None, :, :], axis=-1
    )
    ref = np.asarray(matern_52_covariance(jnp.asarray(D), 2.0, 1.5))
    np.testing.assert_allclose(np.asarray(K), ref, atol=2e-6)


def test_fused_gram_gradients_match_xla(rng):
    """The custom VJP (XLA backward) must match differentiating the closed
    form directly."""
    X = jnp.asarray(rng.uniform(0, 10, 64), dtype=jnp.float64)

    def loss_fused(ls):
        # interpret path via monkeypatched pallas? use the XLA reference by
        # checking fused == pallas; here we only validate the VJP wiring on
        # CPU where pallas_radial_gram runs in compiled CPU interpret.
        K = fused_radial_gram(X, X, ls, 2.0, "squared_exponential")
        return jnp.sum(K * jnp.cos(K))

    def loss_ref(ls):
        D = jnp.abs(X[:, None] - X[None, :])
        K = squared_exponential_covariance(D, ls, 2.0)
        return jnp.sum(K * jnp.cos(K))

    try:
        g_fused = jax.grad(loss_fused)(1.7)
    except Exception as exc:  # pallas unavailable on this backend
        pytest.skip(f"pallas unavailable: {exc}")
    g_ref = jax.grad(loss_ref)(1.7)
    assert float(g_fused) == pytest.approx(float(g_ref), rel=1e-5)


def test_pallas_auto_policy_by_dimension():
    """Auto policy (round 2): pallas engages for D>8 radial grams — where
    the XLA matmul-distance path cancels (measured 2.0e-5 vs pallas 6.1e-10
    error vs f64 at D=32 on v5e) — and stays off for D<=8 where XLA's
    broadcast path is exact AND faster in-pipeline."""
    import jax.numpy as jnp

    from albatross_tpu import config

    assert config.USE_PALLAS_GRAM is None  # auto
    big = config.PALLAS_GRAM_MIN_ELEMENTS
    # CPU backend always disables the compiled kernel; check the policy
    # pieces that are backend-independent
    assert not config.pallas_gram_enabled(big, jnp.float32, d=1)
    assert not config.pallas_gram_enabled(big, jnp.float32, d=8)
    assert not config.pallas_gram_enabled(big - 1, jnp.float32, d=32)
    assert not config.pallas_gram_enabled(big, jnp.float64, d=32)


def test_fused_training_cov_diag_kernel_interpret(rng):
    """The diag-epilogue kernel (interpret mode) matches gram + diag."""
    import jax.numpy as jnp

    from albatross_tpu.ops.pallas_gram import pallas_radial_gram

    n, d = 300, 3
    X = jnp.asarray(rng.standard_normal((n, d)))
    diag = jnp.asarray(rng.uniform(0.1, 0.5, n))
    got = pallas_radial_gram(
        X, X, 1.5, 1.2, "matern_32", diag_add=diag, interpret=True
    )
    base = pallas_radial_gram(X, X, 1.5, 1.2, "matern_32", interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(base) + np.diag(np.asarray(diag)),
        rtol=1e-12,
    )
