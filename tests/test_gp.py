"""Exact-GP tests: fit/predict math vs straight NumPy, update equivalence,
fit_from_prediction (reference: tests/test_models.cc, test_gp.cc)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from albatross_tpu import (
    GaussianProcess,
    IndependentNoise,
    LinearMean,
    MarginalDistribution,
    RegressionDataset,
    SquaredExponential,
    gp_from_covariance,
    gp_from_covariance_and_mean,
    measurement_only,
)


def make_toy_sine_data(rng, n=30, noise=0.1):
    x = np.sort(rng.uniform(0.0, 10.0, n))
    y = np.sin(x) + noise * rng.standard_normal(n)
    return RegressionDataset.create(
        jnp.asarray(x), jnp.asarray(y), variance=jnp.full((n,), noise**2)
    )


def sinc_kernel():
    return SquaredExponential(length_scale=1.5, sigma=1.0) + measurement_only(
        IndependentNoise(0.2)
    )


def numpy_gp_reference(x, y, yvar, xs, ls, sigma, noise):
    """Independent dense-NumPy exact GP for cross-checking."""

    def k(a, b):
        return sigma**2 * np.exp(-(((a[:, None] - b[None, :]) / ls) ** 2))

    K = k(x, x) + np.diag(np.full(x.shape, noise**2)) + np.diag(yvar)
    Ks = k(x, xs)
    Kss = k(xs, xs)
    Kinv_y = np.linalg.solve(K, y)
    mean = Ks.T @ Kinv_y
    cov = Kss - Ks.T @ np.linalg.solve(K, Ks)
    nll = 0.5 * (
        np.linalg.slogdet(K)[1]
        + y @ np.linalg.solve(K, y)
        + len(x) * math.log(2 * math.pi)
    )
    return mean, cov, nll


def test_gp_predictions_match_numpy(rng):
    data = make_toy_sine_data(rng)
    model = gp_from_covariance(sinc_kernel())
    fit_model = model.fit(data)
    xs = jnp.linspace(0.0, 10.0, 11)
    pred = fit_model.predict(xs)

    x = np.asarray(data.features)
    y = np.asarray(data.targets.mean)
    yvar = np.asarray(data.targets.variance)
    mean_ref, cov_ref, _ = numpy_gp_reference(
        x, y, yvar, np.asarray(xs), 1.5, 1.0, 0.2
    )

    joint = pred.joint()
    np.testing.assert_allclose(np.asarray(joint.mean), mean_ref, rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(joint.covariance), cov_ref, rtol=1e-6, atol=1e-10
    )

    marginal = pred.marginal()
    np.testing.assert_allclose(np.asarray(marginal.mean), mean_ref, rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(marginal.variance), np.diagonal(cov_ref), rtol=1e-6
    )

    mean_only = pred.mean()
    np.testing.assert_allclose(np.asarray(mean_only), mean_ref, rtol=1e-8)


def test_log_likelihood_matches_numpy(rng):
    data = make_toy_sine_data(rng)
    model = gp_from_covariance(sinc_kernel())
    # log_likelihood does NOT add target variance (gp.hpp:442-451)
    x = np.asarray(data.features)
    y = np.asarray(data.targets.mean)
    _, _, nll_ref = numpy_gp_reference(
        x, y, np.zeros_like(y), x[:1], 1.5, 1.0, 0.2
    )
    ll = float(model.log_likelihood(data))
    assert ll == pytest.approx(-nll_ref, rel=1e-9)


def test_gp_with_mean_function(rng):
    data = make_toy_sine_data(rng)
    shifted = RegressionDataset.create(
        data.features,
        data.targets.mean + 3.0 + 0.5 * jnp.asarray(data.features),
        variance=data.targets.variance,
    )
    model = gp_from_covariance_and_mean(
        sinc_kernel(), LinearMean(slope=0.5, offset=3.0)
    )
    fit_model = model.fit(shifted)
    xs = jnp.linspace(0.0, 10.0, 5)
    pred_mean = np.asarray(fit_model.predict(xs).mean())

    base = gp_from_covariance(sinc_kernel()).fit(data)
    base_mean = np.asarray(base.predict(xs).mean())
    np.testing.assert_allclose(
        pred_mean, base_mean + 3.0 + 0.5 * np.asarray(xs), rtol=1e-7
    )


def test_prediction_order_invariance(rng):
    """Reference test_models.cc: predictions permute with the features."""
    data = make_toy_sine_data(rng)
    model = gp_from_covariance(sinc_kernel())
    fit_model = model.fit(data)
    xs = jnp.linspace(0.0, 10.0, 7)
    perm = jnp.asarray([3, 0, 6, 1, 5, 2, 4])
    m1 = np.asarray(fit_model.predict(xs).mean())
    m2 = np.asarray(fit_model.predict(xs[perm]).mean())
    np.testing.assert_allclose(m1[np.asarray(perm)], m2, rtol=1e-10)


def test_update_equals_joint_fit(rng):
    """Incremental update == fit on concatenated data (gp.hpp:384-414).

    Mirrors reference test_gp.cc:182-213: the kernel must not contain
    measurement-only terms (the update path predicts the new block with
    unwrapped features), so noise enters via plain IndependentNoise +
    target variance.
    """
    data = make_toy_sine_data(rng, n=24)
    first, second = data[jnp.arange(16)], data[jnp.arange(16, 24)]
    model = gp_from_covariance(
        SquaredExponential(length_scale=1.5, sigma=1.0)
        + IndependentNoise(0.2)
    )

    updated = model.fit(first).update(second)
    direct = model.fit(data)

    xs = jnp.linspace(0.0, 10.0, 9)
    joint_updated = updated.predict(xs).joint()
    joint_direct = direct.predict(xs).joint()
    np.testing.assert_allclose(
        np.asarray(joint_updated.mean), np.asarray(joint_direct.mean), rtol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(joint_updated.covariance),
        np.asarray(joint_direct.covariance),
        rtol=1e-5,
        atol=1e-9,
    )


def test_fit_from_prediction_round_trip(rng):
    """C = K(K−P)⁻¹K reconstruction recovers the prediction (gp.hpp:115-153)."""
    data = make_toy_sine_data(rng)
    model = gp_from_covariance(sinc_kernel())
    fit_model = model.fit(data)
    xs = jnp.linspace(1.0, 9.0, 6)
    pred = fit_model.predict(xs).joint()

    rebuilt = model.fit_from_prediction(xs, pred)
    re_pred = rebuilt.predict(xs).joint()
    np.testing.assert_allclose(
        np.asarray(re_pred.mean), np.asarray(pred.mean), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(re_pred.covariance),
        np.asarray(pred.covariance),
        rtol=1e-4,
        atol=1e-8,
    )


def test_nlml_gradient_flows(rng):
    data = make_toy_sine_data(rng)
    model = gp_from_covariance(sinc_kernel())

    def nlml(m):
        return -m.log_likelihood(data)

    grads = jax.grad(nlml)(model)
    g = grads.get_params()
    for name in ("squared_exponential_length_scale", "sigma_squared_exponential"):
        assert np.isfinite(float(g[name].value))
    # finite-difference check on the length scale
    eps = 1e-6
    up = model.set_param_value("squared_exponential_length_scale", 1.5 + eps)
    dn = model.set_param_value("squared_exponential_length_scale", 1.5 - eps)
    fd = (float(nlml(up)) - float(nlml(dn))) / (2 * eps)
    assert float(
        g["squared_exponential_length_scale"].value
    ) == pytest.approx(fd, rel=1e-4)


def test_fit_predict_jits(rng):
    data = make_toy_sine_data(rng)
    model = gp_from_covariance(sinc_kernel())
    xs = jnp.linspace(0.0, 10.0, 5)

    @jax.jit
    def fit_predict(m, dataset, query):
        fm = m.fit(dataset)
        p = fm.predict(query)
        marg = p.marginal()
        return marg.mean, marg.variance

    mean, var = fit_predict(model, data, xs)
    eager = model.fit(data).predict(xs).marginal()
    np.testing.assert_allclose(np.asarray(mean), np.asarray(eager.mean), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(var), np.asarray(eager.variance), rtol=1e-9
    )


def test_prior(rng):
    data = make_toy_sine_data(rng)
    model = gp_from_covariance(sinc_kernel())
    prior = model.prior(data.features)
    assert prior.size == data.size
    # prior covariance includes the measurement-only noise (features wrapped)
    np.testing.assert_allclose(
        np.asarray(jnp.diagonal(prior.covariance)), 1.0 + 0.04, rtol=1e-10
    )


def test_safe_factorization_handles_singular_gram(rng):
    """Duplicate features with no noise make K singular; safe factorization
    escalates jitter instead of producing NaNs (the generalized analog of
    the reference's nugget safeguards, sparse_gp.hpp:348-352)."""
    x = jnp.asarray([1.0, 1.0, 2.0, 3.0])  # exact duplicate, no noise kernel
    y = jnp.asarray([0.5, 0.5, 1.0, -0.2])
    data = RegressionDataset.create(x, y)
    kernel = SquaredExponential(length_scale=2.0, sigma=1.0)

    unsafe = gp_from_covariance(kernel)
    pred_unsafe = unsafe.fit(data).predict(jnp.asarray([1.5])).marginal()
    safe = gp_from_covariance(kernel, safe_factorization=True)
    pred_safe = safe.fit(data).predict(jnp.asarray([1.5])).marginal()
    assert np.all(np.isfinite(np.asarray(pred_safe.mean)))
    assert np.all(np.isfinite(np.asarray(pred_safe.variance)))
    # the NLML is finite too
    assert np.isfinite(float(safe.log_likelihood(data)))


def test_serving_mode_direct_inverse(rng):
    """for_serving() swaps to DirectInverse; predictions are unchanged."""
    data = make_toy_sine_data(rng)
    model = gp_from_covariance(sinc_kernel())
    fit_model = model.fit(data)
    serving = fit_model.for_serving()
    from albatross_tpu.ops.linalg import DirectInverse

    assert isinstance(serving.fit.train_covariance, DirectInverse)
    xs = jnp.linspace(0.0, 10.0, 9)
    a = fit_model.predict(xs).marginal()
    b = serving.predict(xs).marginal()
    np.testing.assert_allclose(np.asarray(b.mean), np.asarray(a.mean), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(b.variance), np.asarray(a.variance), rtol=1e-7
    )
