"""Model-generic behavioral contracts, mirroring the reference's typed
RegressionModelTester suite (tests/lib/albatross/test/test_models.h:300-315,
 test_models.cc:17-103) instantiated over every model family, plus
LinearCombination prediction tests (test_gp.cc:389-461)."""

import jax.numpy as jnp
import numpy as np
import pytest

from albatross_tpu import (
    GaussianProcess,
    IndependentNoise,
    JointDistribution,
    LinearMean,
    MarginalDistribution,
    NullModel,
    RansacConfig,
    RegressionDataset,
    SquaredExponential,
    gp_from_covariance,
    gp_from_covariance_and_mean,
    measurement_only,
    sparse_gp_from_covariance,
    UniformlySpacedInducingPoints,
)
from albatross_tpu.models import DefaultGPRansacStrategy, LinearRegression
from albatross_tpu.kernels.features import (
    difference_of,
    sum_of,
    to_linear_combination,
)


def make_linear_data(rng, n=20, slope=1.2, offset=3.0, noise=0.05):
    x = np.sort(rng.uniform(0.0, 10.0, n))
    y = offset + slope * x + noise * rng.standard_normal(n)
    return RegressionDataset.create(
        jnp.asarray(x), jnp.asarray(y), variance=jnp.full((n,), noise**2)
    )


def gp_kernel():
    return SquaredExponential(3.0, 5.0) + measurement_only(
        IndependentNoise(0.1)
    )


def _adapted_gp():
    """The reference's adapted-GP factory (test_model_adapter.cc): shift
    features by an adapter parameter before delegating to a plain GP."""
    from albatross_tpu.core.parameters import Parameter
    from albatross_tpu.models.adapter import AdaptedModel

    return AdaptedModel(
        gp_from_covariance(gp_kernel()),
        lambda adapter, feats: feats - adapter.shift.value,
        params={"shift": Parameter(0.5)},
    )


def _pitc_sparse_gp():
    """Sparse GP with a non-trivial (interval) grouper — the PITC variant."""
    import numpy as _np

    return sparse_gp_from_covariance(
        gp_kernel(),
        grouper=lambda f: _np.floor(_np.asarray(f) / 2.0).astype(_np.int64),
        inducing_point_strategy=UniformlySpacedInducingPoints(12),
    )


def _chi2_ransac():
    """MakeRansacChiSquaredGaussianProcess (test_models.h:116-139): chi²-CDF
    inlier metric, chi² consensus + candidate validity, threshold 1."""
    from albatross_tpu.models.ransac import (
        ChiSquaredConsensusMetric,
        ChiSquaredIsValidCandidateMetric,
        gp_ransac_strategy,
    )
    from albatross_tpu.evaluation.metrics import ChiSquaredCdf
    from albatross_tpu.indexing import LeaveOneOutGrouper

    strategy = gp_ransac_strategy(
        ChiSquaredCdf(),
        ChiSquaredConsensusMetric(),
        LeaveOneOutGrouper(),
        is_valid_candidate=ChiSquaredIsValidCandidateMetric(),
    )
    return gp_from_covariance(gp_kernel()).ransac(
        strategy, RansacConfig(1.0, 3, 3, 20, 20)
    )


def _generic_ransac():
    from albatross_tpu.models.ransac import DefaultRansacStrategy

    return gp_from_covariance(gp_kernel()).ransac(
        DefaultRansacStrategy(), RansacConfig(3.0, 3, 12, 6, 6)
    )


# Mirrors the reference's ExampleModels list (test_models.h:300-315): linear
# regression, GP, GP+mean, sparse GP (LOO + PITC variants), adapted GP,
# RANSAC variants, NullModel.
MODEL_FACTORIES = {
    "linear_regression": lambda: LinearRegression(),
    "gp": lambda: gp_from_covariance(gp_kernel()),
    "gp_with_mean": lambda: gp_from_covariance_and_mean(
        gp_kernel(), LinearMean(slope=1.0, offset=2.0)
    ),
    "sparse_gp": lambda: sparse_gp_from_covariance(
        gp_kernel(),
        inducing_point_strategy=UniformlySpacedInducingPoints(12),
    ),
    "sparse_gp_pitc": _pitc_sparse_gp,
    "adapted_gp": _adapted_gp,
    "gp_ransac": lambda: gp_from_covariance(gp_kernel()).ransac(
        DefaultGPRansacStrategy(), RansacConfig(3.0, 3, 12, 8, 8)
    ),
    "gp_ransac_chi2": _chi2_ransac,
    "generic_ransac": _generic_ransac,
    "null": lambda: NullModel(),
}

PREDICTIVE = [k for k in MODEL_FACTORIES if k != "null"]


def _richest(pred):
    """Mirror the reference's lazy downgrade: use the richest predict type
    the model defines (mean-only models raise on marginal/joint, matching
    albatross's compile-time behavior)."""
    try:
        return pred.marginal()
    except TypeError:
        return MarginalDistribution(pred.mean(), None)


@pytest.mark.parametrize("name", sorted(MODEL_FACTORIES))
def test_fit_and_predict_shapes(name, rng):
    data = make_linear_data(rng)
    model = MODEL_FACTORIES[name]()
    fit_model = model.fit(data)
    xs = jnp.linspace(0.5, 9.5, 7)
    marginal = _richest(fit_model.predict(xs))
    assert marginal.mean.shape == (7,)
    assert marginal.get_variance().shape == (7,)
    assert np.all(np.isfinite(np.asarray(marginal.mean)))
    assert np.all(np.asarray(marginal.get_variance()) >= 0)


@pytest.mark.parametrize("name", sorted(PREDICTIVE))
def test_fits_linear_data_sensibly(name, rng):
    """test_models.cc: every real model should track a clean linear trend."""
    data = make_linear_data(rng)
    model = MODEL_FACTORIES[name]()
    fit_model = model.fit(data)
    xs = jnp.linspace(1.0, 9.0, 9)
    pred = np.asarray(fit_model.predict(xs).mean())
    truth = 3.0 + 1.2 * np.asarray(xs)
    assert np.sqrt(np.mean((pred - truth) ** 2)) < 0.5, name


@pytest.mark.parametrize("name", sorted(MODEL_FACTORIES))
def test_prediction_order_invariance(name, rng):
    data = make_linear_data(rng)
    model = MODEL_FACTORIES[name]()
    fit_model = model.fit(data)
    xs = jnp.linspace(0.5, 9.5, 6)
    perm = jnp.asarray([4, 0, 3, 1, 5, 2])
    a = np.asarray(_richest(fit_model.predict(xs)).mean)
    b = np.asarray(_richest(fit_model.predict(xs[perm])).mean)
    np.testing.assert_allclose(a[np.asarray(perm)], b, rtol=1e-8)


@pytest.mark.parametrize("name", sorted(MODEL_FACTORIES))
def test_predict_variant_consistency(name, rng):
    """joint ⊇ marginal ⊇ mean must agree (test_models.cc variant
    consistency)."""
    data = make_linear_data(rng)
    model = MODEL_FACTORIES[name]()
    fit_model = model.fit(data)
    xs = jnp.linspace(0.5, 9.5, 5)
    pred = fit_model.predict(xs)
    mean = np.asarray(pred.mean())
    try:
        marginal = pred.marginal()
    except TypeError:
        # mean-only model (LeastSquares family): nothing more to check
        return
    try:
        joint = pred.joint()
    except TypeError:
        joint = None
    np.testing.assert_allclose(np.asarray(marginal.mean), mean, rtol=1e-8)
    if joint is not None:
        np.testing.assert_allclose(np.asarray(joint.mean), mean, rtol=1e-8)
        np.testing.assert_allclose(
            np.asarray(joint.marginal().variance),
            np.asarray(marginal.get_variance()),
            rtol=1e-6,
            atol=1e-10,
        )


# ---------------------------------------------------------------------------
# LinearCombination predictions (test_gp.cc:389-461)
# ---------------------------------------------------------------------------
def test_predict_sum_of_features(rng):
    data = make_linear_data(rng)
    model = gp_from_covariance(gp_kernel())
    fit_model = model.fit(data)

    pair = jnp.asarray([2.0, 7.0])
    individual = fit_model.predict(pair).joint()
    combo = fit_model.predict(sum_of(pair)).joint()

    expected_mean = float(jnp.sum(individual.mean))
    expected_var = float(jnp.sum(individual.covariance))
    assert float(combo.mean[0]) == pytest.approx(expected_mean, rel=1e-8)
    assert float(combo.covariance[0, 0]) == pytest.approx(
        expected_var, rel=1e-6
    )


def test_predict_difference_of_identical_is_zero(rng):
    """difference of a feature with itself: zero mean, zero variance
    (test_gp.cc:440-461)."""
    data = make_linear_data(rng)
    model = gp_from_covariance(gp_kernel())
    fit_model = model.fit(data)

    x = jnp.asarray([4.0, 6.0])
    diff = difference_of(x, x)
    pred = fit_model.predict(diff).joint()
    np.testing.assert_allclose(np.asarray(pred.mean), 0.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(pred.covariance), 0.0, atol=1e-6)


def test_linear_combination_custom_coefficients(rng):
    data = make_linear_data(rng)
    model = gp_from_covariance(gp_kernel())
    fit_model = model.fit(data)

    points = jnp.asarray([2.0, 5.0, 8.0])
    coefs = jnp.asarray([0.5, -1.0, 2.0])
    combo = to_linear_combination(points, coefs)
    pred = fit_model.predict(combo).marginal()

    individual = fit_model.predict(points).joint()
    expected_mean = float(coefs @ individual.mean)
    expected_var = float(coefs @ individual.covariance @ coefs)
    assert float(pred.mean[0]) == pytest.approx(expected_mean, rel=1e-8)
    assert float(pred.variance[0]) == pytest.approx(expected_var, rel=1e-5)


@pytest.mark.parametrize(
    "name", sorted(k for k in PREDICTIVE if "ransac" not in k)
)
def test_params_roundtrip_preserves_predictions(name, rng):
    """get_params -> set_params must be an identity on model behavior
    (parameter_handling_mixin.hpp round-trip semantics)."""
    data = make_linear_data(rng)
    model = MODEL_FACTORIES[name]()
    roundtripped = model.set_params(model.get_params())
    xs = jnp.linspace(0.5, 9.5, 5)
    a = np.asarray(_richest(model.fit(data).predict(xs)).mean)
    b = np.asarray(_richest(roundtripped.fit(data).predict(xs)).mean)
    np.testing.assert_allclose(a, b, rtol=1e-12)


@pytest.mark.parametrize("name", sorted(PREDICTIVE))
def test_predict_at_train_recovers_targets(name, rng):
    """Predicting the training features recovers the targets within a few
    noise sigmas (the behavioral floor every reference family satisfies)."""
    data = make_linear_data(rng)
    model = MODEL_FACTORIES[name]()
    pred = np.asarray(model.fit(data).predict(data.features).mean())
    resid = pred - np.asarray(data.targets.mean)
    assert np.max(np.abs(resid)) < 0.5, name
