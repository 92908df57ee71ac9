"""Reference-output parity, round 3: transcriptions of three more suites.

Same protocol as tests/test_reference_parity.py — reference data generators
reproduced bit-identically via the libstdc++ mt19937 twin, same model
configurations, same assertions and tolerances — extending coverage to:

* test_scaling_function.cc:57-209  (obliquity attenuation: CV predicts,
  latent-constant inference via the state-space marker, product-with-
  undefined-side operations)
* test_ransac.cc:21-192            (direct consensus/outliers, ransac model
  == direct consensus fit + CV-NLL split, grouped ransac, edge-case return
  codes)
* test_gp.cc:161-530               (update == full refit on the unobservable
  model, cross-type update with variant inducing features, rebase via
  fit_from_prediction at low rank, mean-function rebase regression test,
  nonzero-mean predictions, prior, linear-combination sum/diff constraints)
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from albatross_tpu import (
    Constant,
    ConstantTerm,
    IndependentNoise,
    RegressionDataset,
    SquaredExponential,
    TaggedBatch,
    gp_from_covariance,
    gp_from_covariance_and_mean,
    measurement_only,
)
from albatross_tpu.core.distributions import (
    JointDistribution,
    MarginalDistribution,
)
from albatross_tpu.evaluation.metrics import (
    NegativeLogLikelihood,
    RootMeanSquareError,
)
from albatross_tpu.evaluation.model_metrics import LeaveOneOutLikelihood
from albatross_tpu.indexing import LeaveOneOutGrouper, group_by
from albatross_tpu.kernels import ScalingFunction, ScalingTerm
from albatross_tpu.kernels.base import CovarianceFunction
from albatross_tpu.models.ransac import (
    GenericRansacStrategy,
    RansacConfig,
    RansacReturnCode,
    ransac,
    ransac_success,
)

from reference_rng import LibstdcppMt19937Normal, make_toy_linear_data


# ---------------------------------------------------------------------------
# test_scaling_function.cc
# ---------------------------------------------------------------------------
def obliquity_function(x):
    """test_scaling_function.cc:57."""
    return 1.0 / jnp.cos(jnp.arctan(x - 1.0))


class ObliquityScaling(ScalingFunction):
    """test_scaling_function.cc:59-66; undefined for the constant's
    state-space marker (the reference's _call_impl takes doubles only)."""

    @property
    def name(self):
        return "obliquity_scaling"

    def _scale(self, X):
        if isinstance(X, ConstantTerm):
            return None
        return obliquity_function(jnp.asarray(X))


def make_attenuation_data(attenuation=3.14159, sigma_noise=0.01):
    """test_scaling_function.cc:68-87 with the bit-identical seed-3 noise
    stream (std::normal_distribution<>{0., 0.01} after gen.seed(3))."""
    d = LibstdcppMt19937Normal(3, 0.0, sigma_noise)
    n = 10
    x = np.array([i * (2.0 / n) for i in range(n)])
    y = np.asarray(obliquity_function(jnp.asarray(x))) * attenuation + d.draws(n)
    return RegressionDataset.create(jnp.asarray(x), jnp.asarray(y))


def scaling_covariance(constant_sigma, noise_sigma):
    """constant * scaling + noise (test_scaling_function.cc:107)."""
    return Constant(constant_sigma) * ScalingTerm(
        ObliquityScaling()
    ) + IndependentNoise(noise_sigma)


def test_scaling_predicts():
    """test_scaling_function.cc:93-115: LOO CV RMSE mean <= 0.01."""
    model = gp_from_covariance(scaling_covariance(10.0, 0.01))
    dataset = make_attenuation_data()
    scores = model.cross_validate().scores(
        RootMeanSquareError(), dataset, LeaveOneOutGrouper()
    )
    assert float(jnp.mean(jnp.asarray(scores))) <= 0.01


def test_scaling_inference():
    """test_scaling_function.cc:122-149: predicting at the constant's
    state-space representation recovers the attenuation despite only
    scaled observations."""
    attenuation, sigma = 3.14159, 0.01
    model = gp_from_covariance(
        scaling_covariance(2.0 * attenuation, sigma)
    )
    dataset = make_attenuation_data(attenuation, sigma)
    state_estimate = model.fit(dataset).predict(ConstantTerm()).mean()
    assert abs(float(state_estimate[0]) - attenuation) <= 1e-2


class _ZeroCovariance(CovarianceFunction):
    """test_scaling_function.cc:151-158."""

    @property
    def name(self):
        return "zero"

    def _matrix(self, X, Y, x_meas, y_meas):
        import jax

        n = jax.tree_util.tree_leaves(X)[0].shape[0]
        m = jax.tree_util.tree_leaves(Y)[0].shape[0]
        return jnp.zeros((n, m))


def test_scaling_operations():
    """test_scaling_function.cc:165-208: noise*scaling in both orders —
    zero off-diagonal (a != b), positive at (a, a).  The reference's
    struct-X/Y SFINAE cases test C++ template dispatch; the batch-level
    analog of 'undefined type' is ConstantTerm (scale undefined) where the
    product's defined side acts alone."""
    sigma = 0.01
    scaling = ScalingTerm(ObliquityScaling())
    noise = IndependentNoise(sigma)
    zero = _ZeroCovariance()
    a = jnp.asarray([0.0])
    b = jnp.asarray([1.0])

    for cov in (noise * scaling + zero, scaling * noise + zero):
        assert float(cov.matrix_or_none(a, b)[0, 0]) == 0.0
        assert float(cov.matrix_or_none(a, a)[0, 0]) > 0.0


# ---------------------------------------------------------------------------
# test_ransac.cc — MakeGaussianProcess on the seed-3 linear data
# ---------------------------------------------------------------------------
def make_simple_covariance_function():
    return SquaredExponential(100.0, 100.0) + measurement_only(
        IndependentNoise(0.1)
    )


def _gp_case_dataset(bad_inds=()):
    x, y = make_toy_linear_data()
    y = np.asarray(y).copy()
    for i in bad_inds:
        # test_ransac.cc:26-29: pow(-1, i) * 400
        y[i] = ((-1.0) ** i) * 400.0
    return RegressionDataset.create(jnp.asarray(x), jnp.asarray(y))


def _loo_strategy():
    return GenericRansacStrategy(
        NegativeLogLikelihood(JointDistribution),
        LeaveOneOutLikelihood(JointDistribution),
        LeaveOneOutGrouper(),
    )


def test_ransac_direct():
    """test_ransac.cc:21-57."""
    bad_inds = [3, 5]
    dataset = _gp_case_dataset(bad_inds)
    model = gp_from_covariance(make_simple_covariance_function())
    strategy = _loo_strategy()
    indexer = strategy.get_indexer(dataset)
    functions = strategy(model, dataset)
    config = RansacConfig(
        inlier_threshold=1.0,
        random_sample_size=3,
        min_consensus_size=3,
        max_iterations=20,
    )
    result = ransac(functions, list(indexer.keys()), config)
    consensus = result.best.consensus()
    assert len(consensus) == dataset.size - len(bad_inds)
    assert ransac_success(result.return_code)
    assert not math.isnan(result.best.consensus_metric_value)
    for i in bad_inds:
        assert i not in consensus
        assert i in result.best.outliers


def test_ransac_model():
    """test_ransac.cc:59-109: the ransac model's fit equals a direct fit on
    the consensus subset, and cross-validated NLL separates outliers
    (>= 1e4) from inliers (<= 1)."""
    bad_inds = [3, 5]
    dataset = _gp_case_dataset(bad_inds)
    model = gp_from_covariance(make_simple_covariance_function())
    strategy = _loo_strategy()
    config = RansacConfig(
        inlier_threshold=1.0,
        random_sample_size=3,
        min_consensus_size=3,
        max_iterations=20,
    )
    ransac_model = model.ransac(strategy, config)
    fit_model = ransac_model.fit(dataset)
    pred = fit_model.predict(dataset.features).mean()

    indexer = strategy.get_indexer(dataset)
    functions = strategy(model, dataset)
    result = ransac(functions, list(indexer.keys()), config)
    from albatross_tpu.indexing.grouping import indices_from_groups

    consensus_inds = indices_from_groups(indexer, result.best.consensus())
    direct_pred = (
        model.fit(dataset.subset(consensus_inds))
        .predict(dataset.features)
        .mean()
    )
    np.testing.assert_allclose(
        np.asarray(pred), np.asarray(direct_pred), rtol=1e-12
    )

    nll = NegativeLogLikelihood(JointDistribution)
    cv_nll = np.asarray(
        ransac_model.cross_validate().scores(nll, dataset, indexer)
    )
    good_inds = [i for i in range(dataset.size) if i not in bad_inds]
    assert cv_nll[bad_inds].min() >= 1e4
    assert cv_nll[good_inds].max() <= 1.0


def _group_by_modulo(features):
    """test_ransac.cc:113-116: str(int(x) % 4) — keys not sorted in
    feature order."""
    return np.asarray([str(int(v) % 4) for v in np.asarray(features)])


def test_ransac_groups():
    """test_ransac.cc:118-136."""
    dataset = _gp_case_dataset()
    y = np.asarray(dataset.targets.mean).copy()
    y[5] = -300.0
    dataset = RegressionDataset.create(dataset.features, jnp.asarray(y))
    model = gp_from_covariance(make_simple_covariance_function())
    strategy = GenericRansacStrategy(
        NegativeLogLikelihood(JointDistribution),
        LeaveOneOutLikelihood(JointDistribution),
        _group_by_modulo,
    )
    indexer = strategy.get_indexer(dataset)
    functions = strategy(model, dataset)
    config = RansacConfig(
        inlier_threshold=0.0,
        random_sample_size=1,
        min_consensus_size=1,
        max_iterations=20,
    )
    result = ransac(functions, list(indexer.keys()), config)
    assert ransac_success(result.return_code)
    assert len(result.best.consensus()) <= len(indexer)


def _reasonable_config():
    """test_ransac.cc:142-150."""
    return dict(
        inlier_threshold=1.0,
        max_failed_candidates=0,
        max_iterations=20,
        min_consensus_size=2,
        random_sample_size=1,
    )


def test_ransac_edge_cases():
    """test_ransac.cc:152-192: return codes for degenerate configs."""
    dataset = _gp_case_dataset()
    model = gp_from_covariance(make_simple_covariance_function())
    strategy = GenericRansacStrategy(
        NegativeLogLikelihood(JointDistribution),
        LeaveOneOutLikelihood(JointDistribution),
        _group_by_modulo,
    )
    indexer = strategy.get_indexer(dataset)
    functions = strategy(model, dataset)
    groups = list(indexer.keys())

    bad_inlier = RansacConfig(**{**_reasonable_config(), "inlier_threshold": -np.inf})
    assert (
        ransac(functions, groups, bad_inlier).return_code
        == RansacReturnCode.NO_CONSENSUS
    )

    bad_consensus = RansacConfig(
        **{**_reasonable_config(), "min_consensus_size": len(groups)}
    )
    assert (
        ransac(functions, groups, bad_consensus).return_code
        == RansacReturnCode.INVALID_ARGUMENTS
    )

    bad_sample = RansacConfig(
        **{**_reasonable_config(), "random_sample_size": len(groups)}
    )
    assert (
        ransac(functions, groups, bad_sample).return_code
        == RansacReturnCode.INVALID_ARGUMENTS
    )

    bad_iters = RansacConfig(**{**_reasonable_config(), "max_iterations": 0})
    assert (
        ransac(functions, groups, bad_iters).return_code
        == RansacReturnCode.INVALID_ARGUMENTS
    )

    functions.is_valid_candidate = lambda candidates: False
    never_valid = RansacConfig(
        **{**_reasonable_config(), "max_failed_candidates": 3}
    )
    assert (
        ransac(functions, groups, never_valid).return_code
        == RansacReturnCode.EXCEEDED_MAX_FAILED_CANDIDATES
    )


# ---------------------------------------------------------------------------
# test_gp.cc — the unobservable model (ConstantEverywhere + PerInterval)
# ---------------------------------------------------------------------------
TAG_EVERYWHERE, TAG_INTERVAL, TAG_DOUBLE = 0, 1, 2


def _lround(x):
    """std::lround: round half away from zero (numpy rounds half-even)."""
    x = jnp.asarray(x)
    return jnp.where(x >= 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5))


class ConstantEverywhereKernel(CovarianceFunction):
    """test_gp.cc:68-95: variance for any (double|everywhere) pair,
    undefined for per-interval features."""

    variance = 10.0

    @property
    def name(self):
        return "constant_everywhere"

    def _matrix(self, X, Y, x_meas, y_meas):
        import jax

        n = jax.tree_util.tree_leaves(X)[0].shape[0]
        m = jax.tree_util.tree_leaves(Y)[0].shape[0]
        return jnp.full((n, m), self.variance)

    def _tagged_matrix(self, X, Y, tx, ty, x_meas, y_meas):
        if tx == TAG_INTERVAL or ty == TAG_INTERVAL:
            return None
        return self._matrix(X, Y, x_meas, y_meas)

    def _tagged_diag(self, X, tx, x_meas):
        if tx == TAG_INTERVAL:
            return None
        return self._diag(X, x_meas)


class ConstantPerIntervalKernel(CovarianceFunction):
    """test_gp.cc:97-133: variance iff the (rounded) interval locations
    agree; undefined for the everywhere feature."""

    variance = 5.0

    @property
    def name(self):
        return "constant_per_interval"

    def _loc(self, X, tag):
        x = jnp.asarray(X)
        return x if tag == TAG_INTERVAL else _lround(x)

    def _matrix(self, X, Y, x_meas, y_meas):
        lx, ly = self._loc(X, None), self._loc(Y, None)
        return self.variance * (lx[:, None] == ly[None, :]).astype(float)

    def _tagged_matrix(self, X, Y, tx, ty, x_meas, y_meas):
        if tx == TAG_EVERYWHERE or ty == TAG_EVERYWHERE:
            return None
        lx, ly = self._loc(X, tx), self._loc(Y, ty)
        return self.variance * (lx[:, None] == ly[None, :]).astype(float)

    def _tagged_diag(self, X, tx, x_meas):
        if tx == TAG_EVERYWHERE:
            return None
        return self._diag(X, x_meas)


def make_unobservable_dataset():
    """test_gp.cc:135-149 (not a test — generator): 10 features at 0.3 spacing, targets pi,
    variance 0.1."""
    k = 10
    x = jnp.asarray([i * 0.3 for i in range(k)])
    return RegressionDataset.create(
        x, jnp.full((k,), 3.14159), variance=jnp.full((k,), 0.1)
    )


def unobservable_model():
    return gp_from_covariance(
        ConstantEverywhereKernel() + ConstantPerIntervalKernel(),
        "unobservable",
    )


def create_inducing_points(features):
    """test_gp.cc:50-66: one everywhere feature + one per integer interval
    — a variant batch, here a TaggedBatch."""
    x = np.asarray(features)
    lo = int(np.floor(x.min() + 0.5))
    hi = int(np.floor(x.max() + 0.5))
    intervals = jnp.asarray(np.arange(lo, hi + 1, dtype=float))
    tag_array = np.asarray(
        [TAG_EVERYWHERE] + [TAG_INTERVAL] * intervals.shape[0]
    )
    return TaggedBatch.create(
        tag_array,
        {TAG_EVERYWHERE: jnp.zeros((1,)), TAG_INTERVAL: intervals},
    )


def test_gp_update_model_same_types():
    """test_gp.cc:182-219: partial fit + update == full fit (1e-6), and
    partial alone differs."""
    dataset = make_unobservable_dataset()
    train_inds = jnp.asarray([0, 1, 3, 4, 6, 7, 8, 9])
    test_inds = jnp.asarray([2, 5])
    train, test = dataset[train_inds], dataset[test_inds]
    first = train[jnp.asarray([0, 1, 2, 3, 5, 7])]
    second = train[jnp.asarray([4, 6])]

    model = unobservable_model()
    full_pred = model.fit(train).predict(test.features).joint()
    first_model = model.fit(first)
    split_model = first_model.update(second)
    split_pred = split_model.predict(test.features).joint()

    np.testing.assert_allclose(
        np.asarray(split_pred.mean), np.asarray(full_pred.mean), rtol=1e-9
    )
    assert (
        np.linalg.norm(
            np.asarray(split_pred.covariance) - np.asarray(full_pred.covariance)
        )
        <= 1e-6
    )
    first_pred = first_model.predict(test.features).joint()
    assert not np.allclose(
        np.asarray(split_pred.mean), np.asarray(first_pred.mean)
    )
    assert (
        np.linalg.norm(
            np.asarray(split_pred.covariance) - np.asarray(first_pred.covariance)
        )
        >= 1e-6
    )


def test_gp_update_model_different_types():
    """test_gp.cc:221-264: update a double-feature fit with a variant
    (inducing-feature) dataset — constraining the inducing predictions
    reproduces them; perturbing the constraint moves everything."""
    dataset = make_unobservable_dataset()
    model = unobservable_model()
    # train features as a single-tag TaggedBatch so the update can
    # concatenate with the variant inducing batch (concatenate.hpp analog)
    tagged_features = TaggedBatch.create(
        np.full(dataset.size, TAG_DOUBLE), {TAG_DOUBLE: dataset.features}
    )
    tagged_dataset = RegressionDataset(tagged_features, dataset.targets, {})
    fit_model = model.fit(tagged_dataset)

    inducing_points = create_inducing_points(dataset.features)
    ind_pred = fit_model.predict(inducing_points).marginal()
    inducing_dataset = RegressionDataset(
        inducing_points,
        MarginalDistribution(
            ind_pred.mean, jnp.full((ind_pred.mean.shape[0],), 1e-4)
        ),
        {},
    )
    new_fit_model = fit_model.update(inducing_dataset)

    new_pred = new_fit_model.predict(inducing_points).joint()
    assert (
        np.linalg.norm(np.asarray(new_pred.mean) - np.asarray(ind_pred.mean))
        <= 0.01
    )
    train_pred = new_fit_model.predict(tagged_features).marginal()
    assert (
        np.linalg.norm(
            np.asarray(train_pred.mean) - np.asarray(dataset.targets.mean)
        )
        <= 0.1
    )

    perturbed_dataset = RegressionDataset(
        inducing_points,
        MarginalDistribution(
            ind_pred.mean + 1.0, jnp.full((ind_pred.mean.shape[0],), 1e-4)
        ),
        {},
    )
    perturbed_model = fit_model.update(perturbed_dataset)
    pert_ind = perturbed_model.predict(inducing_points).marginal()
    pert_train = perturbed_model.predict(tagged_features).marginal()
    assert (
        np.linalg.norm(np.asarray(pert_ind.mean) - np.asarray(new_pred.mean))
        >= 0.5
    )
    assert (
        np.linalg.norm(np.asarray(pert_train.mean) - np.asarray(train_pred.mean))
        >= 0.5
    )


def test_gp_model_from_prediction_low_rank():
    """test_gp.cc:308-342: rebasing onto the (low-rank) inducing joint
    prediction reproduces far-field predictions."""
    dataset = make_unobservable_dataset()
    model = unobservable_model()
    fit_model = model.fit(dataset)
    inducing_points = create_inducing_points(dataset.features)
    joint_prediction = fit_model.predict(inducing_points).joint()

    perturbed = jnp.asarray([50.01, 51.01, 52.01])
    model_pred = fit_model.predict(perturbed).joint()
    from_prediction = model.fit_from_prediction(
        inducing_points, joint_prediction
    )
    again = from_prediction.predict(perturbed).joint()
    np.testing.assert_allclose(
        np.asarray(again.mean), np.asarray(model_pred.mean), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(again.covariance),
        np.asarray(model_pred.covariance),
        rtol=1e-4,
        atol=1e-8,
    )


def test_gp_model_from_prediction_with_mean():
    """test_gp.cc:344-371: fit_from_prediction must not double count the
    mean function."""
    from albatross_tpu.kernels.means import LinearMean

    a, b = 5.0, 1.0
    x, y = make_toy_linear_data(a, b)
    dataset = RegressionDataset.create(jnp.asarray(x), jnp.asarray(y))
    covariance = SquaredExponential(2.0, 1.0) + measurement_only(
        IndependentNoise(0.1)
    )
    model = gp_from_covariance_and_mean(
        covariance, LinearMean(slope=b, offset=a)
    )
    fit_model = model.fit(dataset)
    features = jnp.asarray([1.3, 4.2, 7.1])
    pred = fit_model.predict(features).joint()
    again = model.fit_from_prediction(features, pred).predict(features).joint()
    assert (
        np.linalg.norm(np.asarray(again.mean) - np.asarray(pred.mean)) <= 1e-6
    )
    assert (
        np.linalg.norm(
            np.asarray(again.covariance) - np.asarray(pred.covariance)
        )
        <= 1e-6
    )


def test_gp_nonzero_mean():
    """test_gp.cc:464-490: predictions assembled without the mean function
    differ substantially from the model's."""
    from albatross_tpu.kernels import as_measurement
    from albatross_tpu.kernels.means import LinearMean
    from albatross_tpu.models.gp import gp_joint_prediction
    from albatross_tpu.ops.linalg import CholeskyFactor

    a, b = 5.0, 1.0
    x, y = make_toy_linear_data(a, b)
    dataset = RegressionDataset.create(jnp.asarray(x), jnp.asarray(y))
    covariance = SquaredExponential(100.0, 100.0) + measurement_only(
        IndependentNoise(0.1)
    )
    model = gp_from_covariance_and_mean(
        covariance, LinearMean(slope=b, offset=a)
    )
    fit_model = model.fit(dataset)

    train_cov = covariance(as_measurement(dataset.features))
    chol = CholeskyFactor.factorize(train_cov)
    information = chol.solve(dataset.targets.mean)
    pred_features = jnp.asarray([-20.0, 0.01])
    cross = covariance.matrix_or_none(dataset.features, pred_features)
    prior = covariance(pred_features)
    without_mean = gp_joint_prediction(cross, prior, information, chol)
    actual = fit_model.predict(pred_features).joint()
    assert (
        np.linalg.norm(np.asarray(without_mean.mean) - np.asarray(actual.mean))
        > 1.0
    )


def test_gp_get_prior():
    """test_gp.cc:492-506."""
    from albatross_tpu.kernels import as_measurement
    from albatross_tpu.kernels.means import LinearMean

    a, b = 5.0, 1.0
    x, y = make_toy_linear_data(a, b)
    dataset = RegressionDataset.create(jnp.asarray(x), jnp.asarray(y))
    covariance = SquaredExponential(100.0, 100.0) + measurement_only(
        IndependentNoise(0.1)
    )
    mean = LinearMean(slope=b, offset=a)
    model = gp_from_covariance_and_mean(covariance, mean)
    prior = model.prior(dataset.features)
    np.testing.assert_array_equal(
        np.asarray(prior.covariance),
        np.asarray(covariance(as_measurement(dataset.features))),
    )
    np.testing.assert_array_equal(
        np.asarray(prior.mean),
        np.asarray(mean(as_measurement(dataset.features))),
    )


def _linear_combination_constraint_case(coefficients):
    """Shared body of test_gp.cc:392-462: constrain a linear combination of
    the per-interval inducing features to zero and check the posterior
    honors it.

    The reference concatenates vector<double> with
    vector<LinearCombination<ConstantPerIntervalFeature>> into a variant
    dataset; the batch-level analog here encodes each feature as a
    structured {value, kind} row (kind 0 = double, 1 = interval feature —
    undefined kind pairs contribute ZERO blocks, exactly the reference's
    VariantForwarder semantics) and builds ONE LinearCombinationBatch whose
    first rows are trivial singleton combinations of the measurements and
    whose last row is the constraint combination of interval features."""
    from albatross_tpu.kernels import LinearCombinationBatch

    KIND_DOUBLE, KIND_INTERVAL = 0.0, 1.0

    class EverywhereKinded(CovarianceFunction):
        variance = 10.0

        @property
        def name(self):
            return "everywhere_kinded"

        def _matrix(self, X, Y, x_meas, y_meas):
            ok = (X["kind"][:, None] != KIND_INTERVAL) & (
                Y["kind"][None, :] != KIND_INTERVAL
            )
            return self.variance * ok.astype(float)

    class PerIntervalKinded(CovarianceFunction):
        variance = 5.0

        @property
        def name(self):
            return "per_interval_kinded"

        def _loc(self, F):
            return jnp.where(
                F["kind"] == KIND_INTERVAL, F["value"], _lround(F["value"])
            )

        def _matrix(self, X, Y, x_meas, y_meas):
            eq = self._loc(X)[:, None] == self._loc(Y)[None, :]
            return self.variance * eq.astype(float)

    model = gp_from_covariance(
        EverywhereKinded() + PerIntervalKinded(), "unobservable_kinded"
    )
    dataset = make_unobservable_dataset()
    inducing = create_inducing_points(dataset.features)
    intervals = inducing.features[list(inducing.tags).index(TAG_INTERVAL)]
    sub_vals = (
        intervals
        if not coefficients.ndim
        else intervals[: coefficients.shape[0]]
    )
    coefs = (
        coefficients if coefficients.ndim else jnp.ones((intervals.shape[0],))
    )
    k = int(coefs.shape[0])
    n = dataset.size
    K = max(k, 2)
    x = jnp.asarray(dataset.features)
    sub = {
        "value": sub_vals,
        "kind": jnp.full((sub_vals.shape[0],), KIND_INTERVAL),
    }
    # rows 0..n-1: the plain measurements as singleton combinations (pad
    # values with x_0 at coefficient 0, which contributes exactly nothing)
    pad_plain = jnp.broadcast_to(x[:1, None], (n, K - 1))
    plain_values = {
        "value": jnp.concatenate([x[:, None], pad_plain], axis=1),
        "kind": jnp.full((n, K), KIND_DOUBLE),
    }
    plain_coefs = jnp.concatenate(
        [jnp.ones((n, 1)), jnp.zeros((n, K - 1))], axis=1
    )
    combo_values = {
        "value": jnp.concatenate(
            [sub_vals, jnp.broadcast_to(x[:1], (K - k,))]
        )[None, :],
        "kind": jnp.concatenate(
            [
                jnp.full((k,), KIND_INTERVAL),
                jnp.full((K - k,), KIND_DOUBLE),
            ]
        )[None, :],
    }
    combo_coefs = jnp.concatenate([coefs, jnp.zeros((K - k,))])[None, :]
    combined = LinearCombinationBatch(
        values={
            key: jnp.concatenate([plain_values[key], combo_values[key]], axis=0)
            for key in plain_values
        },
        coefficients=jnp.concatenate([plain_coefs, combo_coefs], axis=0),
    )
    both = RegressionDataset(
        combined,
        MarginalDistribution(
            jnp.concatenate([dataset.targets.mean, jnp.zeros((1,))]),
            jnp.concatenate([dataset.targets.variance, jnp.full((1,), 1e-5)]),
        ),
        {},
    )
    fit_model = model.fit(both)
    pred = fit_model.predict(sub).joint()
    v = np.asarray(coefs, dtype=float)
    mean = np.asarray(pred.mean)
    cov = np.asarray(pred.covariance)
    assert abs(v @ mean) <= 1e-6
    assert abs(v @ cov @ v) <= 1e-5


def test_gp_unobservable_sum_constraint():
    """test_gp.cc:392-423."""
    _linear_combination_constraint_case(jnp.zeros(()))


def test_gp_unobservable_diff_constraint():
    """test_gp.cc:425-462."""
    _linear_combination_constraint_case(jnp.asarray([1.0, -1.0]))


# ---------------------------------------------------------------------------
# test_call_trace.cc — sum/product dispatch over partially-defined kernels
# ---------------------------------------------------------------------------
import dataclasses

import jax


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class XFeat:
    """test_call_trace.cc:19 struct X — a 1-row batch of the X kind."""

    dummy: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((1,))
    )

    def tree_flatten(self):
        return (self.dummy,), None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(children[0])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class YFeat:
    """test_call_trace.cc:20 struct Y."""

    dummy: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((1,))
    )

    def tree_flatten(self):
        return (self.dummy,), None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(children[0])


class _ConstFor(CovarianceFunction):
    """Kernel defined only for specific (kind, kind) pairs, returning a
    constant per pair — the batch analog of the reference's per-type
    _call_impl overload sets (test_call_trace.cc:22-42)."""

    def __init__(self, name, table):
        self._name = name
        self.table = table  # {(kx, ky): value}

    @property
    def name(self):
        return self._name

    @staticmethod
    def _kind(F):
        return "x" if isinstance(F, XFeat) else (
            "y" if isinstance(F, YFeat) else None
        )

    def _matrix(self, X, Y, x_meas, y_meas):
        kx, ky = self._kind(X), self._kind(Y)
        if kx is None or ky is None:
            return None
        v = self.table.get((kx, ky))
        if v is None:
            # symmetric dispatch: the reference's caller tries (y, x)
            v = self.table.get((ky, kx))
            if v is None:
                return None
        return jnp.full((1, 1), float(v))


def _defined_for_x():
    return _ConstFor("defined_for_x", {("x", "x"): 1.0})


def _defined_for_y():
    return _ConstFor("defined_for_y", {("y", "y"): 3.0})


def _defined_for_xy():
    return _ConstFor(
        "defined_for_xy", {("x", "x"): 5.0, ("x", "y"): 7.0, ("y", "y"): 9.0}
    )


def _node_count(node):
    return 1 + sum(_node_count(c) for c in node.children)


def _pair_value(cov, a, b):
    out = cov.matrix_or_none(a, b)
    return None if out is None else float(out[0, 0])


def test_call_trace_sum_and_product_dispatch():
    """test_call_trace.cc:53-133 + 151-169: expected values of every
    partially-defined composition AND the call-trace node counts."""
    x, y = XFeat(), YFeat()

    # SumXandXY (3 calls): undef sides drop out of sums
    cov = _defined_for_x() + _defined_for_xy()
    assert _pair_value(cov, x, x) == 6.0
    assert _pair_value(cov, x, y) == 7.0
    assert _pair_value(cov, y, x) == 7.0
    assert _pair_value(cov, y, y) == 9.0
    for a, b in ((x, x), (x, y), (y, y)):
        assert _node_count(cov.call_trace(a, b)) == 3

    # SumXandY (3 calls)
    cov = _defined_for_x() + _defined_for_y()
    assert _pair_value(cov, x, x) == 1.0
    assert _pair_value(cov, y, y) == 3.0
    for a, b in ((x, x), (x, y), (y, y)):
        assert _node_count(cov.call_trace(a, b)) == 3

    # SumSumXandYandXY (5 calls)
    cov = (_defined_for_x() + _defined_for_y()) + _defined_for_xy()
    assert _pair_value(cov, x, x) == 6.0
    assert _pair_value(cov, y, x) == 7.0
    assert _pair_value(cov, x, y) == 7.0
    assert _pair_value(cov, y, y) == 12.0
    for a, b in ((x, x), (x, y), (y, y)):
        assert _node_count(cov.call_trace(a, b)) == 5

    # ProdXandXY (3 calls): undef sides drop out of products too
    cov = _defined_for_x() * _defined_for_xy()
    assert _pair_value(cov, x, x) == 5.0
    assert _pair_value(cov, y, x) == 7.0
    assert _pair_value(cov, x, y) == 7.0
    assert _pair_value(cov, y, y) == 9.0
    for a, b in ((x, x), (x, y), (y, y)):
        assert _node_count(cov.call_trace(a, b)) == 3

    # ProdSumXandXYProdXandXY (7 calls)
    cov = (_defined_for_x() + _defined_for_xy()) * (
        _defined_for_x() * _defined_for_xy()
    )
    assert _pair_value(cov, x, x) == 30.0
    assert _pair_value(cov, y, x) == 49.0
    assert _pair_value(cov, x, y) == 49.0
    assert _pair_value(cov, y, y) == 81.0
    for a, b in ((x, x), (x, y), (y, y)):
        assert _node_count(cov.call_trace(a, b)) == 7


# ---------------------------------------------------------------------------
# test_linear_combination.cc — combination constructors
# ---------------------------------------------------------------------------
def test_linear_combination_constructors():
    """test_linear_combination.cc:17-103 (the int/double 'variant' versions
    collapse to dtype promotion in array-land): sum, difference, mean, and
    idempotent to_linear_combination."""
    from albatross_tpu.kernels import (
        difference_of,
        mean_of,
        sum_of,
        to_linear_combination,
    )

    combo = sum_of(jnp.asarray([1.0, 2.0]))
    np.testing.assert_array_equal(np.asarray(combo.values[0]), [1.0, 2.0])
    np.testing.assert_array_equal(np.asarray(combo.coefficients[0]), [1.0, 1.0])

    diff = difference_of(jnp.asarray([1.0]), jnp.asarray([2.0]))
    np.testing.assert_array_equal(np.asarray(diff.values[0]), [1.0, 2.0])
    np.testing.assert_array_equal(np.asarray(diff.coefficients[0]), [1.0, -1.0])

    for i in range(1, 12):
        xs = jnp.arange(i, dtype=float)
        combo = mean_of(xs)
        assert combo.combo_size == i
        np.testing.assert_array_equal(np.asarray(combo.values[0]), np.asarray(xs))
        np.testing.assert_allclose(
            np.asarray(combo.coefficients[0]), np.full(i, 1.0 / i)
        )

    single = to_linear_combination(jnp.asarray([1.0]))
    assert single.combo_size == 1
    np.testing.assert_array_equal(np.asarray(single.coefficients[0]), [1.0])

    # to_linear_combination is idempotent on an existing combination
    again = to_linear_combination(diff)
    assert again is diff


# ---------------------------------------------------------------------------
# test_tune.cc — tuning drivers on the seed-3 data
# ---------------------------------------------------------------------------
def _tune_case_model():
    return gp_from_covariance(make_simple_covariance_function())


def test_tune_single_dataset():
    """test_tune.cc:20-40: 20 evals of the LOO-NLL tuner must improve the
    cross-validated joint NLL."""
    from albatross_tpu.tuning import get_tuner

    dataset = _gp_case_dataset()
    model = _tune_case_model()
    loo_nll = LeaveOneOutLikelihood(JointDistribution)
    result = get_tuner(
        model, loo_nll, dataset, max_iterations=20
    ).tune()

    nll = NegativeLogLikelihood(JointDistribution)
    before = np.mean(
        np.asarray(
            model.cross_validate().scores(nll, dataset, LeaveOneOutGrouper())
        )
    )
    tuned = model.set_params(result.params)
    after = np.mean(
        np.asarray(
            tuned.cross_validate().scores(nll, dataset, LeaveOneOutGrouper())
        )
    )
    assert after < before


def test_tune_with_prior_bounds():
    """test_tune.cc:42-64: starting every parameter at 1e-8 (PositivePrior)
    drives NaN objectives early; tuning must recover to valid params."""
    from albatross_tpu.core.parameters import Parameter
    from albatross_tpu.core.priors import PositivePrior
    from albatross_tpu.tuning import get_tuner

    dataset = _gp_case_dataset()
    model = _tune_case_model()
    for name in model.get_params():
        model = model.set_param(name, Parameter(1e-8, PositivePrior()))
    result = get_tuner(
        model,
        LeaveOneOutLikelihood(JointDistribution),
        dataset,
        max_iterations=20,
    ).tune()
    tuned = model.set_params(result.params)
    assert tuned.params_are_valid()


def test_tune_with_prior():
    """test_tune.cc:66-105: tuning WITH tight Gaussian priors lands at
    parameters whose prior log-likelihood beats the prior-free optimum's."""
    from albatross_tpu.core.parameters import Parameter
    from albatross_tpu.core.priors import FixedPrior, GaussianPrior
    from albatross_tpu.tuning import get_tuner

    dataset = _gp_case_dataset()
    model_no_priors = _tune_case_model()
    model_with_priors = _tune_case_model()
    for name, p in model_with_priors.get_params().items():
        model_with_priors = model_with_priors.set_param(
            name, Parameter(p.value, GaussianPrior(float(p.value) + 0.1, 0.001))
        )
    first = sorted(model_with_priors.get_params())[0]
    p0 = model_with_priors.get_params()[first]
    model_with_priors = model_with_priors.set_param(
        first, Parameter(p0.value, FixedPrior())
    )

    loo_nll = LeaveOneOutLikelihood(JointDistribution)
    result = get_tuner(
        model_with_priors, loo_nll, dataset, max_iterations=50
    ).tune()
    tuned = model_with_priors.set_params(result.params)
    ll_with_prior = float(tuned.prior_log_likelihood())

    result_no = get_tuner(
        model_no_priors, loo_nll, dataset, max_iterations=50
    ).tune()
    cross = model_with_priors
    for name, p in result_no.params.items():
        cross = cross.set_param_value(name, p.value)
    ll_without_prior = float(cross.prior_log_likelihood())
    assert ll_with_prior > ll_without_prior


def test_tune_multiple_datasets():
    """test_tune.cc:107-124: tuning over two datasets with the mean
    aggregator runs and improves the aggregate objective."""
    from albatross_tpu.tuning import get_tuner, mean_aggregator

    x1, y1 = make_toy_linear_data(2.0, 4.0, 0.2)
    x2, y2 = make_toy_linear_data(1.0, 5.0, 0.1)
    datasets = [
        RegressionDataset.create(jnp.asarray(x1), jnp.asarray(y1)),
        RegressionDataset.create(jnp.asarray(x2), jnp.asarray(y2)),
    ]
    model = _tune_case_model()
    tuner = get_tuner(
        model,
        LeaveOneOutLikelihood(JointDistribution),
        datasets,
        aggregator=mean_aggregator,
        max_iterations=20,
    )
    result = tuner.tune()
    assert result.history[-1] <= result.history[0] + 1e-9


# test_tune.cc:135-226 TestTuneQuadratic: the generic tuner must handle the
# plain-vector AND f(ParameterStore) objective forms on the same quadratic.
_QUAD_A = np.array(
    [
        [4.5244, 1.43904, 2.24636],
        [1.43904, 2.26512, 0.985532],
        [2.24636, 0.985532, 2.18973],
    ]
)
_QUAD_TRUTH = np.ones(3)
_QUAD_B = _QUAD_A @ _QUAD_TRUTH


def test_tune_quadratic_generic():
    from albatross_tpu.core.parameters import Parameter
    from albatross_tpu.core.priors import UninformativePrior
    from albatross_tpu.core.parameters import get_tunable_parameters
    from albatross_tpu.tuning import GenericTuner
    from albatross_tpu.tuning.tune import tune_parameter_store

    A = jnp.asarray(_QUAD_A)
    b = jnp.asarray(_QUAD_B)

    def objective_vec(x):
        z = A @ jnp.asarray(x) - b
        return z @ z

    params = {
        f"x_{i}": Parameter(0.0, UninformativePrior()) for i in range(3)
    }
    tunable = get_tunable_parameters(params)

    # vector form, both optimizers (the reference runs nlopt's gradient-free
    # and gradient entries; here lbfgs = gradient, nelder_mead = SBPLX-like)
    for optimizer in ("lbfgs", "nelder_mead"):
        tuner = GenericTuner(
            tunable, optimizer=optimizer, max_iterations=300,
            tolerance=1e-14,
        )
        result = tuner.tune(objective_vec)
        assert np.abs(np.asarray(result.x) - _QUAD_TRUTH).max() < 5e-3, (
            optimizer,
            result.x,
        )

    # f(ParameterStore) form
    def objective_params(store):
        vals = jnp.asarray(
            [store[f"x_{i}"].value for i in range(3)]
        )
        return objective_vec(vals)

    result = tune_parameter_store(
        objective_params, params, max_iterations=300, tolerance=1e-14
    )
    got = np.asarray(
        [float(result.params[f"x_{i}"].value) for i in range(3)]
    )
    assert np.abs(got - _QUAD_TRUTH).max() < 5e-3


# ---------------------------------------------------------------------------
# test_covariance_function.cc — variant + linear-combination caller semantics
# ---------------------------------------------------------------------------
# The reference dispatches vector<variant<X, Y, W>> per element at compile
# time; the batch-level analog encodes the kind per row ({kind} features) —
# a mixed batch IS the variant batch, and undefined kind pairs are zero
# blocks (VariantForwarder semantics).
def _kinds(*ks):
    return {"kind": jnp.asarray([float(k) for k in ks])}


_KX, _KY, _KW = 0, 1, 2


class _HasMultiple(CovarianceFunction):
    """test_covariance_utils.h:42-62: (x,x)=1, (x,y)=3, (y,y)=5, (w,w)=7,
    every other pair undefined (zero in variant context)."""

    @property
    def name(self):
        return "has_multiple"

    def _matrix(self, X, Y, x_meas, y_meas):
        kx = X["kind"][:, None]
        ky = Y["kind"][None, :]

        def pair(a, b, v):
            hit = ((kx == a) & (ky == b)) | ((kx == b) & (ky == a))
            return jnp.where(hit, v, 0.0)

        return (
            pair(_KX, _KX, 1.0)
            + pair(_KX, _KY, 3.0)
            + pair(_KY, _KY, 5.0)
            + pair(_KW, _KW, 7.0)
        )


class _HasXX(CovarianceFunction):
    """test_covariance_utils.h HasXX: defined only for (x, x)."""

    @property
    def name(self):
        return "has_xx"

    def _matrix(self, X, Y, x_meas, y_meas):
        kx = X["kind"][:, None]
        ky = Y["kind"][None, :]
        return jnp.where((kx == _KX) & (ky == _KX), 1.0, 0.0)


def _scalar(cov, a, b):
    return float(cov.matrix_or_none(a, b)[0, 0])


def test_covariance_matrix_shapes():
    """test_covariance_function.cc:35-54."""
    cov = _HasMultiple()
    xs = _kinds(_KX, _KX, _KX)
    ys = _kinds(_KY, _KY)
    assert cov(xs).shape == (3, 3)
    assert cov(ys).shape == (2, 2)
    assert cov.matrix_or_none(xs, ys).shape == (3, 2)


def test_works_with_variants():
    """test_covariance_function.cc:57-133: the pair-value table, including
    zeros for undefined pairs, and a mixed (variant) batch assembling the
    blockwise table."""
    cov = _HasMultiple()
    x, y, w = _kinds(_KX), _kinds(_KY), _kinds(_KW)
    assert _scalar(cov, x, x) == 1.0
    assert _scalar(cov, x, y) == 3.0
    assert _scalar(cov, y, x) == 3.0
    assert _scalar(cov, y, y) == 5.0
    assert _scalar(cov, w, w) == 7.0
    assert _scalar(cov, x, w) == 0.0
    assert _scalar(cov, w, y) == 0.0
    mixed = _kinds(_KX, _KY, _KW)  # variant<X, Y, W> batch
    expected = np.array(
        [[1.0, 3.0, 0.0], [3.0, 5.0, 0.0], [0.0, 0.0, 7.0]]
    )
    np.testing.assert_array_equal(np.asarray(cov(mixed)), expected)


def test_variant_recursion_bug():
    """test_covariance_function.cc:135-171: a sum must not skip terms that
    are defined for only part of the variant."""
    has_multiple = _HasMultiple()
    cov = _HasXX() + _HasMultiple()
    x, y = _kinds(_KX), _kinds(_KY)
    assert _scalar(cov, x, x) == 1.0 + _scalar(has_multiple, x, x)
    assert _scalar(cov, x, y) == _scalar(has_multiple, x, y)
    assert _scalar(cov, y, x) == _scalar(has_multiple, y, x)
    assert _scalar(cov, y, y) == _scalar(has_multiple, y, y)


def test_caller_ordering():
    """test_covariance_function.cc:172-193: Measurement wrappers unwrap for
    measurement-agnostic kernels, including around linear combinations."""
    from albatross_tpu import Measurement
    from albatross_tpu.kernels import sum_of

    cov = _HasMultiple()
    x, y = _kinds(_KX), _kinds(_KY)
    x_y = _scalar(cov, x, y)
    assert _scalar(cov, x, Measurement(y)) == x_y
    sum_of_two_ys = sum_of(_kinds(_KY, _KY))
    assert _scalar(cov, x, sum_of_two_ys) == 2.0 * x_y
    assert _scalar(cov, x, Measurement(sum_of_two_ys)) == 2.0 * x_y


def test_linear_combo_variants():
    """test_covariance_function.cc:194-223: combinations OF variants."""
    from albatross_tpu.kernels import sum_of

    cov = _HasMultiple()
    x, y = _kinds(_KX), _kinds(_KY)
    vy_vy = sum_of(_kinds(_KY, _KY))
    vy_vx = sum_of(_kinds(_KY, _KX))
    vx = sum_of(_kinds(_KX))
    cov_x_y = _scalar(cov, x, y)
    assert _scalar(cov, vx, y) == cov_x_y
    assert _scalar(cov, x, vy_vy) == 2.0 * cov_x_y
    expected = 2.0 * _scalar(cov, y, x) + 2.0 * _scalar(cov, y, y)
    assert _scalar(cov, vy_vy, vy_vx) == expected


def test_linear_combinations_covariance():
    """test_covariance_function.cc:225-249."""
    from albatross_tpu.kernels import difference_of, mean_of, sum_of

    cov = _HasMultiple()
    x, y = _kinds(_KX), _kinds(_KY)
    one_x = _scalar(cov, x, x)
    one_xy = _scalar(cov, y, x)
    sum_x = sum_of(_kinds(_KX, _KX))
    assert _scalar(cov, sum_x, x) == 2.0 * one_x
    assert _scalar(cov, x, sum_x) == 2.0 * one_x
    assert _scalar(cov, sum_x, sum_x) == 4.0 * one_x
    sum_xy = sum_of(_kinds(_KX, _KY))
    assert _scalar(cov, x, sum_xy) == one_x + one_xy
    diff_y = difference_of(_kinds(_KY), _kinds(_KY))
    assert _scalar(cov, diff_y, diff_y) == 0.0
    diff_xy = difference_of(_kinds(_KX), _kinds(_KY))
    assert _scalar(cov, x, diff_xy) == one_x - one_xy
    mean_x = mean_of(_kinds(_KX, _KX))
    assert _scalar(cov, mean_x, mean_x) == 0.25 * _scalar(
        cov, sum_x, sum_x
    )


# ---------------------------------------------------------------------------
# test_evaluate.cc — NLL golden (scipy-verified in the reference's comment)
# ---------------------------------------------------------------------------
def test_negative_log_likelihood_golden():
    """test_evaluate.cc:34-63: the multivariate NLL matches
    scipy.stats.multivariate_normal.logpdf = -6.0946974293510134, and the
    joint/marginal metric wrappers agree with the raw computations."""
    from albatross_tpu.evaluation.metrics import (
        negative_log_likelihood_joint,
        negative_log_likelihood_marginal,
    )
    from albatross_tpu.models.gp import negative_log_likelihood
    from albatross_tpu.ops.linalg import CholeskyFactor

    x = jnp.asarray([-1.0, 0.0, 1.0])
    cov = jnp.asarray([[1.0, 0.9, 0.8], [0.9, 1.0, 0.9], [0.8, 0.9, 1.0]])
    nll = float(negative_log_likelihood(x, CholeskyFactor.factorize(cov)))
    assert nll == pytest.approx(6.0946974293510134, abs=1e-6)

    pred = JointDistribution(x, cov)
    truth = MarginalDistribution(jnp.zeros((3,)), jnp.zeros((3,)))
    assert float(
        negative_log_likelihood_joint(pred, truth)
    ) == pytest.approx(nll, abs=1e-6)

    diag_pred = MarginalDistribution(x, jnp.diagonal(cov))
    diag_nll = float(negative_log_likelihood_marginal(diag_pred, truth))
    dense_diag = float(
        negative_log_likelihood(
            x, CholeskyFactor.factorize(jnp.diag(jnp.diagonal(cov)))
        )
    )
    assert diag_nll == pytest.approx(dense_diag, abs=1e-6)


# ---------------------------------------------------------------------------
# test_model_metrics.cc — every model metric is finite on the GP case
# ---------------------------------------------------------------------------
def test_model_metrics_sanity():
    """test_model_metrics.cc:18-43."""
    from albatross_tpu.evaluation.model_metrics import (
        GaussianProcessNegativeLogLikelihood,
        LeaveOneOutLikelihood,
        LeaveOneOutRMSE,
    )

    dataset = _gp_case_dataset()
    model = _tune_case_model()
    for metric in (
        LeaveOneOutLikelihood(JointDistribution),
        LeaveOneOutLikelihood(MarginalDistribution),
        LeaveOneOutRMSE(),
        GaussianProcessNegativeLogLikelihood(),
    ):
        value = float(metric(dataset, model))
        assert not math.isnan(value), type(metric).__name__


# ---------------------------------------------------------------------------
# test_conditional_gaussian.cc — conditional == GP on the same prior
# ---------------------------------------------------------------------------
def test_conditional_equivalent_to_gp():
    """test_conditional_gaussian.cc:19-46 (the with-mean GP case)."""
    from albatross_tpu.kernels import as_measurement
    from albatross_tpu.kernels.means import LinearMean
    from albatross_tpu.models.conditional import ConditionalGaussian

    a, b = 5.0, 1.0
    x, y = make_toy_linear_data(a, b)
    dataset = RegressionDataset.create(jnp.asarray(x), jnp.asarray(y))
    covariance = SquaredExponential(100.0, 100.0) + measurement_only(
        IndependentNoise(0.1)
    )
    gp = gp_from_covariance_and_mean(covariance, LinearMean(slope=b, offset=a))
    prior = gp.prior(dataset.features)
    model = ConditionalGaussian(prior, dataset.targets)

    assert dataset.size > 5
    train_inds = [0, 2, 4]
    test_inds = [1, 3]

    gp_fit = gp.fit(dataset[jnp.asarray(train_inds)])
    meas = as_measurement(dataset[jnp.asarray(test_inds)].features)
    gp_pred = gp_fit.predict(meas).joint()

    cond_pred = model.fit(train_inds).predict(test_inds).joint()
    assert (
        np.linalg.norm(np.asarray(cond_pred.mean) - np.asarray(gp_pred.mean))
        < 1e-6
    )
    assert (
        np.linalg.norm(
            np.asarray(cond_pred.covariance) - np.asarray(gp_pred.covariance)
        )
        < 1e-6
    )


# ---------------------------------------------------------------------------
# test_core_dataset.cc — dataset utilities
# ---------------------------------------------------------------------------
def test_dataset_construct_subset_filter():
    """test_core_dataset.cc:20-36."""
    rng = np.random.default_rng(0)
    features = jnp.asarray([3.0, 7.0, 1.0])
    targets = jnp.asarray(rng.standard_normal(3))
    dataset = RegressionDataset.create(features, targets)
    assert dataset.size == 3
    sub = dataset.subset(jnp.asarray([0, 2]))
    assert sub.size == 2
    keep = np.flatnonzero(
        np.isin(np.asarray(features), [3.0, 1.0])
    )
    filtered = dataset.subset(jnp.asarray(keep))
    np.testing.assert_array_equal(
        np.asarray(filtered.features), np.asarray(sub.features)
    )
    np.testing.assert_array_equal(
        np.asarray(filtered.targets.mean), np.asarray(sub.targets.mean)
    )


def test_dataset_deduplicate():
    """test_core_dataset.cc:49-57: later occurrences win."""
    from albatross_tpu.core.dataset import deduplicate

    rng = np.random.default_rng(1)
    dataset = RegressionDataset.create(
        jnp.asarray([0.0, 1.0, 1.0, 2.0]), jnp.asarray(rng.standard_normal(4))
    )
    dedup = deduplicate(dataset)
    expected = dataset.subset(jnp.asarray([0, 2, 3]))
    np.testing.assert_array_equal(
        np.asarray(dedup.features), np.asarray(expected.features)
    )
    np.testing.assert_array_equal(
        np.asarray(dedup.targets.mean), np.asarray(expected.targets.mean)
    )
    # idempotent
    again = deduplicate(dedup)
    np.testing.assert_array_equal(
        np.asarray(again.features), np.asarray(dedup.features)
    )


@pytest.mark.parametrize(
    "fa, fb, expected_n",
    [
        ([0, 1, 2], [2, 3, 0, 1], 3),  # a in b
        ([0, 2, 1], [2, 3, 0, 1], 3),  # unordered
        ([0, 1, 2, 3], [2, 4, 0], 2),  # a not in b
        ([0, 1, 2], [3, 4, 5], 0),  # no intersect
    ],
)
def test_dataset_align(fa, fb, expected_n):
    """test_core_dataset.cc:59-115."""
    from albatross_tpu.core.dataset import align_datasets

    rng = np.random.default_rng(2)
    a = RegressionDataset.create(
        jnp.asarray(fa, dtype=float),
        jnp.asarray(rng.standard_normal(len(fa))),
    )
    b = RegressionDataset.create(
        jnp.asarray(fb, dtype=float),
        jnp.asarray(rng.standard_normal(len(fb))),
    )
    a2, b2 = align_datasets(a, b, key_fn=lambda f: np.asarray(f))
    assert a2.size == expected_n
    assert b2.size == expected_n
    np.testing.assert_array_equal(
        np.asarray(a2.features), np.asarray(b2.features)
    )


def test_dataset_concatenate_same_type():
    """test_core_dataset.cc:117-143: split + recombine round trip, with and
    without target variance."""
    from albatross_tpu.core.dataset import concatenate_datasets

    rng = np.random.default_rng(3)
    features = jnp.asarray([3.0, 7.0, 1.0])
    y = jnp.asarray(rng.standard_normal(3))
    for variance in (None, jnp.ones((3,))):
        dataset = RegressionDataset.create(features, y, variance=variance)
        first = dataset.subset(jnp.asarray([0, 1]))
        second = dataset.subset(jnp.asarray([2]))
        assert first.size == 2 and second.size == 1
        recon = concatenate_datasets([first, second])
        np.testing.assert_array_equal(
            np.asarray(recon.features), np.asarray(dataset.features)
        )
        np.testing.assert_array_equal(
            np.asarray(recon.targets.mean), np.asarray(dataset.targets.mean)
        )
        np.testing.assert_array_equal(
            np.asarray(recon.targets.get_variance()),
            np.asarray(dataset.targets.get_variance()),
        )


def test_dataset_concatenate_different_type():
    """test_core_dataset.cc:144-173: concatenating different feature kinds
    promotes to a variant — here a TaggedBatch via
    concatenate_mixed_datasets, with per-kind membership preserved in the
    interleaved order."""
    from albatross_tpu.kernels.variants import concatenate_mixed_datasets

    rng = np.random.default_rng(4)
    int_ds = RegressionDataset.create(
        jnp.asarray([3, 7, 1], dtype=jnp.int32),
        jnp.asarray(rng.standard_normal(3)),
    )
    dbl_ds = RegressionDataset.create(
        jnp.asarray([3.0, 7.0, 1.0]), jnp.asarray(rng.standard_normal(3))
    )
    recon = concatenate_mixed_datasets([int_ds, dbl_ds])
    batch = recon.features
    assert isinstance(batch, TaggedBatch)
    assert recon.size == 6
    # rows 0-2 are the int kind (tag 0), rows 3-5 the double kind (tag 1)
    order = np.asarray(batch.order)
    tags_by_position = np.empty(6, dtype=int)
    start = 0
    for tag, feats in zip(batch.tags, batch.features):
        n = np.asarray(feats).shape[0]
        tags_by_position[order[start : start + n]] = tag
        start += n
    np.testing.assert_array_equal(tags_by_position, [0, 0, 0, 1, 1, 1])
    np.testing.assert_array_equal(
        np.asarray(batch.features[0]), [3, 7, 1]
    )
    np.testing.assert_array_equal(
        np.asarray(batch.features[1]), [3.0, 7.0, 1.0]
    )


# ---------------------------------------------------------------------------
# test_group_by.cc — split/apply/combine surface on the fibonacci data
# ---------------------------------------------------------------------------
def _fibonacci(n):
    """test_utils fibonacci(20): doubles 1, 1, 2, 3, 5, ..."""
    out = [1.0, 1.0]
    while len(out) < n:
        out.append(out[-1] + out[-2])
    return np.asarray(out[:n])


def _number_of_digits(x):
    return np.asarray([len(str(int(v))) for v in np.asarray(x)])


def test_group_by_nested_filter():
    """test_group_by.cc:432-445: split-apply-combine removal of
    below-group-mean values equals the direct computation."""
    fib = jnp.asarray(_fibonacci(20))
    grouped = group_by(fib, _number_of_digits)
    filtered = (
        grouped.groups()
        .apply(lambda v: v[v >= jnp.mean(v)])
        .combine()
    )
    direct = []
    keys = _number_of_digits(fib)
    for k in sorted(set(keys.tolist())):
        vals = np.asarray(fib)[keys == k]
        direct.extend(vals[vals >= vals.mean()].tolist())
    np.testing.assert_array_equal(np.asarray(filtered), np.asarray(direct))


def test_group_by_combine_ordering():
    """test_group_by.cc:447-460: combine concatenates by SORTED key."""
    from albatross_tpu.indexing.grouping import Grouped

    grouped = Grouped(
        {
            3: jnp.full((3,), 3.0),
            1: jnp.full((1,), 1.0),
            0: jnp.zeros((0,)),
            5: jnp.full((5,), 5.0),
        }
    )
    expected = [1.0] + [3.0] * 3 + [5.0] * 5
    np.testing.assert_array_equal(np.asarray(grouped.combine()), expected)


def test_group_by_first_group_and_values():
    """test_group_by.cc:462-518."""
    from albatross_tpu.indexing.grouping import Grouped

    fib = jnp.asarray(_fibonacci(20))
    grouped = group_by(fib, _number_of_digits)
    key, values = grouped.first_group()
    assert all(_number_of_digits(values) == key)
    assert grouped.groups().first_group()[0] == key
    np.testing.assert_array_equal(
        np.asarray(grouped.groups().first_value()), np.asarray(values)
    )

    indexers = grouped.indexers()
    smallest = indexers.first_value()
    largest = indexers.last_value()
    keys = _number_of_digits(fib)
    assert all(keys[smallest] == keys.min())
    assert all(keys[largest] == keys.max())
    np.testing.assert_array_equal(smallest, np.flatnonzero(keys == keys.min()))
    np.testing.assert_array_equal(largest, np.flatnonzero(keys == keys.max()))

    example = Grouped({1: "one", 2: "two", 0: "zero"})
    assert example.first_value() == "zero"
    assert example.last_value() == "two"

    group_2 = grouped.get_group(2)
    assert all(_number_of_digits(group_2) == 2)


def test_group_by_erase():
    """test_group_by.cc:530-560 (functional erase)."""
    fib = jnp.asarray(_fibonacci(20))
    groups = group_by(fib, _number_of_digits).groups()
    modified = groups.erase(2)
    assert 2 in groups
    assert 2 not in modified
    for key in groups:
        if key != 2:
            np.testing.assert_array_equal(
                np.asarray(groups[key]), np.asarray(modified[key])
            )


def test_group_by_reductions():
    """test_group_by.cc:562-639: min/max values+keys, sum/mean, any/all."""
    from albatross_tpu.indexing.grouping import Grouped

    fib = jnp.asarray(_fibonacci(20))
    grouped = group_by(fib, _number_of_digits)
    sums = grouped.apply(lambda v: float(jnp.sum(v)))
    vals = np.asarray(sums.values())
    assert sums.min_value() == vals.min()
    assert sums.max_value() == vals.max()

    means = grouped.apply(lambda v: float(jnp.mean(v)))
    assert means.mean() == pytest.approx(np.mean(np.asarray(means.values())))
    assert means.sum() == pytest.approx(np.sum(np.asarray(means.values())))

    example = Grouped({"one": 1, "two": 2, "negative": -5, "large": 7})
    assert example.max_value() == 7
    assert example.max_key() == "large"
    assert example.min_value() == -5
    assert example.min_key() == "negative"

    counts = grouped.counts()
    min_count, max_count = counts.min_value(), counts.max_value()
    geq_min = grouped.apply(lambda xs: len(xs) >= min_count)
    gt_min = grouped.apply(lambda xs: len(xs) > min_count)
    gt_max = grouped.apply(lambda xs: len(xs) > max_count)
    assert geq_min.all() and geq_min.any()
    assert not gt_min.all() and gt_min.any()
    assert not gt_max.all() and not gt_max.any()


def test_group_by_with():
    """test_group_by.cc:641-687: pair groups with a parallel vector and
    with a key-aligned map."""
    fib = jnp.asarray(_fibonacci(20))
    grouped = group_by(fib, _number_of_digits)
    strings = [str(float(v)) for v in np.asarray(fib)]
    with_strings = grouped.with_(strings)
    assert len(with_strings) > 0
    for key, (doubles, strs) in with_strings.items():
        for d, s in zip(np.asarray(doubles), strs):
            assert str(float(d)) == s

    as_strings = grouped.apply(
        lambda xs: [str(float(v)) for v in np.asarray(xs)]
    )
    with_map = grouped.with_(as_strings)
    for key, (doubles, strs) in with_map.items():
        for d, s in zip(np.asarray(doubles), strs):
            assert str(float(d)) == s


# ---------------------------------------------------------------------------
# test_serializable_ldlt.cc — the factorization capability surface
# (CholeskyFactor replaces Eigen::SerializableLDLT)
# ---------------------------------------------------------------------------
def test_serializable_ldlt_surface():
    """test_serializable_ldlt.cc:34-70: solve == dense solve, inverse
    diagonal, log det, and the sqrt-solve outer-product identity."""
    from albatross_tpu.ops.linalg import CholeskyFactor

    rng = np.random.default_rng(5)
    n = 5
    part = rng.standard_normal((n, n))
    cov = jnp.asarray(part @ part.T + n * np.eye(n))
    information = jnp.ones((n,))
    chol = CholeskyFactor.factorize(cov)

    np.testing.assert_allclose(
        np.asarray(chol.solve(information)),
        np.linalg.solve(np.asarray(cov), np.asarray(information)),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(chol.inverse_diagonal()),
        np.diagonal(np.linalg.inv(np.asarray(cov))),
        atol=1e-8,
    )
    assert float(chol.log_determinant()) == pytest.approx(
        float(np.linalg.slogdet(np.asarray(cov))[1]), abs=1e-8
    )
    actual = np.asarray(chol.sqrt_solve(information))
    L = np.linalg.cholesky(np.asarray(cov))
    expected = np.linalg.solve(L, np.asarray(information))
    # sqrt solves are unique only up to orthogonal transforms: compare the
    # outer product (test_serializable_ldlt.cc:58-70)
    assert actual @ actual == pytest.approx(expected @ expected, abs=1e-4)
    # applied twice it produces the inverse
    eye = np.eye(n)
    sq = np.asarray(chol.sqrt_solve(jnp.asarray(eye)))
    np.testing.assert_allclose(
        sq.T @ sq, np.linalg.inv(np.asarray(cov)), atol=1e-8
    )


# ---------------------------------------------------------------------------
# test_block_utils.cc — BlockDiagonal + BlockSymmetric surface
# ---------------------------------------------------------------------------
def _block_example(rng):
    from albatross_tpu.ops.block import BlockDiagonal

    blocks = []
    n, k = 6, 3
    dense = np.zeros((n, n))
    for i in range(2):
        m = rng.standard_normal((k, k))
        m = m.T @ m + np.eye(k)
        blocks.append(jnp.asarray(m))
        dense[i * k : (i + 1) * k, i * k : (i + 1) * k] = m
    return BlockDiagonal.from_blocks(blocks), dense


def test_block_utils_surface():
    """test_block_utils.cc:45-123: to_dense, ldlt solve identity + log det,
    diagonal, dot product, vector solve, sqrt methods."""
    rng = np.random.default_rng(6)
    block, dense = _block_example(rng)
    np.testing.assert_allclose(np.asarray(block.to_dense()), dense, atol=1e-6)

    chol = block.factorize()
    ident = np.asarray(chol.solve(jnp.asarray(dense)))
    np.testing.assert_allclose(ident, np.eye(6), atol=1e-8)
    assert float(jnp.exp(chol.log_determinant())) == pytest.approx(
        np.linalg.det(dense), rel=1e-8
    )

    np.testing.assert_allclose(
        np.asarray(block.diagonal()), np.diagonal(dense), atol=1e-6
    )
    rhs = jnp.asarray(rng.standard_normal((6, 3)))
    np.testing.assert_allclose(
        np.asarray(block @ rhs), dense @ np.asarray(rhs), atol=1e-6
    )
    v = jnp.asarray(rng.standard_normal(6))
    np.testing.assert_allclose(
        np.asarray(chol.solve(v)), np.linalg.solve(dense, np.asarray(v)),
        atol=1e-6,
    )
    # sqrt methods: compare outer products (not unique)
    bs = np.asarray(chol.sqrt_solve(rhs))
    L = np.linalg.cholesky(dense)
    ds = np.linalg.solve(L, np.asarray(rhs))
    np.testing.assert_allclose(bs.T @ bs, ds.T @ ds, atol=1e-6)


def test_block_symmetric_solve():
    """test_block_utils.cc:125-147: both build_block_symmetric forms equal
    the dense solve."""
    from albatross_tpu.ops.block import (
        build_block_symmetric,
        build_block_symmetric_from_C,
    )
    from albatross_tpu.ops.linalg import CholeskyFactor

    rng = np.random.default_rng(2012)
    part = rng.standard_normal((5, 5))
    X = part @ part.T + 5 * np.eye(5)
    rhs = jnp.asarray(rng.standard_normal((5, 3)))
    expected = np.linalg.solve(X, np.asarray(rhs))

    A = X[:3, :3]
    B = jnp.asarray(X[:3, 3:])
    C = jnp.asarray(X[3:, 3:])
    A_chol = CholeskyFactor.factorize(jnp.asarray(A))

    block = build_block_symmetric_from_C(A_chol, B, C)
    np.testing.assert_allclose(np.asarray(block.solve(rhs)), expected, rtol=1e-8)

    S = np.asarray(C) - np.asarray(B).T @ np.linalg.solve(A, np.asarray(B))
    direct = build_block_symmetric(
        A_chol, B, CholeskyFactor.factorize(jnp.asarray(S))
    )
    np.testing.assert_allclose(
        np.asarray(direct.solve(rhs)), expected, rtol=1e-8
    )


# ---------------------------------------------------------------------------
# test_indexing.cc — subset / set_subset semantics
# ---------------------------------------------------------------------------
def test_indexing_subset_semantics():
    """test_indexing.cc:20-50: reorder, duplicates, singletons, identity,
    and empty subsets (via the array indexing the framework's subset
    helpers delegate to, plus subset_features)."""
    from albatross_tpu.core.dataset import subset_features

    x = jnp.asarray([3, 6, 4, 7, 9])
    cases = [
        ([1, 2], [6, 4]),
        ([2, 1], [4, 6]),
        ([3, 3], [7, 7]),
        ([2], [4]),
        ([0, 1, 2, 3, 4], [3, 6, 4, 7, 9]),
        ([], []),
    ]
    for idx, expected in cases:
        got = subset_features(x, jnp.asarray(idx, dtype=jnp.int32))
        np.testing.assert_array_equal(np.asarray(got), expected)


def test_indexing_set_subset_semantics():
    """test_indexing.cc:52-107 via MarginalDistribution.set_subset."""
    from albatross_tpu.core.distributions import MarginalDistribution

    x = jnp.asarray([3.0, 6.0, 4.0, 7.0, 9.0])
    cases = [
        ([1, 2], [-1.0, -2.0], [3.0, -1.0, -2.0, 7.0, 9.0]),
        ([2, 1], [-1.0, -2.0], [3.0, -2.0, -1.0, 7.0, 9.0]),
        ([3, 3], [-1.0, -2.0], [3.0, 6.0, 4.0, -2.0, 9.0]),
        ([2], [-1.0], [3.0, 6.0, -1.0, 7.0, 9.0]),
        (
            [0, 1, 2, 3, 4],
            [-1.0, -2.0, -3.0, -4.0, -5.0],
            [-1.0, -2.0, -3.0, -4.0, -5.0],
        ),
        ([], [], [3.0, 6.0, 4.0, 7.0, 9.0]),
    ]
    for idx, frm, expected in cases:
        to = MarginalDistribution(x, jnp.ones((5,)))
        out = to.set_subset(
            jnp.asarray(idx, dtype=jnp.int32),
            MarginalDistribution(
                jnp.asarray(frm), jnp.ones((len(frm),))
            ),
        )
        np.testing.assert_array_equal(np.asarray(out.mean), expected)


def test_indexing_matrix_subsets():
    """test_indexing.cc:216-334: column / row / symmetric matrix subsets
    (the symmetric case through JointDistribution.subset)."""
    rng = np.random.default_rng(7)
    M = rng.standard_normal((5, 5))
    idx = [3, 1]
    np.testing.assert_array_equal(
        np.asarray(jnp.asarray(M)[:, jnp.asarray(idx)]), M[:, idx]
    )
    np.testing.assert_array_equal(
        np.asarray(jnp.asarray(M)[jnp.asarray(idx), :]), M[idx, :]
    )
    S = M @ M.T
    joint = JointDistribution(jnp.zeros((5,)), jnp.asarray(S))
    sub = joint.subset(jnp.asarray(idx))
    np.testing.assert_array_equal(
        np.asarray(sub.covariance), S[np.ix_(idx, idx)]
    )


# ---------------------------------------------------------------------------
# test_parameter_handling_mixin.cc — parameter store semantics
# ---------------------------------------------------------------------------
def test_param_get_set_functional():
    """test_parameter_handling_mixin.cc:23-44 (+197-218): the returned
    store is a copy — mutating it does not touch the model; set_params
    sticks (functional setters here, same observable behavior)."""
    from albatross_tpu.core.parameters import Parameter

    model = gp_from_covariance(
        SquaredExponential(1.0, 2.0) + IndependentNoise(0.5)
    )
    params = model.get_params()
    bumped = {k: Parameter(float(p.value) + 1.0, p.prior) for k, p in params.items()}
    # the original model is unchanged by building a modified store
    for k, p in model.get_params().items():
        assert float(p.value) == float(params[k].value)
    m2 = model.set_params(bumped)
    for k, p in m2.get_params().items():
        assert float(p.value) == float(params[k].value) + 1.0


def test_param_vector_is_ordered():
    """test_parameter_handling_mixin.cc:46-90: the tunable vector order is
    independent of the insertion order (sorted names)."""
    from albatross_tpu.core.parameters import (
        Parameter,
        get_tunable_parameters,
        set_tunable_params,
    )

    ordered = {"1": Parameter(1.0), "2": Parameter(2.0), "3": Parameter(3.0)}
    unordered = {"2": Parameter(2.0), "1": Parameter(1.0), "3": Parameter(3.0)}
    np.testing.assert_array_equal(
        np.asarray(get_tunable_parameters(ordered).values),
        np.asarray(get_tunable_parameters(unordered).values),
    )
    np.testing.assert_array_equal(
        np.asarray(get_tunable_parameters(unordered).values), [1.0, 2.0, 3.0]
    )
    updated = set_tunable_params(unordered, jnp.asarray([4.0, 5.0, 6.0]))
    np.testing.assert_array_equal(
        np.asarray(get_tunable_parameters(updated).values), [4.0, 5.0, 6.0]
    )


def test_param_vector_skips_fixed():
    """test_parameter_handling_mixin.cc:92-116."""
    from albatross_tpu.core.parameters import (
        Parameter,
        get_tunable_parameters,
        set_tunable_params,
    )
    from albatross_tpu.core.priors import FixedPrior

    store = {
        "1": Parameter(1.0),
        "2": Parameter(2.0),
        "foo": Parameter(-2.0, FixedPrior()),
        "3": Parameter(3.0),
    }
    np.testing.assert_array_equal(
        np.asarray(get_tunable_parameters(store).values), [1.0, 2.0, 3.0]
    )
    updated = set_tunable_params(store, jnp.asarray([4.0, 5.0, 6.0]))
    np.testing.assert_array_equal(
        np.asarray(get_tunable_parameters(updated).values), [4.0, 5.0, 6.0]
    )
    assert float(updated["foo"].value) == -2.0


def test_param_prior_log_likelihood():
    """test_parameter_handling_mixin.cc:118-133: prior LL is the sum of
    per-parameter prior log-pdfs."""
    from albatross_tpu.core.parameters import Parameter
    from albatross_tpu.core.priors import GaussianPrior, UninformativePrior

    model = gp_from_covariance(SquaredExponential(1.0, 2.0))
    params = model.get_params()
    names = sorted(params)
    a, b = names[0], names[1]
    gauss = GaussianPrior(3.0, 5.0)
    uninf = UninformativePrior()
    m = model.set_param(a, Parameter(params[a].value, gauss))
    m = m.set_param(b, Parameter(params[b].value, uninf))
    expected = float(gauss.log_pdf(params[a].value)) + float(
        uninf.log_pdf(params[b].value)
    )
    assert float(m.prior_log_likelihood()) == pytest.approx(expected)


def test_param_set_value_preserves_prior():
    """test_parameter_handling_mixin.cc:135-195: changing values (set_param_
    value / set_param_values) must not touch priors, and adding priors must
    not touch values."""
    from albatross_tpu.core.parameters import Parameter
    from albatross_tpu.core.priors import GaussianPrior

    model = gp_from_covariance(
        SquaredExponential(1.0, 2.0) + IndependentNoise(0.5)
    )
    orig = model.get_params()
    orig_vec = np.asarray(model.get_tunable_parameters().values)

    with_priors = model
    for name, p in orig.items():
        with_priors = with_priors.set_param(
            name, Parameter(p.value, GaussianPrior(float(p.value) + 1.0, 1.0))
        )
    # values unchanged by adding priors
    np.testing.assert_array_equal(
        np.asarray(with_priors.get_tunable_parameters().values), orig_vec
    )
    # set_param_value keeps the prior
    for name in orig:
        bumped = with_priors.set_param_value(
            name, float(orig[name].value) + 3.14159
        )
        assert (
            bumped.get_params()[name].prior
            == with_priors.get_params()[name].prior
        )
    # set_param_values (bulk) keeps every prior
    bulk = with_priors.set_param_values(
        {name: float(p.value) + 1.0 for name, p in orig.items()}
    )
    for name in orig:
        assert float(bulk.get_params()[name].value) == float(
            orig[name].value
        ) + 1.0
        assert (
            bulk.get_params()[name].prior
            == with_priors.get_params()[name].prior
        )


def test_param_set_if_exists():
    """test_parameter_handling_mixin.cc:221-247: setting a nonexistent name
    through the if-exists form is a no-op; existing names stick."""
    model = gp_from_covariance(
        SquaredExponential(1.0, 2.0) + IndependentNoise(0.5)
    )
    orig = model.get_params()
    same = model.set_param_values_if_exists({"dummy": np.sqrt(2.0)})
    for name, p in same.get_params().items():
        assert float(p.value) == float(orig[name].value)
    for name in orig:
        updated = model.set_param_values_if_exists(
            {name: float(orig[name].value) + 3.14159}
        )
        assert float(updated.get_params()[name].value) == pytest.approx(
            float(orig[name].value) + 3.14159
        )
