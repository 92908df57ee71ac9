"""ConditionalGaussian, LeastSquares, NullModel, RANSAC tests
(reference: tests/test_ransac.cc, test_conditional_gaussian.cc,
 test_models.cc typed suite)."""

import jax.numpy as jnp
import numpy as np
import pytest

from albatross_tpu import (
    ConditionalGaussian,
    DefaultGPRansacStrategy,
    GaussianProcess,
    IndependentNoise,
    JointDistribution,
    LinearRegression,
    MarginalDistribution,
    NullModel,
    RansacConfig,
    RegressionDataset,
    SquaredExponential,
    gp_from_covariance,
    measurement_only,
)
from albatross_tpu.models import LeastSquares, RansacReturnCode, ransac_success
from albatross_tpu.models.ransac import (
    FeatureCountConsensusMetric,
    GaussianProcessRansacStrategy,
)


def toy_gp_model():
    return gp_from_covariance(
        SquaredExponential(1.5, 1.0) + measurement_only(IndependentNoise(0.1))
    )


def test_conditional_gaussian_matches_manual(rng):
    n = 8
    A = rng.standard_normal((n, n))
    cov = A @ A.T + n * np.eye(n)
    mean = rng.standard_normal(n)
    prior = JointDistribution.create(mean, cov)
    truth = MarginalDistribution.create(
        mean + 0.5 * rng.standard_normal(n), 0.1 * np.ones(n)
    )
    model = ConditionalGaussian(prior, truth)
    train = np.asarray([0, 2, 4, 6])
    test = np.asarray([1, 3, 5, 7])
    pred = model.fit(train).predict(test).joint()

    # manual conditioning
    K = cov + np.diag(np.full(n, 0.1))
    # note: truth variance only on the train side
    Ktt = cov[np.ix_(train, train)] + 0.1 * np.eye(4)
    Kst = cov[np.ix_(train, test)]
    dev = np.asarray(truth.mean)[train] - mean[train]
    m_ref = mean[test] + Kst.T @ np.linalg.solve(Ktt, dev)
    c_ref = cov[np.ix_(test, test)] - Kst.T @ np.linalg.solve(Ktt, Kst)
    np.testing.assert_allclose(np.asarray(pred.mean), m_ref, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(pred.covariance), c_ref, rtol=1e-8)

    marg = model.fit(train).predict(test).marginal()
    np.testing.assert_allclose(
        np.asarray(marg.variance), np.diagonal(c_ref), rtol=1e-8
    )


def test_linear_regression_exact(rng):
    x = jnp.linspace(0, 10, 20)
    y = 3.0 + 2.0 * x
    data = RegressionDataset.create(x, y)
    model = LinearRegression()
    fit_model = model.fit(data)
    np.testing.assert_allclose(
        np.asarray(fit_model.fit.coefs), [3.0, 2.0], rtol=1e-9, atol=1e-9
    )
    pred = fit_model.predict(jnp.asarray([100.0])).mean()
    assert float(pred[0]) == pytest.approx(203.0, rel=1e-9)


def test_least_squares_design_matrix(rng):
    A = rng.standard_normal((30, 3))
    coefs = np.asarray([1.0, -2.0, 0.5])
    y = A @ coefs
    data = RegressionDataset.create(jnp.asarray(A), jnp.asarray(y))
    fit_model = LeastSquares().fit(data)
    np.testing.assert_allclose(np.asarray(fit_model.fit.coefs), coefs, atol=1e-9)


def test_null_model():
    model = NullModel()
    data = RegressionDataset.create(jnp.asarray([1.0, 2.0]), jnp.asarray([3.0, 4.0]))
    fit_model = model.fit(data)
    pred = fit_model.predict(jnp.asarray([5.0, 6.0, 7.0]))
    marg = pred.marginal()
    np.testing.assert_allclose(np.asarray(marg.mean), np.zeros(3))
    np.testing.assert_allclose(np.asarray(marg.variance), 1e4 * np.ones(3))
    joint = pred.joint()
    np.testing.assert_allclose(np.asarray(joint.covariance), 1e4 * np.eye(3))


def make_outlier_dataset(rng, n=20, n_outliers=3):
    x = np.sort(rng.uniform(0.0, 10.0, n))
    y = np.sin(x) + 0.05 * rng.standard_normal(n)
    outlier_idx = rng.choice(n, size=n_outliers, replace=False)
    y[outlier_idx] += rng.choice([-1, 1], n_outliers) * rng.uniform(
        3.0, 5.0, n_outliers
    )
    return (
        RegressionDataset.create(
            jnp.asarray(x), jnp.asarray(y), variance=jnp.full((n,), 0.0025)
        ),
        set(int(i) for i in outlier_idx),
    )


def test_gp_ransac_rejects_outliers(rng):
    data, outliers = make_outlier_dataset(rng)
    model = toy_gp_model()
    config = RansacConfig(
        inlier_threshold=1.0,
        random_sample_size=3,
        min_consensus_size=10,
        max_iterations=20,
        max_failed_candidates=20,
    )
    ransac_model = model.ransac(DefaultGPRansacStrategy(), config)
    fit_model = ransac_model.fit(data)
    output = fit_model.fit.ransac_output
    assert ransac_success(output.return_code)

    consensus = set(output.best.consensus())
    # all true outliers excluded from the consensus
    assert not (consensus & outliers)
    # most inliers retained
    assert len(consensus) >= data.size - len(outliers) - 3

    # prediction ignores the outliers: near sin(x) overall (local gaps where
    # candidate sampling dropped legitimate points are allowed)
    xs = jnp.linspace(0.5, 9.5, 9)
    pred = np.asarray(fit_model.predict(xs).mean())
    rmse = float(np.sqrt(np.mean((pred - np.sin(np.asarray(xs))) ** 2)))
    assert rmse < 0.4
    # a non-robust fit on the contaminated data is much worse
    naive = np.asarray(model.fit(data).predict(xs).mean())
    naive_rmse = float(np.sqrt(np.mean((naive - np.sin(np.asarray(xs))) ** 2)))
    assert rmse < naive_rmse


def test_ransac_audit_trail(rng):
    data, _ = make_outlier_dataset(rng)
    model = toy_gp_model()
    config = RansacConfig(1.0, 3, 10, 5, 5)
    fit_model = model.ransac(DefaultGPRansacStrategy(), config).fit(data)
    output = fit_model.fit.ransac_output
    assert len(output.iterations) <= 5
    for it in output.iterations:
        assert len(it.candidates) == 3
        # every non-candidate group classified
        assert len(it.inliers) + len(it.outliers) == data.size - 3


def test_ransac_invalid_arguments(rng):
    data, _ = make_outlier_dataset(rng)
    model = toy_gp_model()
    # sample size > dataset
    config = RansacConfig(1.0, 50, 60, 5, 5)
    fit_model = model.ransac(DefaultGPRansacStrategy(), config).fit(data)
    assert (
        fit_model.fit.ransac_output.return_code
        == RansacReturnCode.INVALID_ARGUMENTS
    )
    with pytest.raises(RuntimeError, match="INVALID_ARGUMENTS"):
        fit_model.predict(jnp.asarray([1.0])).mean()


def test_generic_ransac_strategy(rng):
    from albatross_tpu.models.ransac import DefaultRansacStrategy

    data, outliers = make_outlier_dataset(rng, n=15, n_outliers=2)
    model = toy_gp_model()
    config = RansacConfig(
        inlier_threshold=3.0,
        random_sample_size=3,
        min_consensus_size=8,
        max_iterations=8,
        max_failed_candidates=8,
    )
    fit_model = model.ransac(DefaultRansacStrategy(), config).fit(data)
    output = fit_model.fit.ransac_output
    assert ransac_success(output.return_code)
    assert not (set(output.best.consensus()) & outliers)


def test_adapted_model(rng):
    """Adapter converts features (using its own parameter) before
    delegating (reference tests/test_model_adapter.cc)."""
    from albatross_tpu.core import Parameter, UniformPrior
    from albatross_tpu.models import AdaptedModel

    def convert(adapter, features):
        return jnp.asarray(features) - adapter.center.value

    base = toy_gp_model()
    model = AdaptedModel(
        base, convert, {"center": Parameter(1.0, UniformPrior(-10.0, 10.0))}
    )
    assert "center" in model.get_params()
    assert "squared_exponential_length_scale" in model.get_params()

    # get/set round trip through the adapter param
    m2 = model.set_param_value("center", 2.0)
    assert float(m2.get_params()["center"].value) == 2.0

    # fitting with center c == fitting the base model on shifted features
    x = jnp.linspace(0.0, 10.0, 15)
    y = jnp.sin(x)
    data = RegressionDataset.create(x, y, variance=jnp.full((15,), 0.01))
    xs = jnp.linspace(1.0, 9.0, 5)
    adapted_pred = model.fit(data).predict(xs).marginal()
    shifted = RegressionDataset.create(x - 1.0, y, variance=jnp.full((15,), 0.01))
    base_pred = base.fit(shifted).predict(xs - 1.0).marginal()
    np.testing.assert_allclose(
        np.asarray(adapted_pred.mean), np.asarray(base_pred.mean), rtol=1e-10
    )

    # gradients flow through adapter params too
    import jax

    g = jax.grad(lambda m: -m.log_likelihood(data))(model)
    assert np.isfinite(float(g.get_params()["center"].value))


def test_block_utils(rng):
    from albatross_tpu.indexing import Grouped
    from albatross_tpu.ops import (
        block_inner_product,
        block_product,
        block_sum,
        block_diag_solve,
    )
    from albatross_tpu.ops.linalg import CholeskyFactor

    a = Grouped({0: jnp.ones((2, 2)), 1: 2.0 * jnp.ones((2, 2))})
    assert np.allclose(np.asarray(block_sum(a)), 3.0)
    b = Grouped({0: jnp.eye(2), 1: jnp.eye(2)})
    np.testing.assert_allclose(
        np.asarray(block_product(a, b)), 3.0 * np.ones((2, 2))
    )
    np.testing.assert_allclose(
        np.asarray(block_inner_product(a, b)), 3.0 * np.ones((2, 2))
    )
    solvers = Grouped(
        {0: CholeskyFactor.factorize(2.0 * jnp.eye(2)),
         1: CholeskyFactor.factorize(4.0 * jnp.eye(2))}
    )
    rhs = Grouped({0: jnp.ones((2, 1)), 1: jnp.ones((2, 1))})
    solved = block_diag_solve(solvers, rhs)
    np.testing.assert_allclose(np.asarray(solved[0]), 0.5 * np.ones((2, 1)))
    np.testing.assert_allclose(np.asarray(solved[1]), 0.25 * np.ones((2, 1)))


def test_ransac_batched_matches_serial(rng):
    """The vmapped GP-RANSAC path produces the IDENTICAL RansacOutput as the
    serial loop (same rng sequence, audit trail, best iteration, return
    code), with all candidate fits+scores in one batched device dispatch."""
    import importlib

    ransac_mod = importlib.import_module("albatross_tpu.models.ransac")
    from albatross_tpu.evaluation.metrics import NegativeLogLikelihood
    from albatross_tpu.core.distributions import JointDistribution
    from albatross_tpu.indexing import LeaveOneOutGrouper
    from albatross_tpu.models.ransac import (
        ChiSquaredConsensusMetric,
        ChiSquaredIsValidCandidateMetric,
        gp_ransac_strategy,
    )

    data, _ = make_outlier_dataset(rng)
    model = toy_gp_model()
    strategies = [
        DefaultGPRansacStrategy(),
        gp_ransac_strategy(
            NegativeLogLikelihood(JointDistribution),
            ChiSquaredConsensusMetric(),
            LeaveOneOutGrouper(),
            is_valid_candidate=ChiSquaredIsValidCandidateMetric(),
        ),
    ]
    config = RansacConfig(1.0, 3, 10, 12, 12)
    for strategy in strategies:
        serial = (
            model.ransac(strategy, config, use_batched=False)
            .fit(data)
            .fit.ransac_output
        )

        calls = {"n": 0}
        orig = ransac_mod._batched_scores

        def counted(*a, **k):
            calls["n"] += 1
            return orig(*a, **k)

        ransac_mod._batched_scores = counted
        try:
            batched = (
                model.ransac(strategy, config, use_batched=True)
                .fit(data)
                .fit.ransac_output
            )
        finally:
            ransac_mod._batched_scores = orig

        # all K candidate iterations cost one batched dispatch
        assert calls["n"] == 1
        assert batched.return_code == serial.return_code
        assert len(batched.iterations) == len(serial.iterations)
        for bi, si in zip(batched.iterations, serial.iterations):
            assert bi.candidates == si.candidates
            assert set(bi.inliers) == set(si.inliers)
            assert set(bi.outliers) == set(si.outliers)
            for key in si.inliers:
                assert bi.inliers[key] == pytest.approx(
                    si.inliers[key], rel=1e-8
                )
            if np.isnan(si.consensus_metric_value):
                assert np.isnan(bi.consensus_metric_value)
            else:
                assert bi.consensus_metric_value == pytest.approx(
                    si.consensus_metric_value, rel=1e-8
                )
        assert batched.best.candidates == serial.best.candidates
        assert set(batched.best.inliers) == set(serial.best.inliers)


def test_ransac_batched_failed_candidates(rng):
    """EXCEEDED_MAX_FAILED_CANDIDATES replays identically (the serial loop
    stops mid-sequence without consuming an iteration slot)."""
    from albatross_tpu.indexing import LeaveOneOutGrouper
    from albatross_tpu.models.ransac import (
        ChiSquaredIsValidCandidateMetric,
        gp_ransac_strategy,
    )

    data, _ = make_outlier_dataset(rng)
    model = toy_gp_model()
    # impossible validity threshold: every candidate is rejected
    strategy = gp_ransac_strategy(
        None, None, LeaveOneOutGrouper(),
        is_valid_candidate=ChiSquaredIsValidCandidateMetric(threshold=-1.0),
    )
    config = RansacConfig(1.0, 3, 10, 6, 4)
    serial = (
        model.ransac(strategy, config, use_batched=False)
        .fit(data)
        .fit.ransac_output
    )
    batched = (
        model.ransac(strategy, config, use_batched=True)
        .fit(data)
        .fit.ransac_output
    )
    assert serial.return_code == RansacReturnCode.EXCEEDED_MAX_FAILED_CANDIDATES
    assert batched.return_code == serial.return_code
    assert len(batched.iterations) == len(serial.iterations)
    for bi, si in zip(batched.iterations, serial.iterations):
        assert bi.candidates == si.candidates


def test_block_diagonal_rcond(rng):
    """rcond estimate (Hager driven by block solves) matches the exact L1
    condition number of the block-diagonal matrix (block_diagonal.hpp:220-228
    capability) on small ragged blocks where the exact value is computable."""
    from albatross_tpu.ops import BlockDiagonal

    blocks = []
    for n in (3, 5, 2):
        M = rng.standard_normal((n, n))
        blocks.append(jnp.asarray(M @ M.T + (1.0 + n) * np.eye(n)))
    bd = BlockDiagonal.from_blocks(blocks)
    chol = bd.factorize()

    dense = np.asarray(bd.to_dense())
    exact = 1.0 / (
        np.abs(dense).sum(axis=0).max()
        * np.abs(np.linalg.inv(dense)).sum(axis=0).max()
    )
    est = chol.rcond()
    assert 0.0 < est <= 1.0
    # Hager's estimator is exact-or-slight-underestimate of ||A^-1||_1, so
    # rcond() >= exact, and for these tiny blocks it should be tight.
    np.testing.assert_allclose(est, exact, rtol=0.25)
    # l1_norm ignores the identity padding
    np.testing.assert_allclose(
        chol.l1_norm(), np.abs(dense).sum(axis=0).max(), rtol=1e-6
    )
