"""Distribution-container tests (reference: tests/test_core_distribution.cc,
test_distribution_metrics... — arithmetic, subset, projections, transforms)."""

import jax.numpy as jnp
import numpy as np
import pytest

from albatross_tpu import JointDistribution, MarginalDistribution
from albatross_tpu.core import (
    concatenate_joints,
    concatenate_marginals,
    deduplicate,
    transform_dataset,
)


def test_marginal_arithmetic():
    a = MarginalDistribution.create([1.0, 2.0], [0.1, 0.2])
    b = MarginalDistribution.create([0.5, -1.0], [0.3, 0.4])
    s = a + b
    np.testing.assert_allclose(np.asarray(s.mean), [1.5, 1.0])
    np.testing.assert_allclose(np.asarray(s.variance), [0.4, 0.6])
    d = a - b
    np.testing.assert_allclose(np.asarray(d.mean), [0.5, 3.0])
    # variances ADD under subtraction of independent gaussians
    np.testing.assert_allclose(np.asarray(d.variance), [0.4, 0.6])
    m = 2.0 * a
    np.testing.assert_allclose(np.asarray(m.mean), [2.0, 4.0])
    np.testing.assert_allclose(np.asarray(m.variance), [0.4, 0.8])


def test_marginal_subset_and_set_subset():
    a = MarginalDistribution.create([1.0, 2.0, 3.0], [0.1, 0.2, 0.3])
    sub = a.subset(jnp.asarray([2, 0]))
    np.testing.assert_allclose(np.asarray(sub.mean), [3.0, 1.0])
    updated = a.set_subset(
        jnp.asarray([1]), MarginalDistribution.create([9.0], [0.9])
    )
    np.testing.assert_allclose(np.asarray(updated.mean), [1.0, 9.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(updated.variance), [0.1, 0.9, 0.3]
    )


def test_marginal_without_variance():
    a = MarginalDistribution.create([1.0, 2.0])
    assert not a.has_covariance()
    np.testing.assert_allclose(np.asarray(a.get_variance()), [0.0, 0.0])
    np.testing.assert_allclose(
        np.asarray(a.covariance_matrix()), np.zeros((2, 2))
    )


def test_joint_marginal_projection_and_transform():
    cov = np.asarray([[2.0, 0.5], [0.5, 1.0]])
    j = JointDistribution.create([1.0, -1.0], cov)
    m = j.marginal()
    np.testing.assert_allclose(np.asarray(m.variance), [2.0, 1.0])

    A = jnp.asarray([[1.0, 1.0]])
    t = j.transform(A)
    assert t.size == 1
    # var(x+y) = 2 + 1 + 2*0.5
    assert float(t.covariance[0, 0]) == pytest.approx(4.0)
    t2 = A @ j
    np.testing.assert_allclose(
        np.asarray(t2.covariance), np.asarray(t.covariance)
    )


def test_joint_arithmetic_and_subset():
    cov = np.eye(3)
    j = JointDistribution.create([1.0, 2.0, 3.0], cov)
    m = MarginalDistribution.create([0.0, 0.0, 0.0], [1.0, 1.0, 1.0])
    s = j + m
    np.testing.assert_allclose(np.asarray(s.covariance), 2 * np.eye(3))
    sub = j.subset(jnp.asarray([0, 2]))
    np.testing.assert_allclose(np.asarray(sub.mean), [1.0, 3.0])
    assert sub.covariance.shape == (2, 2)
    scaled = 3.0 * j
    np.testing.assert_allclose(np.asarray(scaled.covariance), 9 * np.eye(3))


def test_concatenations():
    a = MarginalDistribution.create([1.0], [0.1])
    b = MarginalDistribution.create([2.0, 3.0], [0.2, 0.3])
    c = concatenate_marginals([a, b])
    np.testing.assert_allclose(np.asarray(c.mean), [1.0, 2.0, 3.0])

    ja = JointDistribution.create([1.0], [[2.0]])
    jb = JointDistribution.create([2.0, 3.0], np.eye(2))
    jc = concatenate_joints([ja, jb])
    assert jc.size == 3
    np.testing.assert_allclose(
        np.asarray(jc.covariance),
        np.block(
            [[np.asarray([[2.0]]), np.zeros((1, 2))],
             [np.zeros((2, 1)), np.eye(2)]]
        ),
    )


def test_dedup_and_transform_dataset(rng):
    from albatross_tpu import RegressionDataset, gp_from_covariance
    from albatross_tpu import SquaredExponential, IndependentNoise, measurement_only

    d = RegressionDataset.create(
        jnp.asarray([1.0, 2.0, 1.0]), jnp.asarray([5.0, 6.0, 7.0])
    )
    dd = deduplicate(d)
    np.testing.assert_allclose(np.asarray(dd.features), [2.0, 1.0])
    np.testing.assert_allclose(np.asarray(dd.targets.mean), [6.0, 7.0])

    # transform_dataset produces a LinearCombination dataset a GP can fit
    base = RegressionDataset.create(
        jnp.asarray([0.0, 2.0, 4.0, 6.0]),
        jnp.asarray([0.0, 1.0, 2.0, 3.0]),
        variance=jnp.full((4,), 0.01),
    )
    A = jnp.asarray([[1.0, -1.0, 0.0, 0.0], [0.0, 0.0, 1.0, -1.0]])
    diffs = transform_dataset(A, base)
    assert diffs.size == 2
    np.testing.assert_allclose(np.asarray(diffs.targets.mean), [-1.0, -1.0])
    kernel = SquaredExponential(2.0, 1.0) + measurement_only(
        IndependentNoise(0.1)
    )
    fit = gp_from_covariance(kernel).fit(diffs)
    pred = fit.predict(jnp.asarray([1.0, 5.0])).marginal()
    assert np.all(np.isfinite(np.asarray(pred.mean)))


def test_transform_marginal_paths(rng):
    """transform/transform_marginal mirror TransformedDistribution's lazy
    marginal()/joint() (transformed_distribution.hpp:40-101): the marginal
    path must equal diag of the full A C At product without building it."""
    A = jnp.asarray(rng.standard_normal((3, 4)))
    mean = jnp.asarray(rng.standard_normal(4))
    var = jnp.asarray(rng.uniform(0.5, 2.0, 4))
    m = MarginalDistribution.create(mean, var)

    joint = A @ m
    assert isinstance(joint, JointDistribution)
    dense = np.asarray(A) @ np.diag(np.asarray(var)) @ np.asarray(A).T
    np.testing.assert_allclose(np.asarray(joint.covariance), dense, rtol=1e-12)
    marg = m.transform_marginal(A)
    np.testing.assert_allclose(
        np.asarray(marg.get_variance()), np.diag(dense), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(marg.mean), np.asarray(A) @ np.asarray(mean), rtol=1e-12
    )

    C = rng.standard_normal((4, 4))
    C = jnp.asarray(C @ C.T + 4.0 * np.eye(4))
    j = JointDistribution.create(mean, C)
    jm = j.transform_marginal(A)
    full = j.transform(A)
    np.testing.assert_allclose(
        np.asarray(jm.get_variance()),
        np.diag(np.asarray(full.covariance)),
        rtol=1e-12,
    )
