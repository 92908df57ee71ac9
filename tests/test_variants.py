"""Variant (tagged mixed-type) feature tests, mirroring the reference's
VariantForwarder semantics (callers.hpp): undefined tag pairs contribute
zero; defined pairs use the restricted kernel; full GP fit/predict works
over mixed batches."""

import jax.numpy as jnp
import numpy as np
import pytest

from albatross_tpu import (
    Constant,
    IndependentNoise,
    RegressionDataset,
    SquaredExponential,
    gp_from_covariance,
    measurement_only,
)
from albatross_tpu.kernels import Measurement, TaggedBatch, for_tag

POS, BIAS = 0, 1


def make_tagged(rng, n_pos=6, n_bias=3):
    """Interleaved mixed batch: positions (scalars) and bias ids."""
    tags = np.zeros(n_pos + n_bias, dtype=int)
    bias_rows = rng.choice(n_pos + n_bias, n_bias, replace=False)
    tags[bias_rows] = BIAS
    positions = jnp.asarray(np.sort(rng.uniform(0, 10, n_pos)))
    bias_ids = jnp.asarray(np.arange(n_bias, dtype=float))
    batch = TaggedBatch.create(
        tags, {POS: positions, BIAS: bias_ids}
    )
    return batch, tags, positions, bias_ids


def mixed_kernel():
    # positions get a smooth spatial kernel; biases get per-id variance;
    # a constant ties everything together (defined for every tag).
    return (
        for_tag(SquaredExponential(2.0, 1.5), POS)
        + for_tag(IndependentNoise(0.7), BIAS)
        + Constant(0.3)
    )


def test_tagged_gram_block_structure(rng):
    batch, tags, positions, bias_ids = make_tagged(rng)
    k = mixed_kernel()
    K = np.asarray(k(batch))
    n = len(tags)
    assert K.shape == (n, n)

    pos_rows = np.nonzero(tags == POS)[0]
    bias_rows = np.nonzero(tags == BIAS)[0]

    # POS-POS block: sqexp + constant
    sq = np.asarray(SquaredExponential(2.0, 1.5)(positions))
    np.testing.assert_allclose(
        K[np.ix_(pos_rows, pos_rows)], sq + 0.09, rtol=1e-10
    )
    # BIAS-BIAS block: noise (diagonal sigma^2) + constant
    np.testing.assert_allclose(
        K[np.ix_(bias_rows, bias_rows)],
        0.49 * np.eye(len(bias_rows)) + 0.09,
        rtol=1e-10,
    )
    # cross block: only the constant applies (sqexp/noise undefined -> 0)
    np.testing.assert_allclose(
        K[np.ix_(pos_rows, bias_rows)], 0.09 * np.ones((6, 3)), rtol=1e-10
    )


def test_tagged_diag_matches_dense(rng):
    batch, *_ = make_tagged(rng)
    k = mixed_kernel()
    np.testing.assert_allclose(
        np.asarray(k.diag(batch)),
        np.diagonal(np.asarray(k(batch))),
        rtol=1e-10,
    )


def test_tagged_cross_with_plain_batch(rng):
    batch, tags, positions, _ = make_tagged(rng)
    k = mixed_kernel()
    xs = jnp.linspace(0, 10, 4)
    C = np.asarray(k.matrix_or_none(batch, xs))
    assert C.shape == (len(tags), 4)
    # untagged side: plain kernels apply; ForTag terms apply when the tagged
    # side's tag matches (cross of BIAS rows with plain xs: noise applies
    # only on exact equality, which doesn't occur here)
    pos_rows = np.nonzero(tags == POS)[0]
    sq = np.asarray(
        SquaredExponential(2.0, 1.5).matrix_or_none(positions, xs)
    )
    np.testing.assert_allclose(C[pos_rows], sq + 0.09, rtol=1e-10)


def test_gp_over_tagged_batch(rng):
    """Full fit/predict across a mixed batch (the reference's variant GP
    tests, test_gp.cc with variant features)."""
    batch, tags, positions, bias_ids = make_tagged(rng)
    n = len(tags)
    y = jnp.asarray(rng.standard_normal(n))
    kernel = mixed_kernel() + measurement_only(IndependentNoise(0.1))
    data = RegressionDataset.create(batch, y, variance=jnp.full((n,), 0.01))

    # feature_count over TaggedBatch: leaves are the sub-batches, so use
    # explicit targets size check instead
    model = gp_from_covariance(kernel)
    fit_model = model.fit(batch, data.targets)

    # predict positions only (plain batch)
    xs = jnp.linspace(0, 10, 5)
    pred = fit_model.predict(xs).marginal()
    assert np.all(np.isfinite(np.asarray(pred.mean)))
    assert np.all(np.asarray(pred.variance) > 0)

    # predict a tagged batch
    pred2 = fit_model.predict(batch).marginal()
    assert np.all(np.isfinite(np.asarray(pred2.mean)))


def test_tagged_batch_subset(rng):
    """Dataset subsetting over tagged features preserves per-row identity."""
    batch, tags, positions, bias_ids = make_tagged(rng)
    n = len(tags)
    y = jnp.arange(float(n))
    data = RegressionDataset.create(batch, y)

    pick = jnp.asarray([0, 2, 5, 8])
    sub = data.subset(pick)
    assert sub.size == 4
    np.testing.assert_allclose(np.asarray(sub.targets.mean), [0.0, 2.0, 5.0, 8.0])

    # gram over the subset == corresponding block of the full gram
    k = mixed_kernel()
    K_full = np.asarray(k(batch))
    K_sub = np.asarray(k(sub.features))
    np.testing.assert_allclose(
        K_sub, K_full[np.ix_(np.asarray(pick), np.asarray(pick))], rtol=1e-10
    )


def test_concatenate_mixed_datasets(rng):
    """Type-promoting concatenation: two different feature kinds merge into
    one tagged dataset a GP can fit (concatenate.hpp variant promotion)."""
    from albatross_tpu.kernels.variants import concatenate_mixed_datasets

    pos_data = RegressionDataset.create(
        jnp.asarray(np.sort(rng.uniform(0, 10, 6))),
        jnp.asarray(rng.standard_normal(6)),
    )
    bias_data = RegressionDataset.create(
        jnp.arange(3.0), jnp.asarray(rng.standard_normal(3))
    )
    mixed = concatenate_mixed_datasets([pos_data, bias_data], tags=[POS, BIAS])
    assert mixed.size == 9
    np.testing.assert_allclose(
        np.asarray(mixed.targets.mean),
        np.concatenate(
            [np.asarray(pos_data.targets.mean), np.asarray(bias_data.targets.mean)]
        ),
    )
    kernel = mixed_kernel() + measurement_only(IndependentNoise(0.1))
    fit = gp_from_covariance(kernel).fit(
        mixed.features, mixed.targets
    )
    pred = fit.predict(jnp.linspace(0, 10, 4)).marginal()
    assert np.all(np.isfinite(np.asarray(pred.mean)))
