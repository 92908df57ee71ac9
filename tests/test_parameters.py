"""Parameter-system tests mirroring the reference's semantics
(reference: tests/test_parameter_handling_mixin.cc, test_core_distribution.cc)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from albatross_tpu.core import (
    FixedPrior,
    GaussianPrior,
    LogNormalPrior,
    LogScaleUniformPrior,
    NonNegativePrior,
    Parameter,
    PositivePrior,
    UniformPrior,
    UninformativePrior,
    get_tunable_parameters,
    parameter_prior_log_likelihood,
    set_tunable_params,
)


def test_prior_log_pdfs():
    assert float(UninformativePrior().log_pdf(3.0)) == 0.0
    assert float(FixedPrior().log_pdf(3.0)) == 0.0
    assert float(PositivePrior().log_pdf(1.0)) == 0.0
    assert float(PositivePrior().log_pdf(-1.0)) == -np.inf
    assert float(NonNegativePrior().log_pdf(0.0)) == 0.0
    u = UniformPrior(2.0, 4.0)
    assert float(u.log_pdf(3.0)) == pytest.approx(-math.log(2.0))
    assert float(u.log_pdf(5.0)) == -np.inf
    g = GaussianPrior(1.0, 2.0)
    # matches the reference's exact expression (priors.hpp:135-138)
    expected = -0.5 * (1.8378770664093453 * 2 * math.log(2.0) + 0.25)
    assert float(g.log_pdf(2.0)) == pytest.approx(expected)
    ln = LogNormalPrior(0.0, 1.0)
    x = 2.0
    expected = (
        -0.5 * 1.8378770664093453 - math.log(x) - math.log(x) ** 2
    )
    assert float(ln.log_pdf(x)) == pytest.approx(expected)


def test_prior_bounds_and_flags():
    assert PositivePrior().lower_bound == pytest.approx(2.22e-16, rel=1e-2)
    assert NonNegativePrior().lower_bound == 0.0
    assert FixedPrior().is_fixed
    assert LogScaleUniformPrior(1e-3, 1e3).is_log_scale
    assert not UniformPrior(0, 1).is_log_scale


def test_tunable_round_trip_sorted_and_log_scale():
    params = {
        "b_log": Parameter(10.0, LogScaleUniformPrior(1e-2, 1e4)),
        "a_plain": Parameter(3.0, UniformPrior(0.0, 5.0)),
        "c_fixed": Parameter(7.0, FixedPrior()),
    }
    tunable = get_tunable_parameters(params)
    # sorted by name, fixed skipped
    assert tunable.names == ["a_plain", "b_log"]
    np.testing.assert_allclose(
        np.asarray(tunable.values), [3.0, math.log(10.0)]
    )
    np.testing.assert_allclose(
        np.asarray(tunable.lower_bounds), [0.0, math.log(1e-2)]
    )

    # round trip
    out = set_tunable_params(params, tunable.values)
    assert float(out["a_plain"].value) == pytest.approx(3.0)
    assert float(out["b_log"].value) == pytest.approx(10.0)
    assert float(out["c_fixed"].value) == 7.0

    # bound clamping on the way back in
    clamped = set_tunable_params(params, jnp.asarray([9.0, math.log(1e6)]))
    assert float(clamped["a_plain"].value) == 5.0
    assert float(clamped["b_log"].value) == pytest.approx(1e4)


def test_invalid_parameter_raises():
    params = {"a": Parameter(-1.0, PositivePrior())}
    with pytest.raises(ValueError, match="INVALID PARAMETER"):
        get_tunable_parameters(params)


def test_prior_log_likelihood_sum():
    params = {
        "a": Parameter(1.0, GaussianPrior(0.0, 1.0)),
        "b": Parameter(2.0, UninformativePrior()),
    }
    total = parameter_prior_log_likelihood(params)
    assert float(total) == pytest.approx(
        float(GaussianPrior(0.0, 1.0).log_pdf(1.0))
    )


def test_parameter_is_pytree_leaf_value():
    p = Parameter(2.5, GaussianPrior(0.0, 1.0))
    leaves, treedef = jax.tree_util.tree_flatten(p)
    assert len(leaves) == 1 and float(leaves[0]) == 2.5
    p2 = jax.tree_util.tree_unflatten(treedef, [jnp.asarray(4.0)])
    assert float(p2.value) == 4.0
    assert p2.prior == p.prior


def test_grad_through_set_tunable_params():
    params = {"ls": Parameter(2.0, LogScaleUniformPrior(1e-6, 1e6))}

    def objective(x):
        out = set_tunable_params(params, x)
        return (out["ls"].value - 3.0) ** 2

    x0 = get_tunable_parameters(params).values
    g = jax.grad(objective)(x0)
    # d/dlog(ls) (ls-3)^2 = 2(ls-3)*ls
    assert float(g[0]) == pytest.approx(2 * (2.0 - 3.0) * 2.0)
