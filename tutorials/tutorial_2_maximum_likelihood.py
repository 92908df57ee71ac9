"""Tutorial 2 — maximum likelihood estimation of hyperparameters.

Mirrors tutorial_2_maximum_likelihood_estimation.ipynb: the marginal
likelihood as a model-selection objective, optimized here with *exact*
gradients through the Cholesky (the reference used nlopt + finite
differences).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import albatross_tpu as ab
from albatross_tpu.core import FixedPrior, LogScaleUniformPrior
from albatross_tpu.evaluation import GaussianProcessNegativeLogLikelihood
from albatross_tpu.tuning import get_tuner


def main():
    rng = np.random.default_rng(4)
    truth_ls, truth_sigma, noise = 2.5, 1.8, 0.2

    n = 50
    x = np.sort(rng.uniform(0, 20, n))
    K = truth_sigma**2 * np.exp(-(((x[:, None] - x[None, :]) / truth_ls) ** 2))
    y = np.linalg.cholesky(K + noise**2 * np.eye(n)) @ rng.standard_normal(n)
    data = ab.RegressionDataset.create(jnp.asarray(x), jnp.asarray(y))

    kernel = ab.SquaredExponential(1.0, 1.0) + ab.measurement_only(
        ab.IndependentNoise(noise)
    )
    # log-scale priors put the optimizer in log space; fixing the noise
    # keeps the problem identifiable for this tutorial
    kernel = (
        kernel.set_param_prior(
            "squared_exponential_length_scale", LogScaleUniformPrior(1e-2, 1e3)
        )
        .set_param_prior(
            "sigma_squared_exponential", LogScaleUniformPrior(1e-2, 1e3)
        )
        .set_param_prior("sigma_independent_noise", FixedPrior())
    )
    model = ab.gp_from_covariance(kernel)
    metric = GaussianProcessNegativeLogLikelihood()

    # --- the NLML surface is differentiable end-to-end --------------------
    grads = jax.grad(lambda m: metric(data, m))(model)
    print("exact dNLML/dparams at the start:")
    for name, p in sorted(grads.get_params().items()):
        if not model.get_params()[name].is_fixed:
            print(f"  {name}: {float(p.value):+.4f}")

    print(f"\nNLML before: {float(metric(data, model)):.4f}")
    tuned, result = get_tuner(
        model, metric, data, optimizer="lbfgs", max_iterations=100
    ).tuned_model()
    print(f"NLML after : {result.value:.4f}")
    ls = float(tuned.get_params()["squared_exponential_length_scale"].value)
    sig = float(tuned.get_params()["sigma_squared_exponential"].value)
    print(f"recovered length_scale={ls:.3f} (truth {truth_ls})")
    print(f"recovered sigma       ={sig:.3f} (truth {truth_sigma})")
    assert abs(np.log(ls / truth_ls)) < 0.7
    assert abs(np.log(sig / truth_sigma)) < 0.7


if __name__ == "__main__":
    main()
