"""Ensemble-MCMC example.

Mirrors /root/reference/examples/sampler_example.cc: coarse-tune an exact GP,
then sample its hyperparameter posterior with the affine-invariant ensemble
sampler, writing per-iteration chains to CSV.

Run:  python examples/sampler.py [--walkers 16] [--iterations 200]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

import albatross_tpu as ab
from albatross_tpu.core import FixedPrior, LogScaleUniformPrior
from albatross_tpu.evaluation import GaussianProcessNegativeLogLikelihood
from albatross_tpu.samplers import (
    CsvWritingCallback,
    MaximumLikelihoodTrackingCallback,
    ensemble_sampler_from_model,
)
from albatross_tpu.tuning import get_tuner


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=40)
    parser.add_argument("--walkers", type=int, default=16)
    parser.add_argument("--iterations", type=int, default=200)
    parser.add_argument("--burn-in", type=int, default=100)
    parser.add_argument("--output", default="sampler_chains.csv")
    args = parser.parse_args()

    rng = np.random.default_rng(5)
    x = jnp.asarray(np.sort(rng.uniform(0.0, 20.0, args.n)))
    truth_ls, truth_sigma, noise_sd = 3.0, 2.0, 0.3
    K = truth_sigma**2 * np.exp(
        -(((np.asarray(x)[:, None] - np.asarray(x)[None, :]) / truth_ls) ** 2)
    ) + noise_sd**2 * np.eye(args.n)
    y = jnp.asarray(
        np.linalg.cholesky(K + 1e-12 * np.eye(args.n))
        @ rng.standard_normal(args.n)
    )
    data = ab.RegressionDataset.create(x, y)

    kernel = ab.SquaredExponential(1.0, 1.0) + ab.measurement_only(
        ab.IndependentNoise(noise_sd)
    )
    kernel = kernel.set_param_prior(
        "squared_exponential_length_scale", LogScaleUniformPrior(1e-2, 1e3)
    ).set_param_prior(
        "sigma_squared_exponential", LogScaleUniformPrior(1e-2, 1e3)
    ).set_param_prior("sigma_independent_noise", FixedPrior())
    model = ab.gp_from_covariance(kernel)

    # tune to a good starting point first (sampler_example.cc does the same)
    metric = GaussianProcessNegativeLogLikelihood()
    model, result = get_tuner(
        model, metric, data, optimizer="lbfgs", max_iterations=60
    ).tuned_model()
    print(f"tuned NLML: {result.value:.4f}")

    tracker = MaximumLikelihoodTrackingCallback()
    with open(args.output, "w", newline="") as stream:
        names = [
            n for n in sorted(model.get_params())
            if not model.get_params()[n].is_fixed
        ]
        csv_cb = CsvWritingCallback(stream, names)

        def callback(i, state):
            tracker(i, state)
            csv_cb(i, state)

        chain = ensemble_sampler_from_model(
            model,
            data,
            n_walkers=args.walkers,
            max_iterations=args.iterations,
            key=42,
            callback=callback,
        )

    samples = chain.flat_samples(burn_in=args.burn_in)
    ls_idx = names.index("squared_exponential_length_scale")
    sig_idx = names.index("sigma_squared_exponential")
    post_ls = np.exp(samples[:, ls_idx])
    post_sig = np.exp(samples[:, sig_idx])
    print(f"acceptance rate: {chain.acceptance_rate():.2f}")
    print(
        f"posterior length_scale: median {np.median(post_ls):.3f} "
        f"90% CI [{np.quantile(post_ls, 0.05):.3f}, "
        f"{np.quantile(post_ls, 0.95):.3f}]  (truth {truth_ls})"
    )
    print(
        f"posterior sigma: median {np.median(post_sig):.3f} "
        f"90% CI [{np.quantile(post_sig, 0.05):.3f}, "
        f"{np.quantile(post_sig, 0.95):.3f}]  (truth {truth_sigma})"
    )
    print(f"max log-prob {tracker.best_log_prob:.4f} at iteration "
          f"{tracker.best_iteration}; chains -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
