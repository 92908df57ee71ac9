"""Tutorial 1 — Gaussian processes in one dimension.

Mirrors tutorial_1_one_dimension.ipynb in the reference: build intuition
for priors, conditioning, and kernel choices on a 1-D problem.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import albatross_tpu as ab
from albatross_tpu.utils import sample_mvn


def main():
    rng = np.random.default_rng(0)

    # --- 1. A GP prior is a distribution over functions -------------------
    xs = jnp.linspace(0.0, 10.0, 101)
    kernel = ab.SquaredExponential(length_scale=1.5, sigma=1.0)
    model = ab.gp_from_covariance(
        kernel + ab.measurement_only(ab.IndependentNoise(0.1)), jitter=1e-10
    )
    prior = model.prior(xs)
    draws = sample_mvn(jax.random.PRNGKey(1), prior, num_samples=3)
    print("three prior draws, first five values each:")
    print(np.round(np.asarray(draws)[:, :5], 3))

    # --- 2. Conditioning on data ------------------------------------------
    x_train = jnp.asarray(np.sort(rng.uniform(0, 10, 12)))
    y_train = jnp.sin(x_train) + 0.1 * jnp.asarray(rng.standard_normal(12))
    data = ab.RegressionDataset.create(x_train, y_train)

    pred = model.fit(data).predict(xs).marginal()
    stddev = np.sqrt(np.asarray(pred.variance))
    print(
        f"\nposterior: rmse vs sin(x) = "
        f"{float(jnp.sqrt(jnp.mean((pred.mean - jnp.sin(xs)) ** 2))):.3f}, "
        f"stddev range [{stddev.min():.3f}, {stddev.max():.3f}]"
    )
    # uncertainty collapses near data and grows away from it
    near = np.argmin(np.abs(np.asarray(xs) - float(x_train[5])))
    assert stddev[near] < stddev[0]

    # --- 3. The length scale controls wiggliness --------------------------
    for ls in (0.3, 1.5, 8.0):
        m = model.set_param_value("squared_exponential_length_scale", ls)
        p = m.fit(data).predict(xs).marginal()
        rmse = float(jnp.sqrt(jnp.mean((p.mean - jnp.sin(xs)) ** 2)))
        print(f"length_scale={ls:4.1f}: rmse={rmse:.3f}")

    # --- 4. Composition: trends + local structure --------------------------
    trend_kernel = (
        ab.Polynomial(1, sigma=10.0)
        + ab.SquaredExponential(1.0, 0.5)
        + ab.measurement_only(ab.IndependentNoise(0.1))
    )
    y_trend = 0.5 * x_train + jnp.sin(2 * x_train)
    trend_data = ab.RegressionDataset.create(x_train, y_trend)
    p = ab.gp_from_covariance(trend_kernel).fit(trend_data).predict(xs).marginal()
    print(
        "\ncomposed kernel recovers trend+wiggle: rmse="
        f"{float(jnp.sqrt(jnp.mean((p.mean - (0.5 * xs + jnp.sin(2 * xs))) ** 2))):.3f}"
    )


if __name__ == "__main__":
    main()
