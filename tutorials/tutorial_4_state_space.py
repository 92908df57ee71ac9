"""Tutorial 4 — the state-space (Markov) view of one-dimensional GPs.

Mirrors tutorial_4_kalman_fliter_equivalent.ipynb: a Matern-type GP on a
1-D ordered input is a Markov process, so sequential conditioning (one
observation at a time — exactly what a Kalman filter does) must reproduce
the batch posterior.  Here we demonstrate the equivalence with the
framework's *online update* machinery standing in for the filter recursion.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import albatross_tpu as ab


def main():
    rng = np.random.default_rng(12)
    n = 30
    x = jnp.asarray(np.sort(rng.uniform(0, 10, n)))
    y = jnp.sin(x) + 0.1 * jnp.asarray(rng.standard_normal(n))
    data = ab.RegressionDataset.create(
        x, y, variance=jnp.full((n,), 0.01)
    )

    # Matern 3/2 = the Markov process of order 2 (position + derivative)
    kernel = ab.Matern32(2.0, 1.0) + ab.IndependentNoise(0.1)
    model = ab.gp_from_covariance(kernel)

    # --- batch posterior ----------------------------------------------------
    xs = jnp.linspace(0, 10, 21)
    batch = model.fit(data).predict(xs).marginal()

    # --- "filter": absorb observations strictly one at a time --------------
    fit_model = model.fit(data[jnp.asarray([0])])
    for i in range(1, n):
        fit_model = fit_model.update(data[jnp.asarray([i])])
    filtered = fit_model.predict(xs).marginal()

    err_mean = float(jnp.max(jnp.abs(filtered.mean - batch.mean)))
    err_var = float(jnp.max(jnp.abs(filtered.variance - batch.variance)))
    print(f"sequential vs batch: max |mean diff| = {err_mean:.2e}")
    print(f"sequential vs batch: max |var  diff| = {err_var:.2e}")
    assert err_mean < 1e-8 and err_var < 1e-8
    print("the recursive (Kalman-style) and batch GP posteriors agree.")

    # --- the smoother view: predictions at interior points use ALL data ----
    half = model.fit(data[jnp.arange(n // 2)]).predict(xs).marginal()
    improved = np.asarray(batch.variance) <= np.asarray(half.variance) + 1e-12
    print(
        f"full-data (smoother) variance <= half-data variance at "
        f"{int(improved.sum())}/{len(improved)} query points"
    )


if __name__ == "__main__":
    main()
