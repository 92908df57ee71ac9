"""Tutorial 3 — sparse (inducing point) Gaussian processes.

Mirrors tutorial_3_one_dimension_sparse.ipynb: FITC/PITC approximations,
how the inducing-point count trades accuracy for cost, and online updates.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import albatross_tpu as ab
from albatross_tpu.indexing import KFoldGrouper


def main():
    rng = np.random.default_rng(9)
    n = 400
    x = jnp.asarray(np.sort(rng.uniform(0, 30, n)))
    y = jnp.sin(x) + 0.2 * jnp.asarray(rng.standard_normal(n))
    data = ab.RegressionDataset.create(x, y)
    xs = jnp.linspace(0, 30, 61)

    kernel = ab.SquaredExponential(2.0, 1.0) + ab.measurement_only(
        ab.IndependentNoise(0.2)
    )
    exact = ab.gp_from_covariance(kernel)
    t0 = time.perf_counter()
    exact_pred = exact.fit(data).predict(xs).marginal()
    t_exact = time.perf_counter() - t0

    # --- accuracy vs number of inducing points -----------------------------
    print("inducing points -> max |sparse - exact| posterior mean")
    for m in (5, 10, 20, 40):
        sparse = ab.sparse_gp_from_covariance(
            kernel,
            inducing_point_strategy=ab.UniformlySpacedInducingPoints(m),
        )
        pred = sparse.fit(data).predict(xs).marginal()
        err = float(jnp.max(jnp.abs(pred.mean - exact_pred.mean)))
        print(f"  m={m:3d}: {err:.5f}")

    # --- PITC: grouped residual blocks ------------------------------------
    pitc = ab.sparse_gp_from_covariance(
        kernel,
        grouper=KFoldGrouper(40),
        inducing_point_strategy=ab.UniformlySpacedInducingPoints(20),
    )
    pred = pitc.fit(data).predict(xs).marginal()
    print(
        "PITC (40 blocks, 20 inducing): max err "
        f"{float(jnp.max(jnp.abs(pred.mean - exact_pred.mean))):.5f}"
    )

    # --- online updates: stream data in two halves -------------------------
    sparse = ab.sparse_gp_from_covariance(
        kernel,
        inducing_point_strategy=lambda cov, feats: jnp.linspace(0, 30, 20),
    )
    first = data[jnp.arange(200)]
    second = data[jnp.arange(200, n)]
    streamed = sparse.fit(first).update(second)
    batch = sparse.fit(data)
    err = float(
        jnp.max(
            jnp.abs(
                streamed.predict(xs).mean() - batch.predict(xs).mean()
            )
        )
    )
    print(f"online update vs batch fit: max |diff| = {err:.2e}")
    assert err < 1e-6

    # --- rebasing inducing points ------------------------------------------
    rebased = ab.rebase_inducing_points(batch, jnp.linspace(0, 30, 30))
    err = float(
        jnp.max(jnp.abs(rebased.predict(xs).mean() - batch.predict(xs).mean()))
    )
    print(f"rebase onto denser grid: max |diff| = {err:.4f}")


if __name__ == "__main__":
    main()
