"""Sparse-GP (FITC) example.

Mirrors /root/reference/examples/sparse_example.cc: fit a sparse GP with
uniformly spaced inducing points on noisy sinc data and compare against the
exact posterior.

Run:  python examples/sparse.py [--n 150] [--inducing 15]
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
from albatross_tpu.utils import write_to_csv

LOW, HIGH = 3.0, 23.0


def truth(x):
    return 10.0 * jnp.sinc((x - 5.0) / 2.0 / jnp.pi)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=150)
    parser.add_argument("--inducing", type=int, default=15)
    parser.add_argument("--output", default="")
    args = parser.parse_args()

    rng = np.random.default_rng(3)
    x = jnp.asarray(np.sort(rng.uniform(LOW, HIGH, args.n)))
    y = truth(x) + 0.5 * jnp.asarray(rng.standard_normal(args.n))
    data = ab.RegressionDataset.create(x, y)

    kernel = ab.SquaredExponential(2.0, 5.0) + ab.measurement_only(
        ab.IndependentNoise(0.5)
    )
    sparse = ab.sparse_gp_from_covariance(
        kernel,
        inducing_point_strategy=ab.UniformlySpacedInducingPoints(args.inducing),
    )
    dense = ab.gp_from_covariance(kernel)

    xs = jnp.linspace(LOW, HIGH, 101)
    sparse_pred = sparse.fit(data).predict(xs).marginal()
    dense_pred = dense.fit(data).predict(xs).marginal()

    max_err = float(jnp.max(jnp.abs(sparse_pred.mean - dense_pred.mean)))
    print(
        f"n={args.n} inducing={args.inducing}: "
        f"max |sparse - exact| mean = {max_err:.5f}"
    )
    print(f"sparse NLML: {float(-sparse.log_likelihood(data)):.4f}")

    if args.output:
        grid = ab.RegressionDataset.create(xs, truth(xs))
        write_to_csv(args.output, grid, sparse_pred)
        print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
