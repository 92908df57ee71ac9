"""Exact-GP sinc example.

Mirrors /root/reference/examples/sinc_example.cc: learn
y = a·sinc((x−t)/w) + b + m·x from noisy samples with three model modes:

  radial_only — squared-exponential + measurement noise (non-parametric)
  radial      — linear polynomial + squared-exponential + noise
  parametric  — known mean family (linear + sinc), noise-only covariance

Run:  python examples/sinc.py [--mode radial] [--tune] [--n 30]
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
from albatross_tpu.core import LogScaleUniformPrior
from albatross_tpu.evaluation import LeaveOneOutLikelihood
from albatross_tpu.kernels import MeanFunction, Polynomial
from albatross_tpu.core.parameters import Parameter
from albatross_tpu.tuning import get_tuner
from albatross_tpu.utils import write_to_csv

LOW, HIGH = -10.0, 23.0


def sinc_truth(x):
    scaled = (x - 5.0) / 2.0
    return 10.0 * jnp.sinc(scaled / jnp.pi) + 2.0 + 0.1 * x


def make_data(n: int, noise_sd: float, seed: int = 7) -> ab.RegressionDataset:
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.sort(rng.uniform(LOW, HIGH, n)))
    y = sinc_truth(x) + noise_sd * jnp.asarray(rng.standard_normal(n))
    return ab.RegressionDataset.create(x, y)


class SincMean(MeanFunction):
    """Parametric sinc mean (sinc_example_utils.h SincFunction)."""

    def __init__(self, scale=10.0, translation=5.0, width=2.0):
        self.scale = Parameter(scale)
        self.translation = Parameter(translation)
        self.width = Parameter(width)

    @property
    def name(self):
        return "sinc"

    def _mean(self, X):
        x = jnp.asarray(X).reshape(-1)
        scaled = (x - self.translation.value) / self.width.value
        return self.scale.value * jnp.sinc(scaled / jnp.pi)


def build_model(mode: str) -> ab.GaussianProcess:
    noise = ab.IndependentNoise(1.0)
    noise = noise.set_param_prior(
        "sigma_independent_noise", LogScaleUniformPrior(1e-3, 1e2)
    )
    if mode == "radial_only":
        cov = ab.SquaredExponential(3.5, 100.0) + ab.measurement_only(noise)
        return ab.gp_from_covariance(cov)
    if mode == "radial":
        cov = (
            Polynomial(1, sigma=100.0)
            + ab.SquaredExponential(3.5, 5.7)
            + ab.measurement_only(noise)
        )
        return ab.gp_from_covariance(cov)
    if mode == "parametric":
        mean = ab.LinearMean(slope=0.0, offset=0.0) + SincMean()
        return ab.gp_from_covariance_and_mean(
            ab.measurement_only(noise), mean
        )
    raise ValueError(f"unknown mode {mode}")


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--mode",
        default="radial",
        choices=["radial_only", "radial", "parametric"],
    )
    parser.add_argument("--tune", action="store_true")
    parser.add_argument("--n", type=int, default=30)
    parser.add_argument("--output", default="")
    args = parser.parse_args()

    data = make_data(args.n, noise_sd=1.0)
    model = build_model(args.mode)

    if args.tune:
        loo_nll = LeaveOneOutLikelihood()
        model, result = get_tuner(
            model, loo_nll, data, optimizer="lbfgs", max_iterations=100
        ).tuned_model()
        print(f"tuned objective: {result.value:.4f}")

    print(model.pretty_param_details())
    fit_model = model.fit(data)

    xs = jnp.linspace(LOW, HIGH, 201)
    pred = fit_model.predict(xs).marginal()
    rmse = float(jnp.sqrt(jnp.mean((pred.mean - sinc_truth(xs)) ** 2)))
    print(f"mode={args.mode}  prediction-vs-truth RMSE: {rmse:.4f}")
    print(f"NLML: {float(-model.log_likelihood(data)):.4f}")

    if args.output:
        grid = ab.RegressionDataset.create(xs, sinc_truth(xs))
        write_to_csv(args.output, grid, pred)
        print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
