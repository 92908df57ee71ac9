"""Spatial temperature-field example.

Mirrors /root/reference/examples/temperature_example/temperature_example.cc:
a GP over weather stations with the composed covariance

    elevation_scaled(Constant) + IndependentNoise
    + Exponential[angular] * SquaredExponential[radial]

Stations are (ECEF x, y, z, elevation) feature rows; the angular term decays
with great-circle separation, the radial term with height difference, and the
elevation scaling biases the constant mean colder at altitude.  The reference
uses GSOD data; with zero egress this example *synthesizes* a comparable
station set from a ground-truth temperature field, then evaluates LOO
cross-validation skill.

Run:  python examples/temperature.py [--stations 120]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

import albatross_tpu as ab
from albatross_tpu.evaluation import RootMeanSquareError
from albatross_tpu.indexing import LeaveOneOutGrouper
from albatross_tpu.kernels import (
    AngularDistance,
    RadialDistance,
    ScalingFunction,
)
from albatross_tpu.kernels.distances import DistanceMetric
from albatross_tpu.core.parameters import Parameter
from albatross_tpu.core.priors import FixedPrior

EARTH_RADIUS = 6371e3


# -- station features: columns [x, y, z, elevation] --------------------------
@dataclasses.dataclass(frozen=True)
class StationDistance(DistanceMetric):
    """Applies an inner metric to the ECEF block of station rows
    (temperature_example/temperature_example.cc StationDistance)."""

    inner: DistanceMetric

    @property
    def name(self):
        return f"station[{self.inner.name}]"

    def pairwise(self, X, Y):
        return self.inner.pairwise(
            jnp.asarray(X)[:, :3], jnp.asarray(Y)[:, :3]
        )

    def diag(self, X):
        return self.inner.diag(jnp.asarray(X)[:, :3])


class ElevationScalingFunction(ScalingFunction):
    """1 + factor · max(0, center − elevation)
    (temperature_example ElevationScalingFunction)."""

    def __init__(self, center=1000.0, factor=3.5 / 300.0):
        self.elevation_scaling_center = Parameter(center, FixedPrior())
        self.elevation_scaling_factor = Parameter(factor, FixedPrior())

    @property
    def name(self):
        return "elevation_scaled"

    def _scale(self, X):
        elevation = jnp.asarray(X)[:, 3]
        return 1.0 + self.elevation_scaling_factor.value * jnp.maximum(
            0.0, self.elevation_scaling_center.value - elevation
        )


def lla_to_station(lat_deg, lon_deg, elevation):
    lat, lon = np.radians(lat_deg), np.radians(lon_deg)
    r = EARTH_RADIUS + elevation
    return np.stack(
        [
            r * np.cos(lat) * np.cos(lon),
            r * np.cos(lat) * np.sin(lon),
            r * np.sin(lat),
            elevation,
        ],
        axis=1,
    )


def synthesize_stations(n: int, rng):
    """Ground truth: a smooth latitudinal gradient + lapse-rate cooling."""
    lat = rng.uniform(32.0, 42.0, n)
    lon = rng.uniform(-115.0, -100.0, n)
    elevation = np.abs(rng.normal(800.0, 700.0, n))
    truth = (
        25.0
        - 0.7 * (lat - 32.0)
        + 2.0 * np.sin(np.radians(8.0 * lon))
        - 6.5e-3 * elevation  # standard atmospheric lapse rate
    )
    obs = truth + rng.normal(0.0, 1.0, n)
    return lla_to_station(lat, lon, elevation), obs, truth


def build_model() -> ab.GaussianProcess:
    noise = ab.IndependentNoise(2.0)
    mean = ab.Constant(1.5)
    elevation_scalar = ab.ScalingTerm(ElevationScalingFunction())
    elevation_scaled_mean = elevation_scalar * mean

    radial_sqr_exp = ab.SquaredExponential(
        15000.0, 2.5, distance_metric=StationDistance(RadialDistance())
    )
    angular_exp = ab.Exponential(
        9e-2, 3.5, distance_metric=StationDistance(AngularDistance())
    )
    spatial_cov = angular_exp * radial_sqr_exp

    covariance = elevation_scaled_mean + ab.measurement_only(noise) + spatial_cov
    model = ab.gp_from_covariance(covariance)
    # the reference fixes the already-tuned parameters (temperature_example.cc:65)
    model = model.set_param("sigma_exponential", Parameter(3.5, FixedPrior()))
    return model


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--stations", type=int, default=120)
    args = parser.parse_args()

    rng = np.random.default_rng(11)
    stations, obs, truth = synthesize_stations(args.stations, rng)
    data = ab.RegressionDataset.create(
        jnp.asarray(stations),
        jnp.asarray(obs),
        variance=jnp.full((args.stations,), 1.0),
    )

    model = build_model()
    print(f"kernel: {model.covariance_function.name}")

    # LOO cross-validation skill (the reference evaluates the same way)
    cv = model.cross_validate()
    marginal = cv.predict(data, LeaveOneOutGrouper()).marginal()
    loo_rmse = float(
        jnp.sqrt(jnp.mean((marginal.mean - data.targets.mean) ** 2))
    )
    climatology_rmse = float(jnp.std(data.targets.mean))
    print(f"LOO RMSE: {loo_rmse:.3f} °C  (climatology {climatology_rmse:.3f})")

    # predict a dense grid at sea level for visualization
    glat, glon = np.meshgrid(
        np.linspace(32, 42, 12), np.linspace(-115, -100, 12)
    )
    grid = lla_to_station(glat.ravel(), glon.ravel(), np.zeros(glat.size))
    pred = model.fit(data).predict(jnp.asarray(grid)).marginal()
    print(
        f"grid prediction range: [{float(jnp.min(pred.mean)):.1f}, "
        f"{float(jnp.max(pred.mean)):.1f}] °C, "
        f"mean stddev {float(jnp.mean(jnp.sqrt(pred.variance))):.2f}"
    )
    assert loo_rmse < climatology_rmse, "GP should beat climatology"

    # --- RANSAC outlier rejection (BASELINE temperature config) -----------
    import albatross_tpu as ab_  # noqa: F401  (clarity)
    from albatross_tpu.models import DefaultGPRansacStrategy, ransac_success

    bad = np.asarray(data.targets.mean).copy()
    bad_idx = rng.choice(args.stations, 4, replace=False)
    bad[bad_idx] += rng.choice([-1, 1], 4) * rng.uniform(15.0, 25.0, 4)
    contaminated = ab.RegressionDataset.create(
        data.features, jnp.asarray(bad), variance=data.targets.variance
    )
    config = ab.RansacConfig(
        inlier_threshold=4.0,
        random_sample_size=8,
        min_consensus_size=int(0.7 * args.stations),
        max_iterations=12,
        max_failed_candidates=12,
    )
    rfit = model.ransac(DefaultGPRansacStrategy(), config).fit(contaminated)
    out = rfit.fit.ransac_output
    rejected = sorted(set(range(args.stations)) - set(out.best.consensus()))
    print(
        f"RANSAC: {out.return_code.name}, rejected stations {rejected} "
        f"(injected outliers at {sorted(int(i) for i in bad_idx)})"
    )
    assert ransac_success(out.return_code)
    caught = set(int(i) for i in bad_idx) & set(rejected)
    # an isolated station's outlier can be statistically unidentifiable at
    # low station counts, so require most (not all) injected outliers caught
    assert len(caught) >= 3, f"only caught {sorted(caught)}"
    return 0


if __name__ == "__main__":
    sys.exit(main())
