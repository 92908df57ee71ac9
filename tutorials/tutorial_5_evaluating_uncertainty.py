"""Tutorial 5 — evaluating predictive uncertainty.

Mirrors tutorial_5_evaluating_uncertainty.ipynb: a model's mean can look
fine while its uncertainty is badly calibrated.  Proper scoring rules (NLL,
CRPS), the chi²-CDF statistic, and held-out evaluation expose that.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import albatross_tpu as ab
from albatross_tpu.evaluation import (
    ChiSquaredCdf,
    Crps,
    NegativeLogLikelihood,
)
from albatross_tpu.indexing import KFoldGrouper


def main():
    rng = np.random.default_rng(21)
    n = 60
    x = jnp.asarray(np.sort(rng.uniform(0, 20, n)))
    noise = 0.3
    y = jnp.sin(x) + noise * jnp.asarray(rng.standard_normal(n))
    data = ab.RegressionDataset.create(x, y)

    def model_with_noise(sigma_noise):
        return ab.gp_from_covariance(
            ab.SquaredExponential(2.0, 1.0)
            + ab.measurement_only(ab.IndependentNoise(sigma_noise))
        )

    grouper = KFoldGrouper(6)
    print(
        "noise assumption -> held-out NLL / CRPS / chi2-CDF "
        f"(true noise {noise})"
    )
    rows = []
    for sigma in (0.03, 0.3, 3.0):
        model = model_with_noise(sigma)
        cv = model.cross_validate()
        nll = float(
            jnp.sum(cv.scores(NegativeLogLikelihood(), data, grouper))
        )
        crps = float(jnp.mean(cv.scores(Crps(), data, grouper)))
        chi2 = float(jnp.mean(cv.scores(ChiSquaredCdf(), data, grouper)))
        rows.append((sigma, nll, crps, chi2))
        print(
            f"  sigma={sigma:5.2f}: NLL={nll:8.2f}  CRPS={crps:.4f}  "
            f"chi2-CDF={chi2:.3f}"
        )

    # the well-specified model wins on the proper scores, and its chi²-CDF
    # sits away from the 0/1 extremes (overconfident models pile up at 1)
    nlls = [r[1] for r in rows]
    assert nlls[1] == min(nlls), "true noise level should minimize NLL"
    assert rows[0][3] > rows[1][3], "overconfident model has extreme chi2"
    print(
        "\nthe correctly specified model minimizes held-out NLL and keeps "
        "the chi2 statistic calibrated."
    )


if __name__ == "__main__":
    main()
