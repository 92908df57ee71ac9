"""Model-inspection example.

Mirrors /root/reference/examples/inspection.cc and call_trace_example.cc:
introspect a composed covariance (call trace with per-node values), dump
parameters/priors, and diagnose an ill-conditioned covariance via its
eigen directions.

Run:  python examples/inspection.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import albatross_tpu as ab
from albatross_tpu.ops.diagnostics import print_small_eigen_directions


def main() -> int:
    kernel = (
        ab.Constant(3.0)
        + ab.SquaredExponential(2.0, 1.5) * ab.Exponential(5.0, 1.0)
        + ab.measurement_only(ab.IndependentNoise(0.2))
    )
    model = ab.gp_from_covariance(kernel)

    print("=== kernel expression ===")
    print(kernel.name)

    print("\n=== call trace at (x=1.0, y=2.5) ===")
    print(kernel.call_trace(1.0, 2.5).pretty())

    print("\n=== call trace for a TRAINING pair (Measurement-tagged) ===")
    # the measurement_only noise term is live between Measurement features
    # (call_trace.hpp walks the same caller chain the gram build uses)
    m = ab.kernels.as_measurement
    print(kernel.call_trace(m(1.0), m(1.0)).pretty())

    print("\n=== parameters ===")
    print(model.pretty_param_details())

    print("=== priors ===")
    from albatross_tpu.core import pretty_priors

    print(pretty_priors(model.get_params()))

    # record run metadata in the insights side channel (model.hpp Insights)
    model.insights["example"] = "inspection"
    model.insights["kernel"] = kernel.name
    print("insights:", dict(model.insights))

    print("\n=== diagnosing an ill-conditioned covariance ===")
    # nearly-duplicated inputs with no noise -> near-singular gram
    x = jnp.asarray([1.0, 1.0 + 1e-9, 5.0, 9.0])
    K = ab.SquaredExponential(2.0, 1.0)(x)
    print(print_small_eigen_directions(K, k=1, top_entries=4))
    print(
        "the smallest eigenvector loads on indices 0/1 — the "
        "nearly-duplicate features."
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
