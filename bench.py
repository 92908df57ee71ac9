"""Benchmark: exact-GP fit+predict pipeline throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The measured pipeline is the reference's hot path (gram → Cholesky →
solves → predictions → NLML; /root/reference/benchmarks/bench_gram.cc defines
the equivalent cases at n=256..2048 with no recorded numbers).  The headline
number is achieved TFLOP/s of the fused fit+predict step;
``vs_baseline`` is the ratio against the north-star target of 60% of f32
peak on this chip (BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

N = 8192
M_PRED = 512
# v5e single-chip peak: ~197 TFLOP/s bf16, ~49 TFLOP/s fp32
PEAK_F32_TFLOPS = 49.2
TARGET_FRACTION = 0.6


def pipeline_flops(n: int, m: int) -> float:
    cholesky = n**3 / 3.0
    info_solve = 2.0 * n * n
    predict_solve = 2.0 * n * n * m
    gram = 8.0 * n * n  # matmul trick + elementwise epilogue, D=1
    cross = 8.0 * n * m
    return cholesky + info_solve + predict_solve + gram + cross


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import albatross_tpu as ab

    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(0.0, 100.0, N)), dtype=jnp.float32)
    y = jnp.sin(0.3 * x) + 0.1 * jnp.asarray(
        rng.standard_normal(N), dtype=jnp.float32
    )
    xs = jnp.linspace(0.0, 100.0, M_PRED, dtype=jnp.float32)

    kernel = ab.SquaredExponential(5.0, 1.0) + ab.measurement_only(
        ab.IndependentNoise(0.1, assume_unique=True)
    )
    model = ab.gp_from_covariance(kernel, jitter=1e-5)

    @jax.jit
    def fit_predict_nlml(model, x, y, xs):
        data = ab.RegressionDataset.create(x, y)
        fit_model = model.fit(data)
        marginal = fit_model.predict(xs).marginal()
        chol = fit_model.fit.train_covariance
        white = chol.sqrt_solve(y)
        nlml = 0.5 * (
            chol.log_determinant()
            + jnp.sum(white * white)
            + N * jnp.log(2.0 * jnp.pi)
        )
        return marginal.mean, marginal.variance, nlml

    # warm-up / compile.  NB: block_until_ready does not reliably synchronize
    # on the tunneled (axon) backend — force a host transfer instead.
    out = fit_predict_nlml(model, x, y, xs)
    float(out[2])

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fit_predict_nlml(model, x, y, xs)
        float(out[0][0]), float(out[2])
        times.append(time.perf_counter() - t0)
    best = min(times)

    tflops = pipeline_flops(N, M_PRED) / best / 1e12
    result = {
        "metric": f"exact_gp_fit_predict_nlml_tflops_n{N}",
        "value": round(tflops, 4),
        "unit": "TFLOP/s",
        "vs_baseline": round(tflops / (TARGET_FRACTION * PEAK_F32_TFLOPS), 4),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception as exc:  # surface a parseable failure line
        print(
            json.dumps(
                {
                    "metric": "bench_error",
                    "value": 0.0,
                    "unit": str(exc)[:200],
                    "vs_baseline": 0.0,
                }
            )
        )
        sys.exit(1)
