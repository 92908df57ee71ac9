"""Benchmark: exact-GP NLML-evaluation throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: R full NLML evaluations (gram → blocked Cholesky → whitening →
log-det) at different hyperparameters inside ONE jitted scan — the inner loop
of marginal-likelihood optimization and MCMC, and the reference's hot path
(/root/reference/benchmarks/bench_gram.cc defines the equivalent cases; no
numbers are published).  Iterating inside jit amortizes the ~28 ms
host↔device round trip of the tunneled backend, so the number reflects chip
throughput, not link latency.

Headline value: achieved TFLOP/s of the pipeline; ``vs_baseline`` is the
ratio against the north-star target of 60% of f32 peak (BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

N = 8192
R = 10  # NLML evaluations per timed call
PEAK_F32_TFLOPS = 49.2
TARGET_FRACTION = 0.6


def nlml_flops(n: int) -> float:
    cholesky = n**3 / 3.0
    whiten = n * n
    gram = 8.0 * n * n
    return cholesky + whiten + gram


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import albatross_tpu as ab
    from albatross_tpu.models.gp import negative_log_likelihood
    from albatross_tpu.ops.linalg import CholeskyFactor

    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(0.0, 100.0, N)), dtype=jnp.float32)
    y = jnp.sin(0.3 * x) + 0.1 * jnp.asarray(
        rng.standard_normal(N), dtype=jnp.float32
    )

    kernel = ab.SquaredExponential(0.5, 1.0) + ab.measurement_only(
        ab.IndependentNoise(0.3, assume_unique=True)
    )
    model = ab.gp_from_covariance(kernel, jitter=1e-4)
    data = ab.RegressionDataset.create(x, y)
    length_scales = jnp.linspace(0.4, 0.6, R, dtype=jnp.float32)

    @jax.jit
    def nlml_sweep(model, data, length_scales):
        def body(carry, ls):
            m = model.set_param_value("squared_exponential_length_scale", ls)
            return carry, -m.log_likelihood(data)

        _, nlmls = jax.lax.scan(body, 0.0, length_scales)
        return nlmls

    out = nlml_sweep(model, data, length_scales)
    first = float(out[0])  # force sync (block_until_ready lies on the tunnel)
    if not np.isfinite(first):
        raise RuntimeError("non-finite NLML in benchmark")

    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = nlml_sweep(model, data, length_scales)
        float(out[-1])
        times.append(time.perf_counter() - t0)
    best = min(times)

    per_eval = best / R
    tflops = nlml_flops(N) / per_eval / 1e12
    result = {
        "metric": f"exact_gp_nlml_tflops_n{N}",
        "value": round(tflops, 4),
        "unit": f"TFLOP/s ({1.0 / per_eval:.2f} NLML evals/s)",
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
