"""TPU A/B: the two round-4-skipped headline levers (VERDICT r4 next #1).

Variants of the full NLML pipeline (gram -> blocked Cholesky -> whiten ->
log-det) at the headline operating point:

  baseline        right-looking, materialized covariance (the shipping path)
  right_fused     lazy gram columns: column j's gram is built at its first
                  trailing update, so the N^2 covariance never gets its own
                  HBM write and the VPU exp work overlaps the MXU GEMM
                  schedule ("gram/panel overlap")
  bf16            factored panels stored at bf16 for the G-k trailing
                  re-reads (halves the factorization's dominant HBM term;
                  numerically ~a wash: default f32 GEMMs already round
                  inputs to one bf16 MXU pass)
  fused+bf16      both

Each variant's NLML is printed alongside its rate so an accuracy cliff
cannot hide.  Run ON TPU only:  python -m benchmarks.exp_fused_overlap
N via ALBATROSS_EXP_N (default 28672); results appended as JSON lines to
benchmarks/FUSED_OVERLAP.json.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import albatross_tpu as ab
from albatross_tpu import config

N = int(os.environ.get("ALBATROSS_EXP_N", "28672"))
R = 6


def nlml_flops(n):
    return n**3 / 3.0 + n * n + 8.0 * n * n


def main():
    t0 = time.perf_counter()
    z = jnp.ones((256, 256), jnp.float32)
    float((z @ z)[0, 0])
    probe = time.perf_counter() - t0
    print(f"tunnel probe: {probe:.1f}s", flush=True)

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

    def measure(tag, algorithm, bf16):
        prev_alg = config.CHOLESKY_ALGORITHM
        prev_b16 = config.CHOLESKY_TRAILING_BF16
        config.CHOLESKY_ALGORITHM = algorithm
        config.CHOLESKY_TRAILING_BF16 = bf16
        try:
            # fresh jit per variant: the outer trace reads config eagerly
            # and threads the knobs as STATIC args into the inner programs
            # (the round-4 "knob read inside a cached trace" pitfall)
            @jax.jit
            def nlml_step(model, data, prev):
                m = model.set_param_value(
                    "squared_exponential_length_scale",
                    jnp.float32(0.5) + 1e-30 * prev,
                )
                return -m.log_likelihood(data)

            t0 = time.perf_counter()
            prev = nlml_step(model, data, jnp.float32(0.0))
            val = float(prev)
            compile_s = time.perf_counter() - t0
            if not np.isfinite(val):
                rec = {"variant": tag, "n": N, "nlml": val, "status": "nan"}
                print(json.dumps(rec), flush=True)
                return rec

            def batch():
                p = jnp.float32(0.0)
                t0 = time.perf_counter()
                for _ in range(R):
                    p = nlml_step(model, data, p)
                float(p)
                return (time.perf_counter() - t0) / R

            batch()
            per_eval = min(batch() for _ in range(3))
            tf = nlml_flops(N) / per_eval / 1e12
            rec = {
                "variant": tag,
                "n": N,
                "tflops": round(tf, 2),
                "ms_per_eval": round(per_eval * 1e3, 2),
                "nlml": val,
                "compile_s": round(compile_s, 1),
            }
            print(json.dumps(rec), flush=True)
            return rec
        finally:
            config.CHOLESKY_ALGORITHM = prev_alg
            config.CHOLESKY_TRAILING_BF16 = prev_b16

    recs = [{"probe_s": round(probe, 1), "n": N}]
    recs.append(measure("baseline", "right", False))
    recs.append(measure("right_fused", "right_fused", False))
    recs.append(measure("bf16", "right", True))
    recs.append(measure("fused+bf16", "right_fused", True))
    # re-run baseline to expose tunnel drift within the session
    recs.append(measure("baseline_again", "right", False))
    out = os.path.join(os.path.dirname(__file__), "FUSED_OVERLAP.json")
    with open(out, "w") as fh:
        json.dump(recs, fh, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
