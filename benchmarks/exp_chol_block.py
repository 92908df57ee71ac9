"""TPU experiment: blocked-Cholesky block-size sweep + no-assemble NLML.

Round-3 headline-perf probe (VERDICT r2 weak #1: 59.67 TF/s at N=28672 was
flat across rounds).  Measures, at the bench size:

  1. blocked_cholesky_cols wall time vs block_size (auto=3584 at N=28672;
     candidates bracket it) with the fused rhs;
  2. assemble=True vs assemble=False (round-3: the NLML path skips the
     final O(N²) concatenate+tril);
  3. the full model NLML eval (gram included) for the winner, to compare
     against the driver headline.

Run ON TPU only, one process.  N via ALBATROSS_EXP_N (default 28672).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import albatross_tpu as ab
from albatross_tpu.ops.blocked_cholesky import blocked_cholesky_cols

N = int(os.environ.get("ALBATROSS_EXP_N", "28672"))


def chol_flops(n):
    return n**3 / 3.0


def timed(fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.ravel(leaf)[0])  # compile + sync
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.ravel(leaf)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(0.0, 100.0, N)), dtype=jnp.float32)
    kernel = ab.SquaredExponential(0.5, 1.0) + ab.measurement_only(
        ab.IndependentNoise(0.3, assume_unique=True)
    )
    from albatross_tpu.kernels import as_measurement

    K = jax.jit(lambda x: kernel(as_measurement(x)))(x)
    K = K + 1e-4 * jnp.eye(N, dtype=jnp.float32)
    float(K[0, 0])
    y = jnp.asarray(rng.standard_normal(N), dtype=jnp.float32)

    candidates = [b for b in (2048, 2560, 3584, 4096, 4608) if N % b == 0]
    for b in candidates:
        for assemble in (True, False):
            dt = timed(
                lambda: blocked_cholesky_cols(
                    K, block_size=b, rhs=y, assemble=assemble
                )
            )
            print(
                json.dumps(
                    {
                        "metric": f"chol_b{b}_assemble{int(assemble)}",
                        "value": round(chol_flops(N) / dt / 1e12, 2),
                        "unit": f"TF/s ({dt * 1e3:.1f} ms)",
                    }
                ),
                flush=True,
            )

    # full NLML eval for reference (gram + chol + whiten + logdet)
    model = ab.gp_from_covariance(kernel, jitter=1e-4)
    data = ab.RegressionDataset.create(x, jnp.sin(0.3 * x))

    @jax.jit
    def nlml(model, data, prev):
        m = model.set_param_value(
            "squared_exponential_length_scale", jnp.float32(0.5) + 1e-30 * prev
        )
        return -m.log_likelihood(data)

    dt = timed(lambda: nlml(model, data, jnp.float32(0.0)))
    print(
        json.dumps(
            {
                "metric": f"nlml_full_n{N}",
                "value": round((chol_flops(N) + 9 * N * N) / dt / 1e12, 2),
                "unit": f"TF/s ({dt * 1e3:.1f} ms)",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
