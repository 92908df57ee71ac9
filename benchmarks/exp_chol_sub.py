"""TPU experiment: panel_sub and fine block-size sweep at the round-3
operating point (b=2048, assemble=False NLML path).

Follow-up to exp_chol_block.py after b=2048 won: the two-level panel
inverse's sub-block size (default 512) and the 1792/2048/2560 block
neighborhood are the remaining knobs.

Run ON TPU only.  N via ALBATROSS_EXP_N (default 28672).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import albatross_tpu as ab
from albatross_tpu.kernels import as_measurement
from albatross_tpu.ops.blocked_cholesky import blocked_cholesky_cols

N = int(os.environ.get("ALBATROSS_EXP_N", "28672"))


def timed(fn, reps=3):
    out = fn()
    float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(0.0, 100.0, N)), dtype=jnp.float32)
    kernel = ab.SquaredExponential(0.5, 1.0) + ab.measurement_only(
        ab.IndependentNoise(0.3, assume_unique=True)
    )
    K = jax.jit(lambda x: kernel(as_measurement(x)))(x)
    K = K + 1e-4 * jnp.eye(N, dtype=jnp.float32)
    float(K[0, 0])
    y = jnp.asarray(rng.standard_normal(N), dtype=jnp.float32)
    flops = N**3 / 3.0

    for b in (1792, 2048, 2560):
        if N % b != 0:
            continue
        for sub in (256, 512, None):
            if sub is not None and b % sub != 0:
                continue
            dt = timed(
                lambda: blocked_cholesky_cols(
                    K, block_size=b, rhs=y, assemble=False, panel_sub=sub
                )
            )
            print(
                json.dumps(
                    {
                        "metric": f"chol_b{b}_sub{sub}",
                        "value": round(flops / dt / 1e12, 2),
                        "unit": f"TF/s ({dt * 1e3:.1f} ms)",
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
