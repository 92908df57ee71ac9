"""N≈100k feasibility artifact: compile the 2-D tile-sharded NLML and
report per-device memory (BASELINE.md north star: exact GP at N=100k on a
v5p-16 pod slice).

Real 100k execution needs multi-chip hardware this environment does not
have; what CAN be pinned down today is the compiled memory footprint: XLA's
memory analysis of the fully-lowered program on a 16-device virtual mesh
(the v5p-16 shape).  A per-device peak under the v5p HBM budget (95 GB) —
or even the v5e budget (16 GB) — makes the 100k claim a compile-checked
fact rather than an extrapolation.

Runs on CPU with XLA_FLAGS=--xla_force_host_platform_device_count=16; no
buffers are allocated (compile + static analysis only).

    env PYTHONPATH= PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python -m benchmarks.exp_100k_memory
"""

import json
import os
import sys
import time

if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=16"
        ).strip()

import jax
import jax.numpy as jnp
import numpy as np

import albatross_tpu as ab
from albatross_tpu.parallel import make_mesh
from albatross_tpu.parallel.gp import DistributedGaussianProcess

N = int(os.environ.get("ALBATROSS_EXP_N", "98304"))
V5P_HBM = 95e9
V5E_HBM = 16e9


def main() -> int:
    mesh = make_mesh(16, ("data", "model"), shape=(4, 4))
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(0.0, 100.0, N)), dtype=jnp.float32)
    y = jnp.sin(0.3 * x)
    data = ab.RegressionDataset.create(x, y)
    kernel = ab.SquaredExponential(0.5, 1.0) + ab.measurement_only(
        ab.IndependentNoise(0.3, assume_unique=True)
    )
    model = DistributedGaussianProcess(
        kernel, mesh, axis="data", col_axis="model", panel=1024, jitter=1e-4
    )

    t0 = time.perf_counter()
    compiled = (
        jax.jit(lambda m, d: -m.log_likelihood(d)).lower(model, data).compile()
    )
    dt = time.perf_counter() - t0
    ma = compiled.memory_analysis()
    tile_bytes = (N // 4) * (N // 4) * 4
    dense_bytes = N * N * 4
    peak = ma.temp_size_in_bytes + ma.argument_size_in_bytes
    rec = {
        "metric": f"nlml_2d_compiled_peak_bytes_n{N}_mesh4x4",
        "value": peak,
        "unit": (
            f"per-device bytes (temp={ma.temp_size_in_bytes}, "
            f"args={ma.argument_size_in_bytes}); tile={tile_bytes}; "
            f"dense N²={dense_bytes}; compile={dt:.0f}s"
        ),
        "vs_baseline": round(peak / V5P_HBM, 4),
    }
    print(json.dumps(rec), flush=True)
    ok_v5p = peak < 0.5 * V5P_HBM
    ok_v5e = peak < 0.9 * V5E_HBM
    print(
        json.dumps(
            {
                "metric": "n100k_fits_hbm",
                "value": 1 if ok_v5p else 0,
                "unit": f"v5p-16: {'YES' if ok_v5p else 'NO'}; "
                f"v5e-16: {'YES' if ok_v5e else 'NO'}",
            }
        )
    )
    return 0 if ok_v5p else 1


if __name__ == "__main__":
    sys.exit(main())
