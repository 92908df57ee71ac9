"""Single-chip scale ceiling: walk N past 49152 until the chip says no.

VERDICT r4 next #4 asked for "the first size that OOMs or NaNs"; the
round-5 bench ladder walked 32768..49152 and found NO failure — so the
recorded ceiling is still "largest attempted", not a real limit.  This
experiment finishes the job on the real chip:

  1. default path (materialized N^2 covariance + right-looking panels):
     peak HBM ~ 4*N^2 (gram) + 2*N^2 (panel triangle) bytes -> ~17.3 GB
     at N=53248 vs the v5e's 16 GB, so the first walked size should be
     the genuine OOM point (49152 measured 14.5 GB-class and ran).
  2. CHOLESKY_ALGORITHM="right_fused" (lazy gram columns — the memory-
     lean mode that LOST the speed A/B at N=28672 by 14%,
     benchmarks/FUSED_OVERLAP.json): with no standalone N^2 covariance
     write, XLA's buffer assignment schedules the whole NLML in FAR less
     than the naive 2*N^2-byte triangle estimate — measured compiled
     stats at N=102400: 12.99 GB temps + 1.68 GB program, peak-liveness
     12.25 GB (AOT memory_analysis, this script's --mem flag).  Measured
     ladder: 85.9 TF/s @57344 rising to ~95.5 @98304-102400 (the serial
     panel fraction amortizes with N) — the N=100k BASELINE.md north-star
     size runs on ONE v5e chip at 3.75 s/eval.

Each size records TF/s + the NLML value (so a NaN cliff cannot hide) or
the failure string.  Reference capability matched: the exact-GP fit at
the largest N the hardware allows (serializable_ldlt.hpp:19-80); the
N=100k BASELINE.md north star is a multi-chip (2-D tile-sharded) target
— this artifact documents where ONE chip tops out and which knob buys
the last ~50% of single-chip N.

Run ON TPU from the repo root (no timeout-kill — compiles can be slow);
the full artifact is the ladder walk plus the memory probe appended:
    python -m benchmarks.exp_scale_ceiling
    python -m benchmarks.exp_scale_ceiling --mem 102400
Writes (then appends to) benchmarks/SCALE_CEILING.json.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import albatross_tpu as ab
from albatross_tpu import config

R = 3  # chained evals per timed batch (evals are seconds-long at these N)


def nlml_flops(n):
    return n**3 / 3.0 + n * n + 8.0 * n * n


def make_problem(n):
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(0.0, 100.0, n)), dtype=jnp.float32)
    y = jnp.sin(0.3 * x) + 0.1 * jnp.asarray(
        rng.standard_normal(n), dtype=jnp.float32
    )
    kernel = ab.SquaredExponential(0.5, 1.0) + ab.measurement_only(
        ab.IndependentNoise(0.3, assume_unique=True)
    )
    model = ab.gp_from_covariance(kernel, jitter=1e-4)
    data = ab.RegressionDataset.create(x, y)
    return model, data


def measure(n, algorithm):
    """One (size, algorithm) point: compile + R-chained timed evals."""
    prev_alg = config.CHOLESKY_ALGORITHM
    prev_min = config.CHOLESKY_FUSED_MIN_N
    config.CHOLESKY_ALGORITHM = algorithm
    # the algorithm IS the experiment variable: disable the big-N
    # auto-upgrade so "right" at n >= CHOLESKY_FUSED_MIN_N really
    # measures the materialized path (and really OOMs at its ceiling)
    config.CHOLESKY_FUSED_MIN_N = 0
    try:
        model, data = make_problem(n)

        # fresh jit per point: the outer trace reads the algorithm knob
        # eagerly and threads it as a static arg (round-4 pitfall)
        @jax.jit
        def nlml_step(model, data, prev):
            m = model.set_param_value(
                "squared_exponential_length_scale",
                jnp.float32(0.5) + 1e-30 * prev,
            )
            return -m.log_likelihood(data)

        t0 = time.perf_counter()
        val = float(nlml_step(model, data, jnp.float32(0.0)))
        compile_s = time.perf_counter() - t0
        if not np.isfinite(val):
            rec = {
                "n": n,
                "algorithm": algorithm,
                "status": "nan",
                "nlml": val,
                "compile_s": round(compile_s, 1),
            }
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
        per_eval = min(batch() for _ in range(2))
        rec = {
            "n": n,
            "algorithm": algorithm,
            "status": "ok",
            "tflops": round(nlml_flops(n) / per_eval / 1e12, 2),
            "s_per_eval": round(per_eval, 3),
            "nlml": val,
            "compile_s": round(compile_s, 1),
        }
        print(json.dumps(rec), flush=True)
        return rec
    except Exception as exc:  # OOM arrives as XlaRuntimeError at compile
        rec = {
            "n": n,
            "algorithm": algorithm,
            "status": "fail",
            "error": str(exc)[:300],
        }
        print(json.dumps(rec), flush=True)
        return rec
    finally:
        config.CHOLESKY_ALGORITHM = prev_alg
        config.CHOLESKY_FUSED_MIN_N = prev_min


def memory_probe(n, algorithm):
    """AOT-compile the NLML at (n, algorithm), print the compiled memory
    statistics — how the N=102400 program fits a 16 GB chip — and append
    the record to SCALE_CEILING.json (so the artifact the docs cite stays
    reproducible from this script)."""
    prev_alg = config.CHOLESKY_ALGORITHM
    prev_min = config.CHOLESKY_FUSED_MIN_N
    config.CHOLESKY_ALGORITHM = algorithm
    config.CHOLESKY_FUSED_MIN_N = 0
    try:
        model, data = make_problem(n)

        @jax.jit
        def nlml_step(model, data, prev):
            m = model.set_param_value(
                "squared_exponential_length_scale",
                jnp.float32(0.5) + 1e-30 * prev,
            )
            return -m.log_likelihood(data)

        t0 = time.perf_counter()
        compiled = nlml_step.lower(model, data, jnp.float32(0.0)).compile()
        ma = compiled.memory_analysis()
        rec = {
            "n": n,
            "algorithm": algorithm,
            "probe": "aot_memory_analysis",
            "compile_s": round(time.perf_counter() - t0, 1),
            "temp_gb": round(ma.temp_size_in_bytes / 1e9, 3),
            "code_gb": round(ma.generated_code_size_in_bytes / 1e9, 3),
            "args_gb": round(ma.argument_size_in_bytes / 1e9, 3),
            "host_temp_gb": round(
                getattr(ma, "host_temp_size_in_bytes", 0) / 1e9, 3
            ),
        }
        print(json.dumps(rec), flush=True)
        out = os.path.join(os.path.dirname(__file__), "SCALE_CEILING.json")
        try:
            data_list = json.load(open(out))
        except (OSError, ValueError):
            data_list = []
        data_list.append(rec)
        with open(out, "w") as fh:
            json.dump(data_list, fh, indent=1)
        print(f"appended to {out}", flush=True)
    finally:
        config.CHOLESKY_ALGORITHM = prev_alg
        config.CHOLESKY_FUSED_MIN_N = prev_min


def main():
    import sys

    if "--mem" in sys.argv:
        n = int(sys.argv[sys.argv.index("--mem") + 1])
        memory_probe(n, "right_fused")
        return
    t0 = time.perf_counter()
    z = jnp.ones((256, 256), jnp.float32)
    float((z @ z)[0, 0])
    probe = time.perf_counter() - t0
    print(f"tunnel probe: {probe:.1f}s", flush=True)
    if probe > 30.0:
        # CLAUDE.md rule: a slow small-matmul probe means the remote
        # compile service is backed up — do NOT stack 90-300 s compiles
        # on it (and do NOT overwrite the artifact with a sick-tunnel run)
        print("tunnel unhealthy (>30 s probe) — walk away and retry later")
        return
    recs = [{"probe_s": round(probe, 1)}]

    # 1) default path: first size past the known-good 49152
    ceiling_default = None
    for n in (53248, 57344):
        rec = measure(n, "right")
        recs.append(rec)
        if rec["status"] != "ok":
            ceiling_default = n
            break

    # 2) lazy-gram mode: resume past the default ceiling
    ceiling_fused = None
    for n in (
        57344,
        65536,
        73728,
        81920,
        90112,
        98304,
        102400,
        110592,
        114688,
        122880,  # measured first failure of the lazy-gram mode
    ):
        if ceiling_default is not None and n < ceiling_default:
            continue
        rec = measure(n, "right_fused")
        recs.append(rec)
        if rec["status"] != "ok":
            ceiling_fused = n
            break

    recs.append(
        {
            "ceiling_default": ceiling_default,
            "ceiling_right_fused": ceiling_fused,
        }
    )
    out = os.path.join(os.path.dirname(__file__), "SCALE_CEILING.json")
    with open(out, "w") as fh:
        json.dump(recs, fh, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
