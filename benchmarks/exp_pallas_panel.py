"""TPU A/B: the pallas fused panel chol+inverse (VERDICT r4 next #1 step 2).

Round-4/5 measured dead-end tables pinned the headline gap on the serial
panel critical path (~25 ms of ~76 ms/eval at N=28672): XLA executes one
fusion at a time, so the latency-bound builtin cholesky(b) + inverse
composition cannot overlap the MXU trailing GEMMs.  ops/pallas_chol.py
replaces the pair with ONE VMEM-resident kernel (b <= 1024).

Rows:
  micro_builtin_b{B}  per-panel chol+inverse, builtin + blocked_tri_inverse
  micro_pallas_b{B}   per-panel chol+inverse, pallas kernel
  nlml_b1792_builtin  full NLML, shipping configuration (baseline)
  nlml_b1024_builtin  full NLML, b=1024 panels, builtin factorizer
                      (isolates the block-size effect from the kernel)
  nlml_b1024_pallas   full NLML, b=1024 panels, pallas factorizer

Run ON TPU only:  python -m benchmarks.exp_pallas_panel
Results go to benchmarks/PALLAS_PANEL.json; each NLML row prints its value
so an accuracy cliff cannot hide.
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
B_PANEL = 1024
R = 6


def nlml_flops(n):
    return n**3 / 3.0 + n * n + 8.0 * n * n


def main():
    t0 = time.perf_counter()
    z = jnp.ones((256, 256), jnp.float32)
    float((z @ z)[0, 0])
    probe = time.perf_counter() - t0
    print(f"tunnel probe: {probe:.1f}s", flush=True)
    recs = [{"probe_s": round(probe, 1), "n": N, "b_panel": B_PANEL}]

    rng = np.random.default_rng(0)

    # -- micro: per-panel chol+inverse (stage scaling over b isolates the
    # tile-recursion cost, which grows linearly in tiles, from the MXU
    # compose work, which grows cubically) ----------------------------------
    from albatross_tpu.ops.blocked_cholesky import _panel_chol_inverse
    from albatross_tpu.ops.pallas_chol import pallas_panel_cholinv

    def timed_chain(fn, Akk, reps=16):
        @jax.jit
        def step(a, prev):
            L, W = fn(a + 1e-30 * prev)
            return L, W

        L, W = step(Akk, jnp.float32(0.0))
        first = float(L[0, 0])  # compile+sync
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            p = jnp.float32(0.0)
            for _ in range(reps):
                L, W = step(Akk, p)
                p = L[0, 0]
            float(p)
            best = min(best, (time.perf_counter() - t0) / reps)
        return best, first

    micro_sizes = tuple(
        int(s)
        for s in os.environ.get(
            "ALBATROSS_EXP_MICRO_SIZES", str(B_PANEL)
        ).split(",")
    )
    for b in micro_sizes:
        A = rng.standard_normal((b, b))
        Akk = jnp.asarray((A @ A.T + b * np.eye(b)).astype(np.float32))
        for tag, fn in (
            ("micro_builtin", lambda a: _panel_chol_inverse(a, 256)),
            (
                "micro_pallas",
                lambda a: tuple(x.T for x in pallas_panel_cholinv(a)),
            ),
        ):
            dt, l00 = timed_chain(fn, Akk)
            rec = {
                "variant": f"{tag}_b{b}",
                "ms": round(dt * 1e3, 3),
                "l00": l00,
            }
            recs.append(rec)
            print(json.dumps(rec), flush=True)
    if os.environ.get("ALBATROSS_EXP_MICRO_ONLY") == "1":
        out = os.path.join(os.path.dirname(__file__), "PALLAS_PANEL_MICRO.json")
        with open(out, "w") as fh:
            json.dump(recs, fh, indent=1)
        print(f"wrote {out}", flush=True)
        return

    # -- full NLML A/B ------------------------------------------------------
    x = jnp.asarray(np.sort(rng.uniform(0.0, 100.0, N)), dtype=jnp.float32)
    y = jnp.sin(0.3 * x) + 0.1 * jnp.asarray(
        rng.standard_normal(N), dtype=jnp.float32
    )
    kernel = ab.SquaredExponential(0.5, 1.0) + ab.measurement_only(
        ab.IndependentNoise(0.3, assume_unique=True)
    )
    model = ab.gp_from_covariance(kernel, jitter=1e-4)
    data = ab.RegressionDataset.create(x, y)

    def measure(tag, block, factorizer):
        prev_b = config.CHOLESKY_BLOCK_SIZE
        prev_f = config.PANEL_FACTORIZER
        config.CHOLESKY_BLOCK_SIZE = block
        config.PANEL_FACTORIZER = factorizer
        try:

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
                rec = {"variant": tag, "nlml": val, "status": "nan"}
                recs.append(rec)
                print(json.dumps(rec), flush=True)
                return

            def batch():
                p = jnp.float32(0.0)
                t0 = time.perf_counter()
                for _ in range(R):
                    p = nlml_step(model, data, p)
                float(p)
                return (time.perf_counter() - t0) / R

            batch()
            per_eval = min(batch() for _ in range(3))
            rec = {
                "variant": tag,
                "tflops": round(nlml_flops(N) / per_eval / 1e12, 2),
                "ms_per_eval": round(per_eval * 1e3, 2),
                "nlml": val,
                "compile_s": round(compile_s, 1),
            }
            recs.append(rec)
            print(json.dumps(rec), flush=True)
        finally:
            config.CHOLESKY_BLOCK_SIZE = prev_b
            config.PANEL_FACTORIZER = prev_f

    measure("nlml_b1792_builtin", None, None)
    measure("nlml_b1024_builtin", B_PANEL, None)
    measure("nlml_b1024_pallas", B_PANEL, "pallas")
    measure("nlml_b1792_builtin_again", None, None)

    out = os.path.join(os.path.dirname(__file__), "PALLAS_PANEL.json")
    with open(out, "w") as fh:
        json.dump(recs, fh, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
