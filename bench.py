"""Benchmark: exact-GP NLML-evaluation throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: R full NLML evaluations (gram → blocked Cholesky → whitening →
log-det) at perturbed hyperparameters — the inner loop of marginal-likelihood
optimization/MCMC and the reference's hot path
(/root/reference/benchmarks/bench_gram.cc defines the equivalent cases; no
numbers are published).

Measurement notes for the tunneled (axon) backend:
* ~28 ms host↔device round trip per synchronized call and
  ``block_until_ready`` does NOT synchronize — a host transfer does;
* large fused programs (scan over the whole pipeline) can stall the remote
  compile service, so the benchmark compiles ONE pipeline and amortizes RTT
  by async-dispatching R data-dependent calls (each consumes the previous
  NLML, forcing sequential device execution) with a single final sync.

Headline value: achieved TFLOP/s; ``vs_baseline`` is the ratio against the
north-star target of 60% of f32 peak (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

N = int(os.environ.get("ALBATROSS_BENCH_N", "28672"))
R = 8  # chained NLML evaluations per timed batch
PEAK_F32_TFLOPS = 49.2
TARGET_FRACTION = 0.6


def nlml_flops(n: int) -> float:
    cholesky = n**3 / 3.0
    whiten = n * n
    gram = 8.0 * n * n
    return cholesky + whiten + gram


def _measure_nlml(n: int, r: int, algorithm: str = "right"):
    """Best per-eval seconds for the full NLML pipeline at size n (r chained
    async dispatches per timed batch, single final sync).  ``algorithm``
    selects the factorization loop order: "right" (the default fast path,
    materialized covariance) or "right_fused" (lazy gram columns — ~14%
    slower at N=28672 but the memory-lean mode that extends the single-chip
    ceiling past N=100k; see benchmarks/SCALE_CEILING.json)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import albatross_tpu as ab
    from albatross_tpu import config as _cfg

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

    prev_alg = _cfg.CHOLESKY_ALGORITHM
    prev_min = _cfg.CHOLESKY_FUSED_MIN_N
    _cfg.CHOLESKY_ALGORITHM = algorithm
    # the algorithm is the thing being measured: disable the big-N
    # auto-upgrade so "right" really is the materialized path (otherwise
    # the ladder's N>=57344 rows would silently run right_fused and the
    # ceiling detection would be defeated)
    _cfg.CHOLESKY_FUSED_MIN_N = 0
    try:
        # fresh jit per call: the trace reads the algorithm knob eagerly
        # and threads it as a static arg into the inner program
        @jax.jit
        def nlml_step(model, data, prev):
            # perturb the length scale by an invisible function of the
            # previous result: keeps each call data-dependent on the last
            # so the r async dispatches execute back-to-back on device.
            eps = 1e-30 * prev
            m = model.set_param_value(
                "squared_exponential_length_scale",
                jnp.float32(0.5) + eps,
            )
            return -m.log_likelihood(data)

        prev = jnp.float32(0.0)
        prev = nlml_step(model, data, prev)
        first = float(prev)  # compile + sync
        if not np.isfinite(first):
            raise RuntimeError(f"non-finite NLML at n={n}: {first}")

        def timed_batch():
            p = jnp.float32(0.0)
            t0 = time.perf_counter()
            for _ in range(r):
                p = nlml_step(model, data, p)
            float(p)  # single sync
            return time.perf_counter() - t0

        timed_batch()  # one more warm batch
        best = min(timed_batch() for _ in range(3))
        return best / r
    finally:
        _cfg.CHOLESKY_ALGORITHM = prev_alg
        _cfg.CHOLESKY_FUSED_MIN_N = prev_min


def main() -> int:
    per_eval = _measure_nlml(N, R)
    tflops = nlml_flops(N) / per_eval / 1e12
    result = {
        "metric": f"exact_gp_nlml_tflops_n{N}",
        "value": round(tflops, 4),
        "unit": f"TFLOP/s ({1.0 / per_eval:.2f} NLML evals/s)",
        "vs_baseline": round(tflops / (TARGET_FRACTION * PEAK_F32_TFLOPS), 4),
    }

    # secondary metrics (BASELINE.md north-star rows 1-4): the N=32768
    # accuracy-mode scale row, serving predict throughput, sampler
    # walker-steps/s, and the high-D pallas-vs-XLA gram.  Printed to STDERR
    # and written to BENCH_DETAIL.json so the README numbers are
    # driver-reproducible.  The headline is printed LAST so the driver's
    # parsed record (last JSON line of the tail) is the headline, not an
    # extra.  Opt out with ALBATROSS_BENCH_EXTRAS=0.
    if os.environ.get("ALBATROSS_BENCH_EXTRAS", "1") != "0":
        try:
            details = [result] + _extra_benchmarks()
            with open(
                os.path.join(os.path.dirname(__file__) or ".", "BENCH_DETAIL.json"),
                "w",
            ) as fh:
                json.dump(details, fh, indent=1)
        except Exception as exc:  # extras must never break the headline
            print(
                json.dumps({"metric": "bench_extras_error", "unit": str(exc)[:200]}),
                file=sys.stderr,
            )
    print(json.dumps(result), flush=True)
    return 0


def _extra_benchmarks():
    """Serving-predict throughput, sampler walker-steps/s, high-D pallas
    gram, and the N=32768 scale row (each echoed to stderr as one JSON
    line; the stdout headline stays main()'s single line)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import albatross_tpu as ab

    out = []

    def emit(metric, value, unit):
        # round to 4 decimals for human-scale values but keep significant
        # digits for tiny ones (the accuracy rows are ~1e-7)
        v = round(value, 4) if abs(value) >= 1e-3 else float(f"{value:.3e}")
        rec = {"metric": metric, "value": v, "unit": unit}
        print(json.dumps(rec), file=sys.stderr, flush=True)
        out.append(rec)

    rng = np.random.default_rng(1)
    # -- serving predict: for_serving() marginal predictions ----------------
    # (rows are sized for the v5e; ALBATROSS_BENCH_SMALL=1 shrinks them so a
    # CPU smoke run of the full bench finishes in minutes)
    small = os.environ.get("ALBATROSS_BENCH_SMALL") == "1"
    n, m = (2048, 1024) if small else (8192, 4096)
    x = jnp.asarray(np.sort(rng.uniform(0.0, 100.0, n)), dtype=jnp.float32)
    y = jnp.sin(0.3 * x)
    xs = jnp.asarray(np.sort(rng.uniform(0.0, 100.0, m)), dtype=jnp.float32)
    kernel = ab.SquaredExponential(2.0, 1.0) + ab.measurement_only(
        ab.IndependentNoise(0.3, assume_unique=True)
    )
    model = ab.gp_from_covariance(kernel, jitter=1e-4)
    fit = model.fit(ab.RegressionDataset.create(x, y)).for_serving()

    # VERDICT r3 next #2: the old per-call chain measured tunnel
    # RTT/dispatch overhead (~12 ms batches swinging 39% run to run), not
    # the serving path.  Iterate the R batches INSIDE jit (lax.scan, each
    # batch consuming the previous mean so device execution is sequential)
    # — one dispatch + one sync per measurement.  VERDICT r4 next #5 (the
    # <10% spread bar): R=64 so a tunnel hiccup amortizes over a ~600 ms
    # chain, 5 runs with min/max dropped, spread reported over the
    # surviving middle three.
    R = 64

    @jax.jit
    def predict_chain(fit, xs):
        def body(prev, _):
            p = fit.predict(xs + 1e-30 * prev).marginal()
            # the carry must consume EVERY output element: a [0]-only
            # carry lets XLA slice the batch GEMMs down to one column
            # (measured: a bogus 690 TF/s serving rate)
            carry = p.mean[0] + 1e-30 * (
                jnp.sum(p.mean) + jnp.sum(p.variance)
            )
            return carry, carry

        last, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=R)
        return last

    float(predict_chain(fit, xs))  # compile + sync

    def one_run():
        t0 = time.perf_counter()
        float(predict_chain(fit, xs))
        return (time.perf_counter() - t0) / R

    times = sorted(one_run() for _ in range(5))
    mid = times[1:4]  # drop min and max
    dt = mid[1]
    spread = (mid[-1] - mid[0]) / dt
    emit(
        f"serving_predict_points_per_s_n{n}_m{m}",
        m / dt / 1e6,
        f"Mpts/s ({dt * 1000:.2f} ms/batch, median of 5 with min/max "
        f"dropped; mid-3 spread {spread * 100:.0f}%)",
    )

    # -- sampler: walker-steps/s ---------------------------------------------
    # iters=64 so the ~0.2 s fixed per-chain cost (eager finite-init sync +
    # dispatch) doesn't dominate: measured on v5e 1474 steps/s at 16 iters
    # vs 2424 at 64 and 2927 at 256 (benchmarks/exp_sampler_tpu.py)
    ns, w, iters = 1024, 32, 64
    xsamp = jnp.asarray(np.sort(rng.uniform(0.0, 10.0, ns)), dtype=jnp.float32)
    data = ab.RegressionDataset.create(xsamp, jnp.sin(xsamp))
    smodel = ab.gp_from_covariance(
        ab.SquaredExponential(1.5, 1.0) + ab.IndependentNoise(0.1),
        jitter=1e-5,
    )
    from albatross_tpu.core.parameters import set_tunable_params
    from albatross_tpu.samplers import (
        ensemble_sampler,
        initial_params_from_jitter,
    )

    # one stable log_prob_fn so the warmup chain's compiled scan is reused
    # by the timed chain (the module-level _run_chunk jit keys on it)
    params0 = smodel.get_params()

    def single_log_prob(t):
        return smodel.set_params(set_tunable_params(params0, t)).log_likelihood(data)

    log_prob_fn = jax.jit(jax.vmap(single_log_prob))
    init = initial_params_from_jitter(
        jax.random.PRNGKey(0), smodel.get_tunable_parameters().values, w
    )
    ensemble_sampler(log_prob_fn, init, iters, jax.random.PRNGKey(1))
    t0 = time.perf_counter()
    ensemble_sampler(log_prob_fn, init, iters, jax.random.PRNGKey(1))
    dt = time.perf_counter() - t0
    emit(
        f"sampler_walker_steps_per_s_n{ns}_w{w}",
        w * iters / dt,
        f"walker-steps/s ({iters} iters in {dt:.2f}s)",
    )

    # -- NLML value+grad: the tuning hot loop (exact gradients the
    # reference can only finite-difference) --------------------------------
    ng = 2048 if small else 8192
    xg = jnp.asarray(np.sort(rng.uniform(0.0, 100.0, ng)), dtype=jnp.float32)
    gdata = ab.RegressionDataset.create(xg, jnp.sin(0.3 * xg))
    gmodel = ab.gp_from_covariance(
        ab.SquaredExponential(0.5, 1.0)
        + ab.measurement_only(ab.IndependentNoise(0.3, assume_unique=True)),
        jitter=1e-4,
    )

    @jax.jit
    def value_and_grad_step(model, data, prev):
        m = model.set_param_value(
            "squared_exponential_length_scale", jnp.float32(0.5) + 1e-30 * prev
        )
        v, g = jax.value_and_grad(lambda mm: -mm.log_likelihood(data))(m)
        # the returned scalar must CONSUME every gradient leaf: returning v
        # alone lets XLA dead-code-eliminate the whole backward pass
        # (round-5 catch — the rows 3-4 "121 evals/s value+grad" figure was
        # forward-only; the honest value+grad rate is ~1/3 of it)
        gsum = sum(
            jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(g)
        )
        return v + 1e-30 * gsum

    prev = value_and_grad_step(gmodel, gdata, jnp.float32(0.0))
    float(prev)
    R = 8
    t0 = time.perf_counter()
    p = jnp.float32(0.0)
    for _ in range(R):
        p = value_and_grad_step(gmodel, gdata, p)
    float(p)
    dt = (time.perf_counter() - t0) / R
    emit(
        f"nlml_value_and_grad_evals_per_s_n{ng}",
        1.0 / dt,
        f"evals/s ({dt * 1e3:.1f} ms/eval)",
    )

    # -- value+grad at HEADLINE N (VERDICT r4 next #6): tuning is the
    # dominant real workload; capture it at the same N as the headline
    # with TF/s accounting (reverse-mode NLML ~ 3x the forward FLOPs:
    # forward n^3/3 + backward ~2n^3/3 through the factorization/solve,
    # plus the gram VJP) ---------------------------------------------------
    if not small and jax.default_backend() != "cpu":
        try:
            ng2 = N
            xg2 = jnp.asarray(
                np.sort(rng.uniform(0.0, 100.0, ng2)), dtype=jnp.float32
            )
            gdata2 = ab.RegressionDataset.create(xg2, jnp.sin(0.3 * xg2))
            prev = value_and_grad_step(gmodel, gdata2, jnp.float32(0.0))
            v0 = float(prev)
            if not np.isfinite(v0):
                raise RuntimeError(f"non-finite value+grad NLML: {v0}")
            Rg = 4
            t0 = time.perf_counter()
            p = jnp.float32(0.0)
            for _ in range(Rg):
                p = value_and_grad_step(gmodel, gdata2, p)
            float(p)
            dt = (time.perf_counter() - t0) / Rg
            emit(
                f"nlml_value_and_grad_tflops_n{ng2}",
                3.0 * nlml_flops(ng2) / dt / 1e12,
                f"TFLOP/s at 3x-forward accounting ({1.0 / dt:.2f} evals/s,"
                f" {dt * 1e3:.0f} ms/eval)",
            )
        except Exception as exc:  # record the failure mode honestly
            print(
                json.dumps(
                    {
                        "metric": f"nlml_value_and_grad_tflops_n{N}",
                        "value": 0.0,
                        "unit": f"failed: {str(exc)[:160]}",
                    }
                ),
                file=sys.stderr,
            )

    # -- high-D gram: fused pallas vs XLA matmul-trick (config.py policy) ----
    # the auto policy (pallas for D >= 9) rests on these numbers; emitting
    # them makes the policy a reproducible artifact (VERDICT r2 weak #4).
    if jax.default_backend() != "cpu":
        from albatross_tpu.ops.pallas_gram import (
            _xla_reference_gram,
            pallas_radial_gram,
        )

        ng, d = 8192, 32
        Xg = jnp.asarray(
            rng.uniform(0.0, 100.0, (ng, d)), dtype=jnp.float32
        )

        def time_gram(fn):
            # median of 5 timed batches (VERDICT r4 next #2: the single
            # measurement swung between sessions; a median pins it)
            @jax.jit
            def step(X, prev):
                return fn(X + 1e-30 * prev, X)

            prev = jnp.float32(0.0)
            g = step(Xg, prev)
            float(g[0, 0])  # compile + sync
            reps = 16  # ~7 ms/call: amortize the ~2 ms tunnel sync noise

            def one():
                t0 = time.perf_counter()
                gg = g
                for _ in range(reps):
                    gg = step(Xg, gg[0, 0])
                float(gg[0, 0])
                return (time.perf_counter() - t0) / reps

            return sorted(one() for _ in range(5))[2]

        # tile autotune: 256 won the round-4 interactive ladder but the
        # driver capture disagreed — measure both and report the best
        t_pallas, best_tile = min(
            (
                time_gram(
                    lambda X, Y, t=t: pallas_radial_gram(
                        X, Y, 10.0, 1.0,
                        profile="squared_exponential", tile=t,
                    )
                ),
                t,
            )
            for t in (128, 256, 512)
        )
        t_xla = time_gram(
            lambda X, Y: _xla_reference_gram(
                X, Y, 10.0, 1.0, "squared_exponential"
            )
        )
        emit(
            f"gram_highd_ms_n{ng}_d{d}_pallas",
            t_pallas * 1e3,
            f"ms (tile={best_tile}; XLA matmul-trick same-session: "
            f"{t_xla * 1e3:.2f} ms; both median-of-5; pallas exact-f32)",
        )

    # -- accuracy ladder: NLML vs an f64 host oracle, four variants ----------
    # BASELINE.md's 1e-6 relative-NLML target, driver-captured at the
    # ladder's own config (VERDICT r3 next #1: the old single N=4096 row
    # ran both paths at one precision and could not separate them).  Build
    # K on device through the library gram path, download it ONCE, compute
    # the f64 oracle on host numpy, then evaluate each variant in ITS OWN
    # jitted program (one shared program risks cross-variant fusion):
    #   plain_default  — fast mode (single-bf16-pass trailing updates; at
    #                    this N/conditioning it NaNs — reported as-is);
    #   plain_highest  — plain f32 NLML at CHOLESKY_PRECISION=highest;
    #   comp           — highest + compensated (accurate_log + dw
    #                    reductions + refined quadratic), (hi, lo) combined
    #                    in f64 on host;
    #   comp_dw        — double_word factorization + compensated.
    # N=8192 matches benchmarks/exp_compensated_tpu.py; the host oracle is
    # ~10 s of numpy and one 256 MB download.  On a sick tunnel fall back
    # to N=4096.
    try:
        from albatross_tpu import config
        from albatross_tpu.kernels import as_measurement
        from albatross_tpu.ops.compensated import compensated_nll_dw
        from albatross_tpu.ops.linalg import CholeskyFactor

        na = int(
            os.environ.get("ALBATROSS_BENCH_ACC_N", "2048" if small else "8192")
        )
        # dedicated seed-0 draw = benchmarks/exp_compensated_tpu.py's exact
        # protocol, NOT the shared bench rng: the plain-f32 error at this
        # conditioning is dominated by data-draw-dependent factorization
        # luck (observed 9.7e-8..1.1e-6 across draws), so a fixed draw is
        # the only way the plain-vs-comp separation is comparable across
        # rounds and against the ladder
        rng_acc = np.random.default_rng(0)
        xa = jnp.asarray(
            np.sort(rng_acc.uniform(0.0, 100.0, na)), dtype=jnp.float32
        )
        ya = jnp.sin(0.3 * xa) + 0.1 * jnp.asarray(
            rng_acc.standard_normal(na), dtype=jnp.float32
        )
        akern = ab.SquaredExponential(5.0, 1.0) + ab.measurement_only(
            ab.IndependentNoise(0.1, assume_unique=True)
        )
        Ka = jax.jit(lambda x: akern(as_measurement(x)))(xa)
        log2pi = float(np.log(2.0 * np.pi))

        @jax.jit
        def plain_nll(K, y):
            chol, white = CholeskyFactor.factorize_whiten(
                K, y, assume_symmetric=True
            )
            return 0.5 * (
                chol.log_determinant() + jnp.sum(white * white) + na * log2pi
            )

        @jax.jit
        def comp_nll(K, y):
            chol = CholeskyFactor.factorize(K, assume_symmetric=True)
            return compensated_nll_dw(chol, K, y)

        prev_precision = config.CHOLESKY_PRECISION
        vals = {}
        try:
            for name, precision, comp in (
                ("plain_default", None, False),
                ("plain_highest", "highest", False),
                ("comp", "highest", True),
                ("comp_dw", "double_word", True),
            ):
                config.CHOLESKY_PRECISION = precision
                if comp:
                    ch, cl = comp_nll(Ka, ya)
                    # combine the double word in f64 on host: a single-f32
                    # result caps observable accuracy at one output ulp
                    vals[name] = float(ch) + float(cl)
                else:
                    vals[name] = float(plain_nll(Ka, ya))
                # jit caches key on the traced python closure, not the
                # config value — drop the cache between precision modes
                plain_nll.clear_cache()
                comp_nll.clear_cache()
        finally:
            config.CHOLESKY_PRECISION = prev_precision
        K64 = np.asarray(Ka, np.float64)
        L64 = np.linalg.cholesky(K64)
        w64 = np.linalg.solve(L64, np.asarray(ya, np.float64))
        nll64 = 0.5 * (
            2.0 * np.sum(np.log(np.diag(L64))) + w64 @ w64 + na * log2pi
        )

        def rel(name):
            v = vals[name]
            return abs(v - nll64) / abs(nll64) if np.isfinite(v) else float("nan")

        emit(
            f"nlml_rel_err_compensated_n{na}",
            rel("comp"),
            "rel vs f64 oracle (plain_default: "
            f"{rel('plain_default'):.2e}; plain_highest: "
            f"{rel('plain_highest'):.2e}; comp_dw: {rel('comp_dw'):.2e}; "
            "target 1e-6)",
        )
    except Exception as exc:  # accuracy row must never break the bench
        print(
            json.dumps(
                {"metric": "nlml_rel_err_error", "unit": str(exc)[:200]}
            ),
            file=sys.stderr,
        )

    # -- scale row: N=32768 NLML (auto precision=HIGH panel GEMMs) -----------
    # the N >= 32768 regime single-pass-bf16 NaNs; blocked_cholesky_cols
    # escalates panel formation to 3-pass automatically (CLAUDE.md #2).
    # Driver-captures the scale claim (VERDICT r2 missing #1).  Tunnel
    # health gate: when the axon remote service is backed up (observed: a
    # 256x256 matmul taking ~30 min), a fresh N=32768 compile could stall
    # the whole bench — probe with a small timed matmul first and skip the
    # scale row if the tunnel is sick.
    def _tunnel_healthy() -> bool:
        t0 = time.perf_counter()
        z = jnp.ones((256, 256), jnp.float32)
        float((z @ z)[0, 0])
        return (time.perf_counter() - t0) < 30.0

    if os.environ.get("ALBATROSS_BENCH_SCALE", "1") != "0" and (
        jax.default_backend() == "cpu" or _tunnel_healthy()
    ):
        # VERDICT r4 next #4: walk the ladder toward the N=100k north star
        # and RECORD the single-chip ceiling — the first size that OOMs or
        # NaNs — instead of stopping at one scale point.  On CPU smoke
        # runs only the first size executes (compile cost).
        sizes = (32768,) if jax.default_backend() == "cpu" else (
            32768,
            36864,
            40960,
            49152,
            53248,
            57344,  # expected first OOM of the materialized path (16 GB HBM)
        )
        max_n = int(os.environ.get("ALBATROSS_BENCH_SCALE_MAX", "57344"))
        ceiling = None
        for n_scale in sizes:
            if n_scale > max_n:
                break
            try:
                per_eval = _measure_nlml(n_scale, 4 if n_scale <= 32768 else 2)
            except Exception as exc:
                ceiling = (n_scale, str(exc)[:160])
                break
            tflops = nlml_flops(n_scale) / per_eval / 1e12
            rec = {
                "metric": f"exact_gp_nlml_tflops_n{n_scale}",
                "value": round(tflops, 4),
                "unit": f"TFLOP/s ({1.0 / per_eval:.2f} NLML evals/s)",
                "vs_baseline": round(
                    tflops / (TARGET_FRACTION * PEAK_F32_TFLOPS), 4
                ),
            }
            print(json.dumps(rec), file=sys.stderr, flush=True)
            out.append(rec)
        if jax.default_backend() != "cpu":
            rec = {
                "metric": "single_chip_scale_ceiling",
                "value": float(ceiling[0]) if ceiling else float(max_n),
                "unit": (
                    f"first failing N ({ceiling[1]})"
                    if ceiling
                    else f"no failure up to N={max_n} (largest attempted)"
                ),
            }
            print(json.dumps(rec), file=sys.stderr, flush=True)
            out.append(rec)
            # the N=100k-class point: CHOLESKY_ALGORITHM="right_fused"
            # (lazy gram columns) trades ~14% of the N=28672 rate for a
            # memory profile XLA schedules in ~13 GB of temps at N=102400
            # — past the materialized path's ~57k OOM and past the
            # BASELINE.md north-star size on ONE chip (ladder + compiled
            # memory stats: benchmarks/SCALE_CEILING.json)
            n_big = int(os.environ.get("ALBATROSS_BENCH_SCALE_100K", "102400"))
            # a capped ladder (ALBATROSS_BENCH_SCALE_MAX below the full
            # walk) means "short run" — skip the longest compile too
            if n_big and max_n >= 57344:
                try:
                    per_eval = _measure_nlml(n_big, 2, algorithm="right_fused")
                    tflops = nlml_flops(n_big) / per_eval / 1e12
                    rec = {
                        "metric": f"exact_gp_nlml_tflops_n{n_big}_right_fused",
                        "value": round(tflops, 4),
                        "unit": (
                            f"TFLOP/s ({per_eval:.2f} s/NLML eval, "
                            "single chip, lazy-gram memory mode)"
                        ),
                        "vs_baseline": round(
                            tflops / (TARGET_FRACTION * PEAK_F32_TFLOPS), 4
                        ),
                    }
                except Exception as exc:
                    rec = {
                        "metric": f"exact_gp_nlml_n{n_big}_right_fused_error",
                        "value": 0.0,
                        "unit": str(exc)[:200],
                    }
                print(json.dumps(rec), file=sys.stderr, flush=True)
                out.append(rec)
    return out


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
