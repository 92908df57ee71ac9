"""TPU experiment: compensated (double-word) NLML error ladder vs f64 oracle.

Round-3 follow-up to the CLAUDE.md #3 accuracy study: the f32 end-to-end
NLML error at N=8192 was 2.8e-4 relative, dominated by the f32
solve/reduction error, and TPU has no f64 to fix it with.  This measures
whether ops/compensated.py (dw reductions + refined quadratic) closes the
gap ON CHIP, where the MXU matmuls are bf16-passes rather than true f32.

Protocol (oracle on the SAME matrix the device factorizes):
  1. build K32, y32 on device through the library's gram path;
  2. download them once; compute the f64 oracle NLML on host numpy;
  3. on device: plain f32 NLML, compensated NLML (default chol),
     compensated NLML with CHOLESKY_PRECISION='high' (isolates whether the
     residual factorization error is the next floor);
  4. EFT canary: jit dot2 vs host f64 — records whether the TPU backend's
     codegen preserves error-free transformations (XLA:CPU does NOT — its
     fusion fast-math breaks them; see tests/test_compensated.py).

Run ON TPU (single process!).  N via ALBATROSS_EXP_N (default 8192).
"""

import json
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import albatross_tpu as ab
from albatross_tpu import config
from albatross_tpu.kernels import as_measurement
from albatross_tpu.ops.compensated import compensated_nll, dot2
from albatross_tpu.ops.linalg import CholeskyFactor

N = int(os.environ.get("ALBATROSS_EXP_N", "8192"))


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(0.0, 100.0, N)), dtype=jnp.float32)
    y32 = jnp.sin(0.3 * x) + 0.1 * jnp.asarray(
        rng.standard_normal(N), dtype=jnp.float32
    )
    # noise 0.1 (1e-2 nugget): conditioning interesting but factorizable in
    # f32 (the first run with noise 0.03 NaN'd the f32 Cholesky outright)
    kernel = ab.SquaredExponential(5.0, 1.0) + ab.measurement_only(
        ab.IndependentNoise(0.1, assume_unique=True)
    )
    K32 = jax.jit(lambda x: kernel(as_measurement(x)))(x)
    float(K32[0, 0])  # sync

    # ---- EFT canary --------------------------------------------------------
    v = jnp.asarray(rng.standard_normal(4096) * 1e3, dtype=jnp.float32)
    w = jnp.asarray(rng.standard_normal(4096), dtype=jnp.float32)
    h, l = jax.jit(dot2)(v, w)
    exact_dot = np.asarray(v, np.float64) @ np.asarray(w, np.float64)
    canary = abs((float(h) + float(l)) - exact_dot) / abs(exact_dot)
    plain_dot = abs(float(jnp.dot(v, w)) - exact_dot) / abs(exact_dot)
    print(json.dumps({"metric": "eft_canary_jit_dot2_rel", "value": canary,
                      "unit": f"plain f32 dot rel={plain_dot:.3e}"}))

    # ---- oracle ------------------------------------------------------------
    K64 = np.asarray(K32, np.float64)
    y64 = np.asarray(y32, np.float64)
    L64 = np.linalg.cholesky(K64)
    w64 = np.linalg.solve(L64, y64)
    nll64 = 0.5 * (
        2.0 * np.sum(np.log(np.diag(L64)))
        + w64 @ w64
        + N * math.log(2.0 * math.pi)
    )
    kappa_proxy = float(np.max(np.diag(K64)) / np.min(np.linalg.eigvalsh(
        K64[:512, :512])))  # cheap local conditioning proxy
    print(json.dumps({"metric": "oracle_nll", "value": nll64,
                      "unit": f"kappa_proxy~{kappa_proxy:.2e}"}))

    # ---- oracle decomposition ----------------------------------------------
    ld64 = 2.0 * np.sum(np.log(np.diag(L64)))
    q64 = w64 @ w64

    # ---- device ladder -----------------------------------------------------
    # Plain single-pass bf16 NaNs outright at this conditioning on TPU (the
    # first ladder run) — every factorization below runs at the named
    # precision; the decomposition separates the log-det (pure factorization
    # quality) from the quadratic (solve + reduction + refinement).
    from albatross_tpu.ops.compensated import (
        dw_log_determinant,
        refined_quadratic,
    )

    import contextlib

    def parts(tag, precision, global_precision=None):
        def f(K, y):
            chol, white = CholeskyFactor.factorize_whiten(
                K, y, assume_symmetric=True
            )
            ldh, ldl = dw_log_determinant(chol.L)
            qh, ql = refined_quadratic(chol, K, y)
            # return the double words unevaluated: a single-f32 combine
            # caps the observable error at one output ulp (~8e-8 at
            # |logdet|~7000) — the measured floor of the first ladder run
            return (
                chol.log_determinant(),
                jnp.sum(white * white),
                ldh,
                ldl,
                qh,
                ql,
            )

        ctx = (
            jax.default_matmul_precision(global_precision)
            if global_precision
            else contextlib.nullcontext()
        )
        try:
            config.CHOLESKY_PRECISION = precision
            with ctx:
                jf = jax.jit(f)
                out = jf(K32, y32)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = jf(K32, y32)
            ld_p, q_p, ldh, ldl, qh, ql = (float(v) for v in out)
            ld_c = ldh + ldl  # host f64 combine
            q_c = qh + ql
            dt = time.perf_counter() - t0
        finally:
            config.CHOLESKY_PRECISION = None
        nll_plain = 0.5 * (ld_p + q_p + N * math.log(2.0 * math.pi))
        nll_comp = 0.5 * (ld_c + q_c + N * math.log(2.0 * math.pi))
        print(json.dumps({
            "metric": f"nll_ladder_{tag}_n{N}",
            "value": abs(nll_comp - nll64) / abs(nll64),
            "unit": (
                f"compensated rel; plain rel="
                f"{abs(nll_plain - nll64) / abs(nll64):.3e}; "
                f"logdet rel plain={abs(ld_p - ld64) / abs(ld64):.3e} "
                f"comp={abs(ld_c - ld64) / abs(ld64):.3e}; "
                f"quad rel plain={abs(q_p - q64) / abs(q64):.3e} "
                f"comp={abs(q_c - q64) / abs(q64):.3e}; {dt * 1e3:.0f} ms"
            ),
        }), flush=True)

    # ---- dw panel-size sweep ----------------------------------------------
    # RESOLVED 2026-08-20: the knob-immune 2.33e-6 "floor" was never the
    # factorization — host f64 logs of the device's own chol diagonal gave
    # 2.5e-8, pinning it on TPU's ~100×-ulp BIASED builtin f32 log.  With
    # accurate_log (ops/compensated.py) wired into every log-det path the
    # on-chip ladder lands at logdet 3.2e-8 / total 7.6e-8 rel.  This
    # sweep (builtin log on purpose, via the raw jnp.log below) remains as
    # the discriminating control: its rows still show the biased-log
    # error, b-independent.
    if os.environ.get("ALBATROSS_EXP_DW_SWEEP", "1") != "0":
        from albatross_tpu.ops.compensated import blocked_cholesky_dw, dw_sum

        for bs in (2048, 512, 256):
            diag, _ = blocked_cholesky_dw(
                K32, block_size=bs, rhs=y32, assemble=False
            )
            h, l = dw_sum(jnp.log(diag))
            ld = 2.0 * (float(h) + float(l))
            print(json.dumps({
                "metric": f"dw_logdet_rel_b{bs}_n{N}",
                "value": abs(ld - ld64) / abs(ld64),
                "unit": "rel vs f64 oracle",
            }), flush=True)
        # the builtin on the whole matrix, for reference
        diag_b = jnp.diagonal(jnp.linalg.cholesky(K32))
        ld_b = 2.0 * float(jnp.sum(jnp.log(diag_b)))
        print(json.dumps({
            "metric": f"builtin_chol_logdet_rel_n{N}",
            "value": abs(ld_b - ld64) / abs(ld64),
            "unit": "rel vs f64 oracle",
        }), flush=True)

    only = os.environ.get("ALBATROSS_EXP_ROWS")  # comma-separated tag filter
    for tag, precision, global_precision in (
        ("1pass", None, None),
        ("cholhigh", "high", None),
        ("cholhighest", "highest", None),
        # dw carry + X6 GEMMs (X9 rejected by the v5e AOT compiler).
        # Post-accurate_log (2026-08-20): comp total 7.6e-8, identical to
        # cholhighest — at this conditioning the dw carry adds nothing on
        # top of 3-pass GEMMs; it matters when storage rounding across
        # many panels binds.
        ("doubleword", "double_word", None),
        # the discriminating row: force EVERY matmul (incl. decomposition
        # internals) to HIGHEST via the global default
        ("doubleword_allhi", "double_word", "highest"),
        ("cholhighest_allhi", "highest", "highest"),
    ):
        if only and tag not in only.split(","):
            continue
        parts(tag, precision, global_precision)


if __name__ == "__main__":
    main()
