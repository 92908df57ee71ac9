"""Panel-factorization strategies for the blocked Cholesky (VERDICT r3 #6).

At N=28672 / b=1792 the headline pipeline spends ~40% of its wall on the
SERIAL per-panel work (builtin chol(b) + triangular inverse) — the trailing
GEMMs already run near bf16 peak.  This measures the candidates for cutting
the per-panel critical path on-chip:

  builtin      — jnp.linalg.cholesky(b)                       [current]
  recursive256 — right-looking blocked chol of the panel itself at
                 sub-panels of 256 (7 small chols + GEMMs)
  recursive448 — same at 448 (4 sub-panels)
  fused_inv    — recursive256 that also composes W = L^-1 from the
                 sub-inverses it already needs, replacing the separate
                 blocked_tri_inverse pass

plus the full-pipeline effect of the winner (NLML evals/s at N=28672).

Usage (healthy tunnel only — probe first):
    python -m benchmarks.exp_chol_panel [--micro-only]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular

from albatross_tpu.ops.blocked_cholesky import blocked_tri_inverse

B = 1792
SUBS = {"recursive256": 256, "recursive448": 448}


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def timeit(fn, *args, reps=8):
    out = fn(*args)
    sync(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / reps


def recursive_chol(A, sub):
    """Right-looking blocked chol of a (B, B) panel, unrolled over sub."""
    n = A.shape[0]
    cols = [
        jax.lax.slice(A, (0, k * sub), (n, (k + 1) * sub))
        for k in range(n // sub)
    ]
    for k in range(n // sub):
        k0 = k * sub
        Lkk = jnp.linalg.cholesky(cols[k][k0 : k0 + sub])
        Winv = solve_triangular(Lkk, jnp.eye(sub, dtype=A.dtype), lower=True)
        below = cols[k][k0 + sub :] @ Winv.T
        cols[k] = jnp.concatenate(
            [jnp.zeros((k0, sub), A.dtype), Lkk, below], axis=0
        )
        for j in range(k + 1, n // sub):
            j0 = j * sub
            Lj = below[j0 - k0 - sub : j0 - k0]
            Lrows = below[j0 - k0 - sub :]
            upd = cols[j][j0:] - Lrows @ Lj.T
            cols[j] = jnp.concatenate([cols[j][:j0], upd], axis=0)
    return jnp.tril(jnp.concatenate(cols, axis=1))


def fused_chol_inverse(A, sub):
    """Library implementation (ops/blocked_cholesky.py): right-looking
    blocked chol of the panel that ALSO composes W = L⁻¹ from the
    sub-block inverses the recursion materializes anyway."""
    from albatross_tpu.ops.blocked_cholesky import fused_panel_chol_inverse

    return fused_panel_chol_inverse(A, sub)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--micro-only", action="store_true")
    ap.add_argument("--b", type=int, default=B)
    args = ap.parse_args()
    b = args.b

    rng = np.random.default_rng(0)
    Araw = rng.standard_normal((b, b)).astype(np.float32)
    A = jnp.asarray(Araw @ Araw.T + b * np.eye(b, dtype=np.float32))

    builtin = jax.jit(jnp.linalg.cholesky)
    tri_inv = jax.jit(lambda L: blocked_tri_inverse(L, 256))
    t_builtin = timeit(builtin, A)
    L = builtin(A)
    t_inv = timeit(tri_inv, L)
    print(f"builtin chol({b}): {t_builtin * 1e3:.2f} ms")
    print(f"blocked_tri_inverse({b}, sub=256): {t_inv * 1e3:.2f} ms")
    for name, sub in SUBS.items():
        if b % sub != 0:
            continue
        fn = jax.jit(lambda A, s=sub: recursive_chol(A, s))
        t = timeit(fn, A)
        err = float(
            jnp.max(jnp.abs(fn(A) - builtin(A)))
        )
        print(f"{name} chol({b}): {t * 1e3:.2f} ms (max|Δ| vs builtin {err:.1e})")
    fused = jax.jit(lambda A: fused_chol_inverse(A, 256))
    t_f = timeit(fused, A)
    print(
        f"fused chol+inv({b}, 256): {t_f * 1e3:.2f} ms "
        f"(vs builtin+inv {1e3 * (t_builtin + t_inv):.2f} ms)"
    )

    if args.micro_only:
        return

    # full-pipeline A/B at the headline size via the config knob
    from albatross_tpu import config
    from bench import _measure_nlml

    flops = 28672**3 / 3 + 9 * 28672**2
    for mode in (None, "fused"):
        config.PANEL_FACTORIZER = mode
        per_eval = _measure_nlml(28672, 4)
        print(
            f"pipeline[{mode or 'builtin'}]: {1.0 / per_eval:.2f} evals/s, "
            f"{flops / per_eval / 1e12:.1f} TF/s"
        )
    config.PANEL_FACTORIZER = None


if __name__ == "__main__":
    main()
