"""TPU experiment: blocked_cholesky_cols trailing-update write strategy.

Current: cols[j] = concat(cols[j][:j0], updated) — a full (n,b) rebuild per
(k,j) pair, copying rows that are either dead (above-diagonal, zeroed by the
final tril) or unchanged.  Variant: dynamic_update_slice of just the updated
rows, which XLA can lower to an in-place write when the old buffer is dead.

Run ON TPU only.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from albatross_tpu.ops.blocked_cholesky import (
    DEFAULT_PANEL_SUB,
    _panel_chol_inverse,
    auto_block_size,
    blocked_cholesky_cols,
)

N = 20480


def chol_cols_dus(K, block_size=None):
    n = K.shape[0]
    b = block_size or auto_block_size(n)
    G = n // b
    cols = [jax.lax.slice(K, (0, k * b), (n, (k + 1) * b)) for k in range(G)]
    for k in range(G):
        k0 = k * b
        col = cols[k]
        Akk = col[k0 : k0 + b]
        Lkk, W = _panel_chol_inverse(Akk, DEFAULT_PANEL_SUB)
        below = col[k0 + b :] @ W.T
        # rows < k0 are strictly above the diagonal -> killed by the final
        # tril, so only the factored rows need writing
        cols[k] = jax.lax.dynamic_update_slice(
            col, jnp.concatenate([Lkk, below], axis=0), (k0, 0)
        )
        for j in range(k + 1, G):
            j0 = j * b
            Lj = below[j0 - k0 - b : j0 - k0]
            Lrows = below[j0 - k0 - b :]
            cols[j] = jax.lax.dynamic_update_slice(
                cols[j], cols[j][j0:] - Lrows @ Lj.T, (j0, 0)
            )
    return jnp.tril(jnp.concatenate(cols, axis=1))


def bench(fn, K, name, reps=4):
    f = jax.jit(fn)
    L = f(K)
    float(L[0, 0])
    t0 = time.perf_counter()
    prev = jnp.float32(0.0)
    for _ in range(reps):
        L = f(K + prev * jnp.eye(K.shape[0], dtype=K.dtype))
        prev = L[0, 0] * jnp.float32(1e-30)
    float(prev)
    dt = (time.perf_counter() - t0) / reps
    tf = (K.shape[0] ** 3 / 3.0) / dt / 1e12
    print(f"{name:>10}: {dt*1000:8.1f} ms  {tf:6.1f} TF/s", flush=True)
    return L


def main():
    a = jnp.ones((256, 256), jnp.float32)
    t0 = time.perf_counter()
    float(jax.jit(lambda a: a @ a)(a)[0, 0])
    print(f"probe {time.perf_counter()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0.0, 100.0, N)).astype(np.float32)
    d2 = (x[:, None] - x[None, :]) ** 2
    K = jnp.asarray(np.exp(-d2 / (2.0 * 0.5**2)) + 0.09 * np.eye(N, dtype=np.float32))

    L_ref = bench(lambda K: blocked_cholesky_cols(K), K, "concat")
    L_dus = bench(chol_cols_dus, K, "dus")
    err = float(jnp.max(jnp.abs(L_ref - L_dus)))
    print(f"max |L_concat - L_dus| = {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
