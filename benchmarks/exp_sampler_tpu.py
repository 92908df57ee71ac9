"""TPU experiment: sampler log-prob throughput variants (backlog #6).

Measures walker-steps/s for the bench.py sampler config (N=1024, W=32)
across log-prob implementations:
  dsl      — current model.log_likelihood through the kernel DSL (baseline)
  manual   — hand-rolled NLML, builtin batched chol (isolates DSL overhead)
  cachedD  — distances precomputed once outside the chain (gram = exp only)
  blocked{b} — cachedD + vmapped blocked_cholesky_cols(block=b)
  gramonly — NLML with the chol replaced by a cheap reduction (profiling:
             how much of the step is gram vs factorization)

Run ON TPU only (python benchmarks/exp_sampler_tpu.py). One process at a time.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import albatross_tpu as ab
from albatross_tpu.core.parameters import set_tunable_params
from albatross_tpu.samplers import ensemble_sampler, initial_params_from_jitter

NS, W, ITERS = 1024, 32, 64
LOG_2PI = float(np.log(2.0 * np.pi))


def probe():
    a = jnp.ones((256, 256), jnp.float32)
    f = jax.jit(lambda a: a @ a)
    t0 = time.perf_counter()
    float(f(a)[0, 0])
    t1 = time.perf_counter()
    float(f(a)[0, 0])
    t2 = time.perf_counter()
    print(f"probe: compile+run {t1-t0:.2f}s, run {t2-t1:.3f}s", flush=True)
    return (t1 - t0) < 120


def time_variant(name, log_prob_fn, init):
    ensemble_sampler(log_prob_fn, init, ITERS, jax.random.PRNGKey(1))
    t0 = time.perf_counter()
    chain = ensemble_sampler(log_prob_fn, init, ITERS, jax.random.PRNGKey(1))
    dt = time.perf_counter() - t0
    sps = W * ITERS / dt
    print(
        f"{name:>12}: {sps:8.1f} walker-steps/s  ({ITERS} iters in {dt:.2f}s)"
        f"  lp[0]={float(chain.log_prob[-1][0]):.3f}",
        flush=True,
    )
    return sps


def main():
    assert probe(), "TPU unhealthy; aborting"
    rng = np.random.default_rng(1)
    x = jnp.asarray(np.sort(rng.uniform(0.0, 10.0, NS)), dtype=jnp.float32)
    y = jnp.sin(x)
    data = ab.RegressionDataset.create(x, y)
    model = ab.gp_from_covariance(
        ab.SquaredExponential(1.5, 1.0) + ab.IndependentNoise(0.1),
        jitter=1e-5,
    )
    params0 = model.get_params()
    t0vals = model.get_tunable_parameters().values
    init = initial_params_from_jitter(jax.random.PRNGKey(0), t0vals, W)

    # -- dsl baseline --------------------------------------------------------
    def dsl_lp(t):
        return model.set_params(set_tunable_params(params0, t)).log_likelihood(data)

    time_variant("dsl", jax.jit(jax.vmap(dsl_lp)), init)

    # -- manual NLML ---------------------------------------------------------
    # tunable order is sorted by name: independent_noise_sigma,
    # sigma_squared_exponential, squared_exponential_length_scale
    names = model.get_tunable_parameters().names
    print("tunable order:", names, flush=True)
    D2 = (x[:, None] - x[None, :]) ** 2

    def manual_kernel(t, d2):
        sn, s, ls = t[0], t[1], t[2]
        K = s * s * jnp.exp(-d2 / (2.0 * ls * ls))
        return K + (sn * sn + 1e-5) * jnp.eye(d2.shape[0], dtype=d2.dtype)

    def manual_nlml(L, yv):
        z = jax.scipy.linalg.solve_triangular(L, yv[:, None], lower=True)[:, 0]
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
        return -0.5 * (logdet + jnp.sum(z * z) + yv.shape[0] * LOG_2PI)

    def manual_lp(t):
        xq = x  # distances recomputed inside (like the DSL does)
        d2 = (xq[:, None] - xq[None, :]) ** 2
        K = manual_kernel(t, d2)
        return manual_nlml(jnp.linalg.cholesky(K), y)

    time_variant("manual", jax.jit(jax.vmap(manual_lp)), init)

    # -- cached distances ------------------------------------------------------
    def cached_lp(t):
        K = manual_kernel(t, D2)
        return manual_nlml(jnp.linalg.cholesky(K), y)

    time_variant("cachedD", jax.jit(jax.vmap(cached_lp)), init)

    # -- blocked chol variants -------------------------------------------------
    from albatross_tpu.ops.blocked_cholesky import blocked_cholesky_cols

    for b, sub in ((512, 128), (256, 128), (512, 256)):
        def blocked_lp(t, b=b, sub=sub):
            K = manual_kernel(t, D2)
            L = blocked_cholesky_cols(K, block_size=b, panel_sub=sub)
            return manual_nlml(L, y)

        time_variant(f"blocked{b}/{sub}", jax.jit(jax.vmap(blocked_lp)), init)

    # -- gram-only profile ------------------------------------------------------
    def gramonly_lp(t):
        K = manual_kernel(t, D2)
        return -jnp.sum(K * 1e-9) - jnp.sum(t * t)  # finite, cheap

    time_variant("gramonly", jax.jit(jax.vmap(gramonly_lp)), init)


if __name__ == "__main__":
    main()
