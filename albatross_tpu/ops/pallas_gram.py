"""Pallas fused Gram kernel for radial covariances.

The Gram matrix is the framework's second-hottest op after the Cholesky
(callers.hpp:107-166 is the reference's threaded equivalent).  The XLA path
materializes the (N, M) distance matrix in HBM before the profile epilogue;
this kernel fuses distance + radial profile (+ scaling) per VMEM tile, so
each output element is computed and written exactly once:

    grid (N/T, M/T); each program loads an (T, D) tile of X and (T, D) tile
    of Y, accumulates squared distances over D on the VPU, applies the
    radial profile in-register, and writes one (T, T) output tile.

Supported profiles: squared_exponential, exponential, matern_32, matern_52
(the closed forms of radial.hpp).  Scalar hyperparameters arrive via SMEM.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256

PROFILES = ("squared_exponential", "exponential", "matern_32", "matern_52")


def _apply_profile(profile: str, d2, length_scale, sigma):
    """Radial profile on squared distances (d² avoids sqrt where possible)."""
    s2 = sigma * sigma
    if profile == "squared_exponential":
        return s2 * jnp.exp(-d2 / (length_scale * length_scale))
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    scaled = d / length_scale
    if profile == "exponential":
        return s2 * jnp.exp(-scaled)
    if profile == "matern_32":
        sqrt3 = math.sqrt(3.0) * scaled
        return s2 * (1.0 + sqrt3) * jnp.exp(-sqrt3)
    if profile == "matern_52":
        sqrt5 = math.sqrt(5.0) * scaled
        return s2 * (1.0 + sqrt5 + sqrt5 * sqrt5 / 3.0) * jnp.exp(-sqrt5)
    raise ValueError(f"unknown profile {profile}")


def _gram_kernel(params_ref, x_ref, y_ref, out_ref, *, profile: str, d: int):
    length_scale = params_ref[0]
    sigma = params_ref[1]
    # accumulate squared distances over feature dims on the VPU
    d2 = jnp.zeros(out_ref.shape, dtype=jnp.float32)
    for k in range(d):
        xk = x_ref[:, k][:, None]
        yk = y_ref[:, k][None, :]
        diff = xk - yk
        d2 = d2 + diff * diff
    out_ref[:] = _apply_profile(profile, d2, length_scale, sigma).astype(
        out_ref.dtype
    )


def _pad_rows(arr, multiple):
    n = arr.shape[0]
    padded = (n + multiple - 1) // multiple * multiple
    if padded == n:
        return arr, n
    pad = jnp.zeros((padded - n,) + arr.shape[1:], dtype=arr.dtype)
    return jnp.concatenate([arr, pad], axis=0), n


@functools.partial(
    jax.jit, static_argnames=("profile", "tile", "interpret")
)
def pallas_radial_gram(
    X,
    Y,
    length_scale,
    sigma,
    profile: str = "squared_exponential",
    tile: int = TILE,
    interpret: bool | None = None,
):
    """(N, M) radial Gram matrix with fused distance+profile tiles.

    X, Y: (N, D) / (M, D) float arrays (1-D inputs are reshaped).
    """
    if interpret is None:
        # auto: interpreter mode keeps the kernel usable on CPU (tests, dev)
        interpret = jax.default_backend() == "cpu"
    X = jnp.asarray(X)
    Y = jnp.asarray(Y)
    if X.ndim == 1:
        X = X[:, None]
    if Y.ndim == 1:
        Y = Y[:, None]
    d = X.shape[1]
    dtype = X.dtype

    Xp, n = _pad_rows(X, tile)
    Yp, m = _pad_rows(Y, tile)
    params = jnp.asarray(
        [length_scale, sigma], dtype=jnp.float32
    )

    grid = (Xp.shape[0] // tile, Yp.shape[0] // tile)
    out = pl.pallas_call(
        functools.partial(_gram_kernel, profile=profile, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, d), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, d), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Xp.shape[0], Yp.shape[0]), dtype),
        interpret=interpret,
    )(params, Xp, Yp)
    return out[:n, :m]


# ---------------------------------------------------------------------------
# Differentiable wrapper: Pallas forward, XLA closed-form backward.
# ---------------------------------------------------------------------------
def _xla_reference_gram(X, Y, length_scale, sigma, profile: str):
    """Broadcast-based closed form used for the VJP (and as fallback)."""
    diff = X[:, None, :] - Y[None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    return _apply_profile(profile, d2, length_scale, sigma)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_radial_gram(X, Y, length_scale, sigma, profile, tile=TILE):
    """Radial gram with a fused Pallas forward pass and exact gradients.

    Gradients run through the XLA closed form (standard practice: the
    backward pass re-derives from residuals), so NLML autodiff is exact.
    """
    return pallas_radial_gram(X, Y, length_scale, sigma, profile, tile)


def _fused_fwd(X, Y, length_scale, sigma, profile, tile=TILE):
    out = pallas_radial_gram(X, Y, length_scale, sigma, profile, tile)
    return out, (X, Y, length_scale, sigma)


def _fused_bwd(profile, tile, residuals, cotangent):
    X, Y, length_scale, sigma = residuals
    X2 = X[:, None] if X.ndim == 1 else X
    Y2 = Y[:, None] if Y.ndim == 1 else Y
    _, vjp_fn = jax.vjp(
        lambda x, y, l, s: _xla_reference_gram(x, y, l, s, profile),
        X2,
        Y2,
        length_scale,
        sigma,
    )
    gX, gY, gl, gs = vjp_fn(cotangent)
    if X.ndim == 1:
        gX = gX[:, 0]
    if Y.ndim == 1:
        gY = gY[:, 0]
    return gX, gY, gl, gs


fused_radial_gram.defvjp(_fused_fwd, _fused_bwd)
