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


# Largest d/ls where a profile is still > ~1e-3·σ² — the refinement radius
# of the MXU distance path (see _gram_kernel): beyond it, kernel values (and
# therefore any d² error) are negligible; inside it, tiles recompute the
# distances elementwise-exactly.  (d/ls)² bounds: SE e^{-x²}<1e-3 at x²=7;
# exponential e^{-x}<1e-3 at x=6.9 → x²=48; matérns decay slower → 81.
_REFINE_D2_OVER_LS2 = {
    "squared_exponential": 7.0,
    "exponential": 48.0,
    "matern_32": 81.0,
    "matern_52": 81.0,
}

# Feature count at which the kernel switches from the elementwise VPU loop
# (exact, O(D·T²) vector ops — fine for small D) to the MXU contraction
# (VERDICT r3 #3: at D=32 the python-over-D VPU loop was 32 sequential
# (T,T) passes and lost to plain XLA by 1.6×).
_MXU_MIN_D = 8


def _elementwise_d2(x, y, d: int):
    """Exact squared distances: (x_k − y_k)² accumulated on the VPU in the
    input dtype.  Bitwise-symmetric (negation and square are exact), zero
    on the diagonal when x is y — the reference's per-pair semantics
    (distance_metrics.hpp)."""
    d2 = jnp.zeros((x.shape[0], y.shape[0]), dtype=x.dtype)
    for k in range(d):
        diff = x[:, k][:, None] - y[:, k][None, :]
        d2 = d2 + diff * diff
    return d2


def _gram_kernel(params_ref, x_ref, y_ref, out_ref, *, profile: str, d: int):
    length_scale = params_ref[0]
    sigma = params_ref[1]
    if d < _MXU_MIN_D:
        # small D: the exact VPU loop is cheap and bitwise-symmetric
        out_ref[:] = _apply_profile(
            profile, _elementwise_d2(x_ref[:], y_ref[:], d), length_scale,
            sigma,
        ).astype(out_ref.dtype)
        return
    # MXU contraction: d² = |x−c|² + |y−c|² − 2(x−c)·(y−c)ᵀ on per-tile-pair
    # CENTERED coordinates.  Centering is what makes the in-tile range safe:
    # the classic global matmul-trick cancels at eps·‖x‖² absolute (NaN
    # Cholesky at feature magnitude ~100, CLAUDE.md), while here the error
    # is eps·(tile spread about c)².  c is symmetric under (i,j)↔(j,i) and
    # x²/y² use identical reduction code, so the result stays
    # bitwise-symmetric.  Residual near-field error is then killed by the
    # refinement below; far-field error is suppressed by the profile itself
    # (error in k ≈ k·δ/ls², and k < 1e-3·σ² outside the refinement
    # radius).
    x = x_ref[:]  # input dtype preserved (f64 callers keep f64 accuracy)
    y = y_ref[:]
    c = 0.5 * (
        jnp.mean(x, axis=0, keepdims=True)
        + jnp.mean(y, axis=0, keepdims=True)
    )
    xc = x - c
    yc = y - c
    x2 = jnp.sum(xc * xc, axis=1, keepdims=True)  # (T, 1)
    y2 = jnp.sum(yc * yc, axis=1, keepdims=True)  # (T, 1), same reduction
    cross = jax.lax.dot_general(
        xc,
        yc,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=x.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    d2 = jnp.maximum(x2 + y2.T - 2.0 * cross, 0.0)
    out_ref[:] = _apply_profile(profile, d2, length_scale, sigma).astype(
        out_ref.dtype
    )

    # near-field refinement: any tile containing a pair inside the
    # profile's support recomputes exactly (predicated — for spread data
    # only the ~N/T diagonal-ish tiles trigger, so the D-loop cost is
    # O(D·T·N), not O(D·N²)).  Diagonal tiles always trigger (d²=0), which
    # restores the exact k(x,x)=σ² diagonal the factorization relies on.
    cut = _REFINE_D2_OVER_LS2[profile] * length_scale * length_scale

    @pl.when(jnp.min(d2) <= cut)
    def _refine():
        out_ref[:] = _apply_profile(
            profile, _elementwise_d2(x, y, d), length_scale, sigma
        ).astype(out_ref.dtype)


def _gram_diag_kernel(
    params_ref, x_ref, y_ref, diag_ref, out_ref, *, profile: str, d: int
):
    """Gram tile + fused diagonal add (the training-covariance epilogue —
    noise σ² + target variance + jitter — folded into the same VMEM tile, so
    the complete factorization input is written in ONE pass over HBM)."""
    _gram_kernel(params_ref, x_ref, y_ref, out_ref, profile=profile, d=d)
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(i == j)
    def _add_diag():
        t = out_ref.shape[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        on_diag = rows == cols
        # diag arrives as an (tile, 1) 2-D block (1-D operands trip Mosaic
        # layout checks against XLA's T(1024) vector tiling)
        out_ref[:] = out_ref[:] + jnp.where(
            on_diag, diag_ref[:].astype(out_ref.dtype), 0.0
        )


def _pad_rows(arr, multiple, edge: bool = False):
    """Pad rows up to a tile multiple.  ``edge=True`` replicates the last
    row instead of zero-filling: the padded outputs are sliced away either
    way, but the MXU path's per-tile CENTER is a mean over all tile rows —
    zero rows in a partial tile would drag the center toward the origin
    and reintroduce exactly the large-|x| cancellation the centering
    exists to remove (review finding, round 4)."""
    n = arr.shape[0]
    padded = (n + multiple - 1) // multiple * multiple
    if padded == n:
        return arr, n
    if edge:
        pad = jnp.broadcast_to(
            arr[-1:], (padded - n,) + arr.shape[1:]
        ).astype(arr.dtype)
    else:
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
    diag_add=None,
):
    """(N, M) radial Gram matrix with fused distance+profile tiles.

    X, Y: (N, D) / (M, D) float arrays (1-D inputs are reshaped).
    ``diag_add`` (N,) — for the symmetric case — is added along the global
    diagonal inside the kernel (noise/jitter/target-variance epilogue).
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

    Xp, n = _pad_rows(X, tile, edge=True)
    Yp, m = _pad_rows(Y, tile, edge=True)
    # scalar params ride SMEM in the INPUT dtype: an f64 caller (CPU/x64)
    # must not have its hyperparameters silently rounded to f32
    params = jnp.asarray(
        [length_scale, sigma],
        dtype=jnp.float64 if dtype == jnp.float64 else jnp.float32,
    )

    grid = (Xp.shape[0] // tile, Yp.shape[0] // tile)
    if diag_add is None:
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

    diag_p, _ = _pad_rows(jnp.asarray(diag_add, dtype=dtype), tile)
    diag_p = diag_p[:, None]  # (N, 1): see _gram_diag_kernel layout note
    out = pl.pallas_call(
        functools.partial(_gram_diag_kernel, profile=profile, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, d), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, d), lambda i, j: (j, 0)),
            pl.BlockSpec((tile, 1), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Xp.shape[0], Yp.shape[0]), dtype),
        interpret=interpret,
    )(params, Xp, Yp, diag_p)
    return out[:n, :m]


# ---------------------------------------------------------------------------
# Differentiable wrapper: Pallas forward, XLA closed-form backward.
# ---------------------------------------------------------------------------
def _xla_reference_gram(X, Y, length_scale, sigma, profile: str):
    """Closed form used for the VJP (and as fallback).

    D ≤ 8: broadcast differences (exact, XLA fuses the reduce).  D > 8: the
    |x|²+|y|²−2x·y GEMM form at HIGHEST — the (N, M, D) broadcast tensor is
    too slow/large for the backward at high D, and gradient-side
    cancellation noise (~1e-5) is acceptable where forward values are not.
    """
    if X.shape[-1] <= 8:
        diff = X[:, None, :] - Y[None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1)
    else:
        x2 = jnp.sum(X * X, axis=-1)
        y2 = jnp.sum(Y * Y, axis=-1)
        d2 = (
            x2[:, None]
            + y2[None, :]
            - 2.0 * jnp.matmul(X, Y.T, precision=jax.lax.Precision.HIGHEST)
        )
        d2 = jnp.maximum(d2, 0.0)
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


# ---------------------------------------------------------------------------
# Whole-training-covariance fusion: gram + noise/jitter/target-variance
# diagonal in ONE pallas pass (the epilogue XLA fuses on its path — folding
# it into the kernel was the round-1 backlog's named fix for why the pallas
# gram lost inside the full NLML pipeline).
# ---------------------------------------------------------------------------
def match_fused_training_cov(kernel, X, for_measurements: bool):
    """Pattern-match ``radial + diag-only terms`` and return
    (radial_leaf, ls, sigma, diag_scalar) or None.

    Recognized diag terms: IndependentNoise/Nugget with assume_unique (an
    equality mask would need the N² comparison the fusion avoids), each
    optionally wrapped in measurement_only — live only when
    ``for_measurements`` (training covariance semantics).
    """
    from ..kernels.base import SumKernel
    from ..kernels.distances import EuclideanDistance
    from ..kernels.measurement import MeasurementOnly
    from ..kernels.noise import _EqualityNoise
    from ..kernels.radial import _RadialKernel

    terms = []

    def flatten(node):
        if isinstance(node, SumKernel):
            flatten(node.lhs)
            flatten(node.rhs)
        else:
            terms.append(node)

    flatten(kernel)
    radial = None
    diag_scalar = 0.0
    for term in terms:
        live = True
        if isinstance(term, MeasurementOnly):
            live = for_measurements
            term = term.sub
        if isinstance(term, _RadialKernel):
            if radial is not None or not term._profile_name:
                return None
            if not isinstance(term.distance_metric, EuclideanDistance):
                return None
            if not live:
                return None
            radial = term
        elif isinstance(term, _EqualityNoise):
            if not getattr(term, "assume_unique", False):
                return None
            if live:
                diag_scalar = diag_scalar + term._sigma2()
        else:
            return None
    if radial is None:
        return None
    ls, sigma = radial._params_values()
    return radial, ls, sigma, diag_scalar


def fused_training_covariance(
    kernel, X, target_variance=None, jitter: float = 0.0
):
    """Complete training covariance K + σ²I + diag(var) + jitter·I as one
    fused pallas pass, or None when the kernel/batch doesn't qualify.
    Differentiable (pallas forward, XLA closed-form VJP)."""
    from .. import config

    matched = match_fused_training_cov(kernel, X, for_measurements=True)
    if matched is None:
        return None
    _, ls, sigma, diag_scalar = matched
    leaves = jax.tree_util.tree_leaves(X)
    if len(leaves) != 1 or leaves[0].ndim > 2:
        return None
    x = leaves[0]
    d = 1 if x.ndim == 1 else x.shape[-1]
    if not config.pallas_gram_enabled(x.shape[0] * x.shape[0], x.dtype, d):
        return None
    diag = jnp.full((x.shape[0],), diag_scalar, dtype=x.dtype) + jitter
    if target_variance is not None:
        diag = diag + target_variance
    return fused_radial_gram_diag(
        x, ls, sigma, diag, matched[0]._profile_name
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_radial_gram_diag(X, length_scale, sigma, diag, profile):
    return pallas_radial_gram(
        X, X, length_scale, sigma, profile, diag_add=diag
    )


def _fused_diag_fwd(X, length_scale, sigma, diag, profile):
    out = fused_radial_gram_diag(X, length_scale, sigma, diag, profile)
    return out, (X, length_scale, sigma, diag)


def _fused_diag_bwd(profile, residuals, cotangent):
    X, length_scale, sigma, diag = residuals
    X2 = X[:, None] if X.ndim == 1 else X

    def ref(x, l, s, dg):
        return _xla_reference_gram(x, x, l, s, profile) + jnp.diag(dg)

    _, vjp_fn = jax.vjp(ref, X2, length_scale, sigma, diag)
    gX, gl, gs, gd = vjp_fn(cotangent)
    if X.ndim == 1:
        gX = gX[:, 0]
    return gX, gl, gs, gd


fused_radial_gram_diag.defvjp(_fused_diag_fwd, _fused_diag_bwd)
