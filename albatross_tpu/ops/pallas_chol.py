"""Pallas fused panel Cholesky + triangular inverse.

The serial panel critical path is the measured bottleneck of the blocked
NLML factorization (round-4 breakdown at N=28672: ~25 ms of ~76 ms/eval is
panel chol+inverse work, and XLA:TPU executes one fusion at a time so it
cannot overlap with the trailing GEMMs).  XLA's builtin ``cholesky(b)`` is
latency-bound (~1.9 ms at b=2048, ~9% of peak): its internal recursion
round-trips HBM per sub-step and its inverse is a separate pass
(`blocked_tri_inverse`) that re-reads the factor.

This kernel computes BOTH the factor and its inverse of a b×b SPD panel in
ONE VMEM-resident pallas program (b ≤ 1024: 3 b² f32 buffers = 12.6 MB of
the 16 MB VMEM):

* everything lives in the TRANSPOSED (upper-triangular) space — the kernel
  returns ``U = Lᵀ`` and ``Wu = (L⁻¹)ᵀ = U⁻¹`` — so every internal matmul
  is a ``dot_general`` contracting dim 0 (no explicit transposes, which
  cost relayouts on TPU);
* 128×128 diagonal tiles factor via a vectorized rank-1 recursion: per
  step one dynamic ROW slice (sublane slicing is cheap; lane slicing is
  not), a masked pivot reduction, and an MXU outer-product update;
* tile inverses use Newton's iteration X ← X + X(I − UX) from X₀ =
  diag(U)⁻¹: the residual I − UX is STRICTLY upper-triangular, hence
  nilpotent of index 128, so 7 iterations (2⁷ ≥ 128) give the EXACT
  substitution inverse up to f32 rounding — 14 small MXU matmuls replace a
  128-step substitution;
* off-diagonal solves, trailing updates, and the panel-inverse composition
  are 128³ MXU matmuls at precision=HIGHEST (3-pass bf16 ≈ f32-faithful —
  the panel recursion feeds later Cholesky inputs, where 1-pass rounding
  is what NaNs the N≥28672 regime; at 128³ the extra passes are free).

Reference capability matched: the factorization engine of
/root/reference/include/albatross/src/eigen/serializable_ldlt.hpp:19-80 —
redesigned as a TPU kernel rather than a translation of Eigen's LDLT.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_T = 128  # MXU/VPU-native tile edge
_HI = jax.lax.Precision.HIGHEST


def _ts(t: int) -> slice:
    return slice(t * _T, (t + 1) * _T)


def _dot00(a, b):
    """aᵀ @ b as a dim-0 contraction (no materialized transpose)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), precision=_HI,
        preferred_element_type=jnp.float32,
    )


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), precision=_HI,
        preferred_element_type=jnp.float32,
    )


def _chol_tile_upper(tile):
    """U such that Uᵀ U = tile (upper-triangular), via 128 rank-1 steps.

    Row j of the result is column j of the classic lower factor.  Works on
    a (128, 128) value; the strict lower triangle is zeroed on exit."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _T), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (_T, 1), 0)

    def body(j, a):
        # row j via a masked sublane reduction — Mosaic has no
        # dynamic_slice on values, and the reduction is a cheap VPU op
        is_row = sub == j
        row = jnp.sum(jnp.where(is_row, a, 0.0), axis=0, keepdims=True)
        pivot = jnp.sum(jnp.where(lane == j, row, 0.0))
        inv_sqrt = 1.0 / jnp.sqrt(pivot)
        lrow = jnp.where(lane >= j, row * inv_sqrt, 0.0)
        # column j from the TRAILING region's preserved symmetry (rows and
        # columns > j receive symmetric rank-1 updates), via a masked lane
        # reduction — gives the (128, 1) orientation without a transpose,
        # so the rank-1 update is a pure VPU broadcast multiply (the MXU
        # dim-0-contraction outer forced a relayout per step)
        lcol = jnp.sum(jnp.where(lane == j, a, 0.0), axis=1, keepdims=True)
        lcol = jnp.where(sub > j, lcol * inv_sqrt, 0.0)
        # write row j and subtract the rank-1 update below it, in one select
        return jnp.where(is_row, lrow, a - lcol * lrow)

    # Mosaic's for-loop lowering supports only unroll=1 or full unroll;
    # full unroll (128 inlined bodies per tile, x tiles per panel) blows up
    # both interpret-mode tracing and the remote Mosaic compile, so the
    # rolled loop stays
    out = jax.lax.fori_loop(0, _T, body, tile)
    return jnp.where(sub <= lane, out, 0.0)


def _tri_upper_inv(u):
    """U⁻¹ for upper-triangular (128, 128) U via Newton's iteration.

    E₀ = I − U X₀ with X₀ = diag(U)⁻¹ is strictly upper-triangular, so
    Eₖ = E₀^(2^k) vanishes exactly once 2^k ≥ 128: seven iterations, each
    two MXU matmuls, reproduce the substitution inverse to f32 rounding."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _T), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (_T, 1), 0)
    eye_mask = sub == lane
    d = jnp.sum(jnp.where(eye_mask, u, 0.0), axis=0, keepdims=True)  # (1,128)
    x = jnp.where(eye_mask, 1.0 / d, 0.0)
    eye = jnp.where(eye_mask, 1.0, 0.0)
    for _ in range(7):
        e = eye - _dot(u, x)
        x = x + _dot(x, e)
    return x


def _panel_kernel(a_ref, u_ref, wu_ref, *, tiles: int):
    """U = chol(A)ᵀ and Wu = U⁻¹ of a (b, b) SPD panel, fully in VMEM.

    The upper triangle of u_ref is transformed in place tile by tile
    (right-looking); the never-read strict-lower region keeps stale input
    values until the final masking."""
    u_ref[...] = a_ref[...]
    T = tiles
    for t in range(T):
        utt = _chol_tile_upper(u_ref[_ts(t), _ts(t)])
        u_ref[_ts(t), _ts(t)] = utt
        wtt = _tri_upper_inv(utt)
        wu_ref[_ts(t), _ts(t)] = wtt
        # solved row of off-diagonal tiles: U[t, r] = Wuₜₜᵀ @ A[t, r]
        # (A symmetric ⇒ the transposed below-panel solve, upper-space)
        for r in range(t + 1, T):
            u_ref[_ts(t), _ts(r)] = _dot00(wtt, u_ref[_ts(t), _ts(r)])
        # trailing update: A[r1, r2] −= U[t, r1]ᵀ @ U[t, r2]
        for r1 in range(t + 1, T):
            b1 = u_ref[_ts(t), _ts(r1)]
            for r2 in range(r1, T):
                u_ref[_ts(r1), _ts(r2)] = u_ref[_ts(r1), _ts(r2)] - _dot00(
                    b1, u_ref[_ts(t), _ts(r2)]
                )
    # compose the panel inverse: Wu[c, r] = −(Σ_{k=c}^{r−1} Wu[c,k] U[k,r]) Wu_rr
    for r in range(1, T):
        wrr = wu_ref[_ts(r), _ts(r)]
        for c in range(r):
            acc = _dot(wu_ref[_ts(c), _ts(c)], u_ref[_ts(c), _ts(r)])
            for k in range(c + 1, r):
                acc = acc + _dot(wu_ref[_ts(c), _ts(k)], u_ref[_ts(k), _ts(r)])
            wu_ref[_ts(c), _ts(r)] = -_dot(acc, wrr)
    # zero the strict-lower garbage so U/Wu are honest triangulars
    sub = jax.lax.broadcasted_iota(jnp.int32, (T * _T, 1), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, T * _T), 1)
    upper = sub <= lane
    u_ref[...] = jnp.where(upper, u_ref[...], 0.0)
    wu_ref[...] = jnp.where(upper, wu_ref[...], 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_panel_cholinv(A, interpret: bool | None = None):
    """(U, Wu) with Uᵀ U = A, Wu = U⁻¹, both upper-triangular f32.

    The caller-facing factor/inverse are L = Uᵀ and W = L⁻¹ = Wuᵀ; the
    no-assemble NLML path needs only diag(U) (= diag(L)) and GEMMs against
    W — XLA cancels the transpose pairs.  b must be a multiple of 128 and
    ≤ 1024 (three b² f32 buffers must fit VMEM)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    A = jnp.asarray(A, jnp.float32)
    b = A.shape[0]
    if b % _T != 0 or b > 1024:
        raise ValueError(
            f"pallas_panel_cholinv needs b % 128 == 0 and b <= 1024, got {b}"
        )
    u, wu = pl.pallas_call(
        functools.partial(_panel_kernel, tiles=b // _T),
        out_shape=(
            jax.ShapeDtypeStruct((b, b), jnp.float32),
            jax.ShapeDtypeStruct((b, b), jnp.float32),
        ),
        interpret=interpret,
    )(A)
    return u, wu
