"""Distributed blocked Cholesky and triangular solves.

TPU-native replacement for the single-node Eigen LDLT at the heart of the
reference's exact GP (serializable_ldlt.hpp) — redesigned as a right-looking
blocked factorization over a 1-D device mesh:

* the matrix lives *row-panel-sharded*: device d owns rows
  [d·b, (d+1)·b) of the N×N SPD matrix (b = N / n_devices);
* each step k all-gathers one N×b column panel over ICI, computes the b×b
  diagonal Cholesky redundantly on every device (tiny), forms the panel
  column of L locally, and applies the rank-b trailing update to its own
  rows — a local (b × N) GEMM that lands on the MXU;
* total communication is G panels ≈ one pass over the matrix, the same
  order as reading it once from HBM.

The panel solves reuse the same layout: block forward/back substitution
with one broadcast per panel.  All collectives are XLA primitives inside
``shard_map`` (all_gather / psum) so they ride ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ..ops.blocked_cholesky import DEFAULT_PANEL_SUB, blocked_tri_inverse


def _i32(*vals):
    """dynamic_slice requires uniform index dtypes; axis_index is int32
    while x64 literals default to int64 — normalize everything."""
    return tuple(jnp.int32(v) for v in vals)


def _local_chol_step(A_local, k, b, G, axis):
    """One right-looking step: returns updated A_local with column block k
    of L written in place."""
    n = b * G
    my = jax.lax.axis_index(axis)

    # gather column panel k from all row shards: (N, b)
    col_local = jax.lax.dynamic_slice(A_local, _i32(0, k * b), (b, b))
    col_full = jax.lax.all_gather(col_local, axis, tiled=True)  # (N, b)

    # diagonal block (redundant compute on every device: b^3 ≪ b^2 N)
    diag = jax.lax.dynamic_slice(col_full, _i32(k * b, 0), (b, b))
    L_kk = jnp.linalg.cholesky(diag)

    # full column panel of L below the diagonal: rows i>k get A_ik L_kk^{-T};
    # the GEMM-composed inverse keeps the panel solve on the MXU (same
    # two-level trick as the single-chip ops/blocked_cholesky.py)
    W = blocked_tri_inverse(L_kk, DEFAULT_PANEL_SUB)
    panel = col_full @ W.T  # (N, b)

    # row masks
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    below = row_ids >= (k + 1) * b

    # assemble this panel's final L values: diag rows -> L_kk, below -> panel,
    # above -> 0
    L_col = jnp.where(below, panel, 0.0)
    diag_rows = jnp.zeros_like(col_full)
    diag_rows = jax.lax.dynamic_update_slice(diag_rows, L_kk, _i32(k * b, 0))
    in_diag_mask = (row_ids >= k * b) & (row_ids < (k + 1) * b)
    L_col = jnp.where(in_diag_mask, diag_rows, L_col)

    # write our rows of L_col into A_local's column block k
    my_rows = jax.lax.dynamic_slice(L_col, _i32(my * b, 0), (b, b))
    A_local = jax.lax.dynamic_update_slice(A_local, my_rows, _i32(0, k * b))

    # trailing update on our local rows: A[:, j>k] -= L_mine L_col[j>k]^T
    L_mine = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0) + my * b >= (k + 1) * b,
        my_rows,
        0.0,
    )
    L_below = jnp.where(below, panel, 0.0)  # (N, b), zero above/diag
    # L_below zeroes all rows ≤ the diagonal block, so this touches only
    # trailing columns — finalized panels (including block k itself) see a
    # zero update.
    A_local = A_local - L_mine @ L_below.T
    return A_local


def _chol_local(A_local, *, b: int, G: int, axis: str):
    def body(k, A):
        return _local_chol_step(A, k, b, G, axis)

    A_local = jax.lax.fori_loop(0, G, body, A_local)
    # zero the strictly-upper triangle of our rows
    n = b * G
    my = jax.lax.axis_index(axis)
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, n), 0) + my * b
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    return jnp.where(cols <= rows, A_local, 0.0)


def distributed_cholesky(A, mesh: Mesh, axis: str = "data"):
    """Cholesky of an SPD matrix row-sharded over ``axis``.

    A must be (N, N) with N divisible by the mesh axis size.  Returns L
    (lower), row-sharded the same way.
    """
    G = mesh.shape[axis]
    n = A.shape[0]
    if n % G != 0:
        raise ValueError(f"N={n} not divisible by mesh axis size {G}")
    b = n // G
    fn = jax.shard_map(
        functools.partial(_chol_local, b=b, G=G, axis=axis),
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=P(axis, None),
    )
    return fn(A)


def _forward_sub_local(L_local, rhs_local, *, b: int, G: int, axis: str):
    """Solve L x = rhs with row-sharded L; returns x replicated (n, m)."""
    my = jax.lax.axis_index(axis)
    n = b * G
    m = rhs_local.shape[1]

    def body(k, x):
        # owner computes its block solve; everyone else contributes zeros.
        # Non-owners' diagonal slices are singular (zeros above the diagonal),
        # so substitute identity there — otherwise reverse-mode through the
        # triangular solve NaN-poisons the gradient even though the forward
        # value is masked out.
        partial = L_local @ x  # (b, m) uses only filled rows of x
        L_kk = jax.lax.dynamic_slice(L_local, _i32(0, k * b), (b, b))
        L_kk = jnp.where(my == k, L_kk, jnp.eye(b, dtype=L_kk.dtype))
        x_k = solve_triangular(L_kk, rhs_local - partial, lower=True)
        contrib = jnp.where(my == k, x_k, jnp.zeros_like(x_k))
        x_k_all = jax.lax.psum(contrib, axis)
        return jax.lax.dynamic_update_slice(x, x_k_all, _i32(k * b, 0))

    x0 = jnp.zeros((n, m), dtype=rhs_local.dtype)
    return jax.lax.fori_loop(0, G, body, x0)


def distributed_sqrt_solve(L, rhs, mesh: Mesh, axis: str = "data"):
    """L^{-1} rhs with L row-sharded; rhs replicated (N,) or (N, m).
    Returns the whitened rhs, replicated."""
    G = mesh.shape[axis]
    n = L.shape[0]
    b = n // G
    vec = rhs.ndim == 1
    rhs2 = rhs[:, None] if vec else rhs
    fn = jax.shard_map(
        functools.partial(_forward_sub_local, b=b, G=G, axis=axis),
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(),
    )
    out = fn(L, rhs2)
    return out[:, 0] if vec else out


def _back_sub_local(L_local, rhs_local, *, b: int, G: int, axis: str):
    """Solve L^T x = rhs with row-sharded L (so L^T is column-sharded)."""
    my = jax.lax.axis_index(axis)
    n = b * G
    m = rhs_local.shape[1]

    def body(i, x):
        k = G - 1 - i
        # x_k = L_kk^{-T} (rhs_k - (L^T x)_k) ; (L^T x)_k = sum over rows r>k
        # of L[r, k-block]^T x_r — each device contributes its own rows.
        Lk_local = jax.lax.dynamic_slice(L_local, _i32(0, k * b), (b, b))  # rows my, cols k
        # contribution of our rows to (L^T x)_k, excluding the diagonal owner
        x_mine = jax.lax.dynamic_slice(x, _i32(my * b, 0), (b, m))
        contrib = Lk_local.T @ jnp.where(my > k, x_mine, jnp.zeros_like(x_mine))
        total = jax.lax.psum(contrib, axis)  # (b, m)
        # identity substitute for non-owners (see _forward_sub_local)
        Lk_safe = jnp.where(my == k, Lk_local, jnp.eye(b, dtype=Lk_local.dtype))
        x_k = solve_triangular(
            Lk_safe.T, rhs_local - total, lower=False
        )  # valid on owner only
        x_k_all = jax.lax.psum(
            jnp.where(my == k, x_k, jnp.zeros_like(x_k)), axis
        )
        return jax.lax.dynamic_update_slice(x, x_k_all, _i32(k * b, 0))

    x0 = jnp.zeros((n, m), dtype=rhs_local.dtype)
    return jax.lax.fori_loop(0, G, body, x0)


def distributed_solve(L, rhs, mesh: Mesh, axis: str = "data"):
    """(L Lᵀ)^{-1} rhs — full solve through both triangles."""
    G = mesh.shape[axis]
    n = L.shape[0]
    b = n // G
    vec = rhs.ndim == 1
    rhs2 = rhs[:, None] if vec else rhs
    y = distributed_sqrt_solve(L, rhs2, mesh, axis)
    fn = jax.shard_map(
        functools.partial(_back_sub_local, b=b, G=G, axis=axis),
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(),
    )
    out = fn(L, y)
    return out[:, 0] if vec else out


def distributed_log_determinant(L, mesh: Mesh, axis: str = "data"):
    """2 Σ log diag(L) with L row-sharded."""
    G = mesh.shape[axis]
    n = L.shape[0]
    b = n // G

    def local(L_local):
        my = jax.lax.axis_index(axis)
        diag = jax.lax.dynamic_slice(L_local, _i32(0, my * b), (b, b))
        return jax.lax.psum(
            2.0 * jnp.sum(jnp.log(jnp.diagonal(diag))), axis
        )

    fn = jax.shard_map(
        local, mesh=mesh, in_specs=P(axis, None), out_specs=P()
    )
    return fn(L)


def distributed_inverse_diagonal(L, mesh: Mesh, axis: str = "data"):
    """diag(A⁻¹) with A = L Lᵀ row-sharded — the engine of fast LOO CV under
    sharding (SURVEY.md §7 'hard parts').

    Strategy: for each column panel j, forward-substitute L X = E_j (the
    identity panel) with the existing distributed solver; the diagonal
    contribution of panel j is the per-column squared norm of X.  G panel
    solves ≈ one full inverse worth of FLOPs, all MXU-tiled.
    """
    G = mesh.shape[axis]
    n = L.shape[0]
    b = n // G
    parts = []
    eye = jnp.eye(n, dtype=L.dtype)
    for j in range(G):
        rhs = eye[:, j * b : (j + 1) * b]
        x = distributed_sqrt_solve(L, rhs, mesh, axis)
        parts.append(jnp.sum(x * x, axis=0))
    return jnp.concatenate(parts)


def distributed_inverse_blocks(L, indices_groups, mesh: Mesh, axis: str = "data"):
    """Diagonal blocks (A⁻¹)_gg from the row-sharded factor — fast LOGO CV
    under sharding.  For each group g, solve L X = E_g (identity columns at
    g's indices) with the distributed forward substitution; the block is
    XᵀX."""
    n = L.shape[0]
    blocks = []
    for idx in indices_groups:
        idx = jnp.asarray(idx)
        rhs = jnp.zeros((n, idx.shape[0]), dtype=L.dtype)
        rhs = rhs.at[idx, jnp.arange(idx.shape[0])].set(1.0)
        x = distributed_sqrt_solve(L, rhs, mesh, axis)
        blocks.append(x.T @ x)
    return blocks
