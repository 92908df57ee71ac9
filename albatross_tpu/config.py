"""Runtime configuration knobs."""

from __future__ import annotations

import jax

# Fused Pallas gram: measured ~1.8x faster than the XLA broadcast path in
# isolation on v5e, but *slower inside the full NLML pipeline* (it blocks
# XLA from fusing the diagonal-add/symmetrize epilogue into the gram loop),
# so it is opt-in: set True to force, False to forbid, None = off by default.
USE_PALLAS_GRAM: bool | None = None
# minimum N*M before the fused Pallas gram engages (tiling overhead below)
PALLAS_GRAM_MIN_ELEMENTS: int = 512 * 512


# Factorization accuracy mode: None = fast (single-bf16-pass trailing
# updates, panel GEMMs escalate to 3-pass automatically at N>=32768 where
# single-pass NaNs); "high" = 3-pass bf16 on ALL factorization GEMMs
# (~f32-faithful, ~2-3x slower, measured NLML-vs-f64 error ladder in
# CLAUDE.md).  Read by CholeskyFactor._factor_core.
CHOLESKY_PRECISION: str | None = None


def pallas_gram_enabled(n_elements: int, dtype) -> bool:
    if USE_PALLAS_GRAM is not True:
        return False
    import jax.numpy as jnp

    if dtype != jnp.float32:
        return False
    if n_elements < PALLAS_GRAM_MIN_ELEMENTS:
        return False
    return jax.default_backend() not in ("cpu",)
