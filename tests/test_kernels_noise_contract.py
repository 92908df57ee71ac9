"""The assume_unique contract under duplicated features (round-5 find).

``assume_unique=True`` promises unique feature values.  When violated,
the single-chip gram (X-is-Y identity shortcut → σ²I) and the sharded
gram (tiles are distinct slices → the reference's by-value equality mask,
noise.hpp:21-46) legitimately build DIFFERENT matrices — and the by-value
matrix is exactly singular at the duplicated pair.  These tests pin the
documented behavior of both paths (kernels/noise.py docstring).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import albatross_tpu as ab
from albatross_tpu.kernels import as_measurement
from albatross_tpu.parallel.gram import sharded_gram


def _kernel():
    return ab.SquaredExponential(5.0, 1.0) + ab.measurement_only(
        ab.IndependentNoise(0.5, assume_unique=True)
    )


def test_single_chip_identity_shortcut_ignores_duplicates():
    x = jnp.asarray([0.0, 1.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    K = _kernel()(as_measurement(x))
    # duplicate pair (1, 2): identity shortcut adds noise ONLY on the diagonal
    se = float(jnp.exp(jnp.zeros(())))  # d=0 → SE value 1.0
    assert float(K[1, 2]) == pytest.approx(se)
    assert float(K[1, 1]) == pytest.approx(se + 0.25)


def test_sharded_gram_uses_by_value_semantics_under_duplicates():
    x = jnp.asarray([0.0, 1.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    K = sharded_gram(_kernel(), x, mesh, "data", measurement=True)
    # by-value equality: the duplicated pair gets sigma² off-diagonal too —
    # the reference's semantics, and an exactly singular 2x2 block
    assert float(K[1, 2]) == pytest.approx(1.0 + 0.25)
    assert float(K[1, 1]) == pytest.approx(1.0 + 0.25)
    block = np.asarray(K[1:3, 1:3])
    assert np.linalg.matrix_rank(block) == 1
