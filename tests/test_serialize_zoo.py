"""Serialization breadth sweep: every model family round-trips through the
checkpoint format, mirroring the reference's all-registered-types archive
sweep (/root/reference/tests/lib/albatross/test/test_serialize.cc:279-409),
plus the versioned-load guarantee (gp.hpp:230): a checked-in old-version
fixture must keep loading, and a newer-version checkpoint must fail with a
versioned error message (VERDICT r3 next #8)."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import albatross_tpu as ab
from albatross_tpu.indexing.grouping import KFoldGrouper
from albatross_tpu.models import (
    AdaptedModel,
    LinearRegression,
    NullModel,
)
from albatross_tpu.models.ransac import (
    DefaultGPRansacStrategy,
    RansacConfig,
)
from albatross_tpu.models.sparse_gp import (
    UniformlySpacedInducingPoints,
    sparse_gp_from_covariance,
)
from albatross_tpu.serialize import load_checkpoint, save_checkpoint

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _dataset(rng, n=24):
    x = np.sort(rng.uniform(0, 10, n))
    return ab.RegressionDataset.create(
        jnp.asarray(x),
        jnp.asarray(np.sin(x) + 0.05 * rng.standard_normal(n)),
        variance=jnp.full((n,), 0.01),
    )


def _gp_kernel():
    return ab.SquaredExponential(1.5, 1.0) + ab.measurement_only(
        ab.IndependentNoise(0.1)
    )


def _shift_convert(adapter, features):
    # module-level (not a lambda): checkpoints store the converter by
    # reference, the analog of cereal's explicit type registration
    return jnp.asarray(features) - adapter.center.value


# name -> builder returning a fit-capable model; the sweep fits each on the
# same dataset, checkpoints the FitModel, and compares restored predictions
MODEL_ZOO = {
    "exact_gp": lambda: ab.gp_from_covariance(_gp_kernel(), jitter=1e-6),
    "exact_gp_serving": lambda: ab.gp_from_covariance(
        _gp_kernel(), jitter=1e-6
    ),
    "sparse_fitc": lambda: sparse_gp_from_covariance(
        _gp_kernel(),
        inducing_point_strategy=UniformlySpacedInducingPoints(8),
    ),
    "sparse_pitc": lambda: sparse_gp_from_covariance(
        _gp_kernel(),
        inducing_point_strategy=UniformlySpacedInducingPoints(8),
        grouper=KFoldGrouper(6),
    ),
    "linear_regression": LinearRegression,
    "null": NullModel,
    "ransac_gp": lambda: ab.gp_from_covariance(
        _gp_kernel(), jitter=1e-6
    ).ransac(
        DefaultGPRansacStrategy(),
        RansacConfig(
            inlier_threshold=2.0,
            random_sample_size=4,
            min_consensus_size=12,
            max_iterations=6,
            max_failed_candidates=6,
        ),
    ),
    "adapted_gp": lambda: AdaptedModel(
        ab.gp_from_covariance(_gp_kernel(), jitter=1e-6),
        convert=_shift_convert,
        params={"center": ab.Parameter(0.25)},
    ),
}


@pytest.mark.parametrize("name", sorted(MODEL_ZOO))
def test_zoo_fit_checkpoint_round_trip(tmp_path, rng, name, monkeypatch):
    from albatross_tpu.serialize import checkpoint as cp

    # the restricted loader resolves classes from registered prefixes only;
    # test-local types (the adapter's converter) register the test module —
    # the analog of the reference registering its test types with cereal
    monkeypatch.setattr(
        cp,
        "_ALLOWED_MODULE_PREFIXES",
        cp._ALLOWED_MODULE_PREFIXES + ("tests", "test_serialize_zoo"),
    )
    model = MODEL_ZOO[name]()
    data = _dataset(rng)
    fit_model = model.fit(data)
    if name == "exact_gp_serving":
        fit_model = fit_model.for_serving()
    xs = jnp.linspace(0.5, 9.5, 7)

    path = str(tmp_path / f"{name}.ckpt")
    save_checkpoint(path, fit_model)
    restored = load_checkpoint(path)
    try:
        before = fit_model.predict(xs).marginal()
        after = restored.predict(xs).marginal()
        before_mean, after_mean = before.mean, after.mean
        np.testing.assert_allclose(
            np.asarray(after.variance),
            np.asarray(before.variance),
            rtol=1e-12,
        )
    except TypeError:  # mean-only models (LeastSquares family)
        before_mean = fit_model.predict(xs).mean()
        after_mean = restored.predict(xs).mean()
    np.testing.assert_allclose(
        np.asarray(after_mean), np.asarray(before_mean), rtol=1e-12
    )
    # params survive with names and prior structure
    got = restored.model.get_params()
    want = model.get_params()
    assert set(got) == set(want)
    for key in want:
        assert float(got[key].value) == pytest.approx(
            float(want[key].value), rel=1e-12
        )
        assert got[key].prior == want[key].prior


def test_ransac_audit_trail_survives_checkpoint(tmp_path, rng):
    """The RANSAC fit's return code + audit trail (static aux) restore
    alongside the consensus refit (test_serialize.cc round-trips the
    RansacOutput struct)."""
    model = MODEL_ZOO["ransac_gp"]()
    data = _dataset(rng)
    fit_model = model.fit(data)
    path = str(tmp_path / "ransac.ckpt")
    save_checkpoint(path, fit_model)
    restored = load_checkpoint(path)
    out_a = fit_model.fit.ransac_output
    out_b = restored.fit.ransac_output
    assert out_b.return_code == out_a.return_code
    assert out_b.best.candidates == out_a.best.candidates
    assert out_b.best.inliers == out_a.best.inliers
    assert len(out_b.iterations) == len(out_a.iterations)


def test_sparse_rank_deficient_fit_round_trip(tmp_path, rng):
    """A sparse fit carrying a TRUNCATED numerical rank (rank < full, the
    QR safeguard of sparse_gp.hpp:348-352) must checkpoint and restore
    with the same rank.  A well-posed model fit cannot reach this state —
    the L_uuᵀ block of B regularizes the QR by construction — so the
    safeguard is exercised at its own unit (a genuinely rank-deficient B)
    and the resulting truncated-rank fit is round-tripped."""
    import dataclasses

    from albatross_tpu.models.sparse_gp import _qr_r_and_v

    # safeguard unit: B with an exactly dependent column
    cols = rng.standard_normal((12, 3))
    B = jnp.asarray(
        np.concatenate([cols, (cols[:, :1] + cols[:, 1:2])], axis=1)
    )  # 4th col = col0+col1 → rank 3
    R, v, rank = _qr_r_and_v(B, jnp.asarray(rng.standard_normal(12)))
    assert rank == 3  # detected
    assert bool(jnp.all(jnp.isfinite(R))) and bool(jnp.all(jnp.isfinite(v)))

    # a fit whose aux records that truncation round-trips exactly
    n = 24
    x = np.sort(rng.uniform(0, 10, n))
    data = ab.RegressionDataset.create(
        jnp.asarray(x), jnp.asarray(np.sin(x)), variance=jnp.full((n,), 0.01)
    )
    model = sparse_gp_from_covariance(
        _gp_kernel(),
        inducing_point_strategy=UniformlySpacedInducingPoints(8),
    )
    fit_model = model.fit(data)
    truncated = ab.FitModel(
        fit_model.model,
        dataclasses.replace(fit_model.fit, numerical_rank=int(rank)),
    )
    xs = jnp.linspace(0.5, 9.5, 7)
    before = truncated.predict(xs).marginal()
    path = str(tmp_path / "rank.ckpt")
    save_checkpoint(path, truncated)
    restored = load_checkpoint(path)
    assert restored.fit.numerical_rank == 3
    after = restored.predict(xs).marginal()
    np.testing.assert_allclose(
        np.asarray(after.mean), np.asarray(before.mean), rtol=1e-12
    )


@pytest.mark.parametrize("layout", ["1d", "2d"])
def test_distributed_fit_checkpoint_rebinds_mesh(tmp_path, rng, layout):
    """Distributed fits are topology-portable: the mesh is stored by
    signature (axis names + grid shape) and rebound to the loading
    process's devices — or to an explicit mesh passed to load_checkpoint."""
    from jax.sharding import Mesh

    from albatross_tpu.parallel.gp import DistributedGaussianProcess

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    data = _dataset(rng, n=32)
    kw = {"axis": "data"}
    if layout == "2d":
        kw["col_axis"] = "model"
    model = DistributedGaussianProcess(_gp_kernel(), mesh, **kw)
    fit_model = model.fit(data)
    xs = jnp.linspace(0.5, 9.5, 7)
    before = np.asarray(fit_model.predict(xs).marginal().mean)

    path = str(tmp_path / f"dist_{layout}.ckpt")
    save_checkpoint(path, fit_model)
    # default rebind: current process devices
    restored = load_checkpoint(path)
    np.testing.assert_allclose(
        np.asarray(restored.predict(xs).marginal().mean), before, rtol=1e-9
    )
    # explicit mesh rebind
    restored2 = load_checkpoint(path, mesh=mesh)
    assert restored2.fit.train_covariance.mesh is mesh
    # axis-name mismatch is a clear error
    bad = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("rows", "cols"))
    with pytest.raises(ValueError, match="axes"):
        load_checkpoint(path, mesh=bad)
    # ...and so is a grid-shape mismatch (same names, different layout):
    # the sharded factor's panel structure is laid out for the saved grid
    bad_shape = Mesh(
        np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "model")
    )
    with pytest.raises(ValueError, match="grid"):
        load_checkpoint(path, mesh=bad_shape)


def test_versioned_fixture_loads(rng):
    """The checked-in version-1 checkpoint (written 2026-08-20) must keep
    loading and reproducing its recorded predictions — the versioned-load
    guarantee the reference gets from cereal class versioning."""
    path = os.path.join(FIXTURES, "checkpoint_v1_gp_fit.ckpt")
    expected = np.load(os.path.join(FIXTURES, "checkpoint_v1_expected.npz"))
    restored = load_checkpoint(path)
    pred = restored.predict(jnp.asarray(expected["xs"])).marginal()
    np.testing.assert_allclose(
        np.asarray(pred.mean), expected["mean"], rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(pred.variance), expected["variance"], rtol=1e-10
    )


def test_newer_version_fails_with_versioned_error(tmp_path):
    from albatross_tpu.serialize import checkpoint as cp

    path = str(tmp_path / "future.ckpt")
    with open(path, "wb") as f:
        f.write(cp.MAGIC)
        pickle.dump(
            {"version": 99, "treedef": b"", "arrays": b""}, f
        )
    with pytest.raises(ValueError, match="version 99 is newer"):
        load_checkpoint(path)


def test_checkpoint_version_stamped_by_payload(tmp_path, rng):
    """Writers stamp the smallest version the payload needs (round-4
    advisor finding): mesh-free checkpoints stay v1 (readable by pre-mesh
    releases), mesh-bearing ones carry v2 so an old reader fails at the
    version gate — not with an opaque persistent-id UnpicklingError."""
    import pickle

    from jax.sharding import Mesh

    from albatross_tpu.parallel.gp import DistributedGaussianProcess
    from albatross_tpu.serialize.checkpoint import MAGIC

    def stamped_version(path):
        with open(path, "rb") as f:
            assert f.read(len(MAGIC)) == MAGIC
            return pickle.load(f)["version"]

    plain = ab.gp_from_covariance(_gp_kernel(), jitter=1e-6).fit(
        _dataset(rng, n=16)
    )
    p1 = str(tmp_path / "plain.ckpt")
    save_checkpoint(p1, plain)
    assert stamped_version(p1) == 1

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    dist = DistributedGaussianProcess(_gp_kernel(), mesh, axis="data").fit(
        _dataset(rng, n=32)
    )
    p2 = str(tmp_path / "dist.ckpt")
    save_checkpoint(p2, dist)
    assert stamped_version(p2) == 2
    # and both load back
    load_checkpoint(p1)
    load_checkpoint(p2)
