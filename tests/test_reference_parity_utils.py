"""Transcription of the reference's utility/covariance suites.

Sources (behavioral expectations only):
- /root/reference/tests/test_eigen_utils.cc (vertical_stack, truncated
  PSD solve)
- /root/reference/tests/test_linalg_utils.cc (QR sqrt_solve quadratic-form
  identity)
- /root/reference/tests/test_random_utils.cc (sampling utilities)
- /root/reference/tests/test_distance_metrics.cc (distance goldens)
- /root/reference/tests/test_unique.cc (unique_value(s) semantics)
- /root/reference/tests/test_covariance_functions.cc (measurement-noise
  truth table, composition PD, nugget equality, state space repr)
- /root/reference/tests/test_csv_utils.cc (multi-dataset/metadata/custom
  to_map/matrix write variants)
- /root/reference/tests/test_compression.cc (compress round trips)
- /root/reference/tests/test_prediction.cc + test_core_model.cc
  (prediction downgrades, empty-feature predictions, get/set params)
"""

import io

import jax.numpy as jnp
import numpy as np
import pytest

import albatross_tpu as at
from albatross_tpu.indexing import unique_value, unique_values
from albatross_tpu.kernels import (
    AngularDistance,
    EuclideanDistance,
    Exponential,
    IndependentNoise,
    Nugget,
    Polynomial,
    RadialDistance,
    SquaredExponential,
    as_measurement,
    measurement_only,
)
from albatross_tpu.ops.linalg import truncated_psd_solve, vertical_stack
from albatross_tpu.serialize import compress, decompress, maybe_decompress
from albatross_tpu.utils import (
    random_without_replacement,
    read_csv_columns,
    write_to_csv,
)


# ---------------------------------------------------------------------------
# eigen_utils (test_eigen_utils.cc)
# ---------------------------------------------------------------------------
def test_vertical_stack_matrix():
    A = jnp.asarray([[1.0, 2, 3], [4, 5, 6]])
    B = jnp.asarray([[7.0, 8, 9], [10, 11, 12], [13, 14, 15]])
    C = vertical_stack([A, B])
    np.testing.assert_array_equal(
        np.asarray(C), np.arange(1, 16, dtype=float).reshape(5, 3)
    )


def test_vertical_stack_vector():
    A = jnp.arange(1.0, 7.0)
    B = jnp.arange(7.0, 16.0)
    C = vertical_stack([A, B])
    np.testing.assert_array_equal(np.asarray(C), np.arange(1.0, 16.0))


def test_truncated_solve_sanity():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((3, 3))
    A = A.T @ A
    soln = np.array([1.0, 2.0, 3.0])
    rhs = A @ soln
    actual = np.asarray(truncated_psd_solve(jnp.asarray(A), jnp.asarray(rhs)))
    np.testing.assert_allclose(actual, soln, atol=1e-6)


def test_truncated_solve_low_rank():
    """Rank-deficient A: recover the component of the solution outside the
    nullspace (test_eigen_utils.cc:67-90)."""
    rng = np.random.default_rng(1)
    A2 = rng.standard_normal((2, 3))
    A = A2.T @ A2  # rank 2
    soln = np.array([1.0, 2.0, 3.0])
    # project out the nullspace component
    _, _, vt = np.linalg.svd(A)
    k = vt[-1]
    soln = soln - (soln @ k) * k
    rhs = A @ soln
    actual = np.asarray(truncated_psd_solve(jnp.asarray(A), jnp.asarray(rhs)))
    np.testing.assert_allclose(actual, soln, atol=1e-6)


# ---------------------------------------------------------------------------
# linalg_utils (test_linalg_utils.cc:19-32)
# ---------------------------------------------------------------------------
def test_qr_sqrt_solve_quadratic_form():
    from albatross_tpu.models.sparse_gp import _r_sqrt_solve

    rng = np.random.default_rng(2)
    n = 5
    A = rng.standard_normal((2 * n, n))
    rhs = rng.standard_normal((n, 3))
    _, R = np.linalg.qr(A)
    sqrt = np.asarray(_r_sqrt_solve(jnp.asarray(R), jnp.asarray(rhs)))
    expected = rhs.T @ np.linalg.solve(A.T @ A, rhs)
    np.testing.assert_allclose(sqrt.T @ sqrt, expected, atol=1e-10)


# ---------------------------------------------------------------------------
# random_utils (test_random_utils.cc)
# ---------------------------------------------------------------------------
def test_random_without_replacement_counts_and_range():
    rng = np.random.default_rng(0)
    for i in range(10):
        values = list(range(i, i + 7))
        for n in range(0, len(values) + 1):
            out = random_without_replacement(values, n, rng)
            assert len(out) == n
            assert all(i <= v <= i + 6 for v in out)


def test_random_without_replacement_full_set():
    rng = np.random.default_rng(0)
    out = random_without_replacement(list(range(10)), 10, rng)
    assert len(out) == 10
    assert len(set(out)) == 10


def test_random_covariance_matrix_is_spd():
    import jax

    from albatross_tpu.utils import random_covariance_matrix

    key = jax.random.PRNGKey(2012)
    for i in range(20):
        key, sub = jax.random.split(key)
        n = int(1 + i % 20)
        cov = random_covariance_matrix(sub, n, dtype=jnp.float64)
        vals = np.linalg.eigvalsh(np.asarray(cov))
        assert vals.max() >= np.finfo(float).eps
        assert np.linalg.norm(np.asarray(cov) - np.asarray(cov).T) <= 1e-6


def test_sample_mvn_1d_moments():
    import jax

    from albatross_tpu.utils import sample_mvn

    dist = at.JointDistribution(jnp.asarray([5.0]), jnp.asarray([[3.0]]))
    samples = np.asarray(
        sample_mvn(jax.random.PRNGKey(2012), dist, num_samples=10000)
    ).ravel()
    assert samples.mean() == pytest.approx(5.0, abs=0.1)
    assert samples.std(ddof=1) == pytest.approx(np.sqrt(3.0), abs=0.1)


# ---------------------------------------------------------------------------
# distance metrics (test_distance_metrics.cc)
# ---------------------------------------------------------------------------
def _pair(metric, x, y):
    X = jnp.asarray([x], dtype=jnp.float64)
    Y = jnp.asarray([y], dtype=jnp.float64)
    return float(metric.pairwise(X, Y)[0, 0])


def test_euclidean_distance():
    d = EuclideanDistance()
    assert _pair(d, [1, 1, 1], [1, 1, 2]) == pytest.approx(1.0, abs=1e-12)
    assert _pair(d, [1, 1, 1], [2, 2, 2]) == pytest.approx(
        np.sqrt(3.0), abs=1e-12
    )
    assert _pair(d, [2, 2, 2], [2, 2, 2]) == pytest.approx(0.0, abs=1e-12)


def test_radial_distance():
    d = RadialDistance()
    assert _pair(d, [0, 0, 1], [0, 0, 1]) == pytest.approx(0.0, abs=1e-12)
    assert _pair(d, [0, 0, 1], [0, 1, 0]) == pytest.approx(0.0, abs=1e-12)
    assert _pair(d, [0, 1, 1], [1, 0, 0]) == pytest.approx(
        np.sqrt(2.0) - 1.0, abs=1e-12
    )


def test_angular_distance():
    d = AngularDistance()
    assert _pair(d, [0, 0, 1], [0, 0, 1]) == pytest.approx(0.0, abs=1e-6)
    assert _pair(d, [0, 0, 1], [0, 0, -1]) == pytest.approx(np.pi, abs=1e-6)
    assert _pair(d, [0, 0, 1], [0, 1, 0]) == pytest.approx(
        np.pi / 2.0, abs=1e-9
    )


def test_distance_matrix_shape():
    rng = np.random.default_rng(3)
    pts = rng.standard_normal((10, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    D = EuclideanDistance().pairwise(jnp.asarray(pts), jnp.asarray(pts))
    assert D.shape == (10, 10)


# ---------------------------------------------------------------------------
# unique (test_unique.cc)
# ---------------------------------------------------------------------------
def test_unique_values_semantics():
    assert unique_values([]) == []
    assert unique_values([3, 1, 5, 1, 3]) == [1, 3, 5]
    assert unique_value([3, 3, 3]) == 3
    with pytest.raises(ValueError):
        unique_value([])
    with pytest.raises(ValueError):
        unique_value([3, 1, 5, 1, 3])


# ---------------------------------------------------------------------------
# covariance functions (test_covariance_functions.cc)
# ---------------------------------------------------------------------------
def _k(kernel, X, Y=None):
    return np.asarray(kernel(X) if Y is None else kernel.matrix_or_none(X, Y))


def test_measurement_noise_wrapper_truth_table():
    """test_covariance_functions.cc:33-93 — the full sum/product/
    product-of-sum measurement propagation semantics."""
    radial = SquaredExponential(1.0, 1.0)
    noise = IndependentNoise(1.0)
    meas_noise = measurement_only(IndependentNoise(1.0))
    ksum = radial + meas_noise
    prod = meas_noise * radial
    prod_of_sum = noise * ksum

    f = jnp.asarray([0.0])
    m = as_measurement(f)

    def val(kernel, a, b):
        out = kernel.matrix_or_none(a, b)
        return 0.0 if out is None else float(out[0, 0])

    # measurement noise applies only to measurement/measurement pairs
    assert val(meas_noise, f, f) == 0.0
    assert val(meas_noise, f, m) == 0.0
    assert val(meas_noise, m, f) == 0.0
    assert val(meas_noise, m, m) > 0.0

    # radial ignores the measurement wrapper entirely
    assert val(radial, f, f) > 0.0
    assert val(radial, m, m) == val(radial, f, f)
    assert val(radial, m, f) == val(radial, f, f)
    assert val(radial, f, m) == val(radial, f, f)

    # sums add elementwise
    assert val(ksum, f, f) > 0.0
    assert val(ksum, m, m) > val(ksum, f, f)
    assert val(ksum, m, m) == val(radial, m, m) + val(meas_noise, m, m)
    assert val(ksum, m, f) == val(radial, m, f) + val(meas_noise, m, f)
    assert val(ksum, f, m) == val(radial, f, m) + val(meas_noise, f, m)

    # products propagate the measurement-only property
    assert val(prod, f, f) == 0.0
    assert val(prod, m, m) > 0.0
    assert val(prod, m, m) == val(radial, m, m) * val(meas_noise, m, m)
    assert val(prod, m, f) == 0.0
    assert val(prod, f, m) == 0.0

    # ...but a sum containing a measurement-only term drops it
    assert val(prod_of_sum, f, f) > 0.0
    assert val(prod_of_sum, m, m) > 0.0
    assert val(prod_of_sum, f, f) == val(noise, f, f) * val(ksum, f, f)
    assert val(prod_of_sum, m, m) == val(noise, m, m) * val(ksum, m, m)
    assert val(prod_of_sum, m, f) == val(prod_of_sum, f, f)
    assert val(prod_of_sum, f, m) == val(prod_of_sum, m, f)


def _points_on_a_line(n):
    return jnp.asarray(
        [[1000.0 * (i + j) for j in range(3)] for i in range(n)]
    )


@pytest.mark.parametrize(
    "kernel",
    [
        SquaredExponential(1.0, 1.0, EuclideanDistance()),
        SquaredExponential(1.0, 1.0, RadialDistance()),
        Exponential(1.0, 1.0, EuclideanDistance()),
        Exponential(1.0, 1.0, AngularDistance()),
        Exponential(1.0, 1.0, RadialDistance()),
    ],
    ids=["sqexp-euc", "sqexp-rad", "exp-euc", "exp-ang", "exp-rad"],
)
def test_vector_covariances_invertible(kernel):
    """test_covariance_functions.cc:110-146 — gram on 1000-scale points is
    PD enough to invert."""
    C = np.asarray(kernel(_points_on_a_line(5)))
    assert C.shape == (5, 5)
    np.linalg.inv(C + 1e-10 * np.eye(5))
    assert np.all(np.isfinite(C))


def test_build_covariance_composition():
    noise = IndependentNoise(1.0)
    product = Exponential(1.0, 1.0, RadialDistance()) * SquaredExponential(
        1.0, 1.0
    )
    covariance = product + noise
    C = np.asarray(covariance(_points_on_a_line(5)))
    assert C.shape == (5, 5)
    np.linalg.inv(C)


@pytest.mark.parametrize(
    "kernel",
    [
        IndependentNoise(1.0),
        Nugget(),
        Polynomial(2),
        IndependentNoise(1.0) + Polynomial(2),
    ],
    ids=["noise", "nugget", "poly2", "noise+poly2"],
)
def test_double_covariances_params_roundtrip(kernel):
    """test_covariance_functions.cc:148-223 can_set_params."""
    X = _points_on_a_line(5)[:, 0]
    C = np.asarray(kernel(X))
    assert C.shape == (5, 5)
    to_add = 3.14159
    for name, param in kernel.get_params().items():
        kernel = kernel.set_param(name, param.value + to_add)
        assert float(kernel.get_params()[name].value) == pytest.approx(
            float(param.value) + to_add
        )


def test_nugget_equality_semantics():
    nugget = Nugget()
    sigma = float(nugget.get_params()["nugget_sigma"].value)
    expected = sigma * sigma
    X = jnp.asarray([1.0, 2.0])
    K = np.asarray(nugget(X))
    assert K[0, 0] == pytest.approx(expected)
    assert K[1, 1] == pytest.approx(expected)
    assert K[0, 1] == 0.0


def test_state_space_representation_concatenates():
    """test_covariance_functions.cc:235-252 — the sum of two kernels with
    SSRs yields both sets of inducing features."""
    a = SquaredExponential(1.0, 1.0)
    b = Exponential(2.0, 1.0)
    X = jnp.linspace(0.0, 10.0, 11)
    ssr_a = a.state_space_representation(X)
    ssr_b = b.state_space_representation(X)
    both = (a + b).state_space_representation(X)
    if ssr_a is None or ssr_b is None:
        pytest.skip("radial kernels expose no SSR grid in this build")
    assert len(both) == len(ssr_a) + len(ssr_b)


# ---------------------------------------------------------------------------
# csv writes (test_csv_utils.cc:123-284)
# ---------------------------------------------------------------------------
def _dataset(metadata=None):
    X = np.asarray([[1.2, 2.0], [2.2, 3.0], [3.2, 4.0]])
    targets = np.asarray([1.0, 2.0, 3.0])
    return at.RegressionDataset.create(
        jnp.asarray(X), jnp.asarray(targets), metadata=metadata
    )


def test_csv_writes_with_predictions(tmp_path):
    path = str(tmp_path / "out.csv")
    data = _dataset()
    preds = data.targets
    write_to_csv(path, data, preds)
    cols = read_csv_columns(path)
    for needed in (
        "feature_0",
        "feature_1",
        "target",
        "prediction",
        "prediction_variance",
    ):
        assert needed in cols, sorted(cols)
    np.testing.assert_allclose(cols["prediction"], [1.0, 2.0, 3.0])


def test_csv_writes_without_predictions(tmp_path):
    path = str(tmp_path / "out.csv")
    write_to_csv(path, _dataset())
    cols = read_csv_columns(path)
    assert "target" in cols and "prediction" not in cols


def test_csv_writes_metadata(tmp_path):
    """test_csv_utils.cc:192-214 — multiple datasets with a 'time' metadata
    key produce one concatenated CSV with the time column."""
    path = str(tmp_path / "out.csv")
    first = _dataset(metadata={"time": "1"})
    second = _dataset(metadata={"time": "2"})
    preds = [first.targets, second.targets]
    write_to_csv(path, [first, second], preds)
    with open(path) as f:
        header = f.readline().strip().split(",")
        rows = [line.strip().split(",") for line in f if line.strip()]
    assert "time" in header
    t = header.index("time")
    assert [r[t] for r in rows] == ["1", "1", "1", "2", "2", "2"]


def test_csv_custom_writes(tmp_path):
    """test_csv_utils.cc:216-274 — custom feature -> column map."""
    path = str(tmp_path / "out.csv")

    def to_map(row):
        return {
            "one": repr(float(row[0])),
            "two": repr(float(row[1])),
            "three": repr(float(row[0])) + repr(float(row[1])),
        }

    data = _dataset()
    write_to_csv(path, data, data.targets, to_map=to_map)
    with open(path) as f:
        header = f.readline().strip().split(",")
    for needed in ("one", "two", "three", "prediction", "target"):
        assert needed in header


def test_csv_writes_matrix():
    buf = io.StringIO()
    write_to_csv(buf, jnp.asarray(np.random.default_rng(0).random((3, 4))))
    assert len(buf.getvalue()) > 0
    assert buf.getvalue().count("\n") == 4


# ---------------------------------------------------------------------------
# compression (test_compression.cc)
# ---------------------------------------------------------------------------
def test_compression_string_roundtrips():
    rng = np.random.default_rng(22)
    for _ in range(25):
        n = int(rng.integers(0, 1000))
        payload = bytes(rng.integers(65, 123, n, dtype=np.uint8))
        compressed = compress(payload)
        assert decompress(compressed) == payload
        ok, out = maybe_decompress(compressed)
        assert ok and out == payload


def test_compression_alternate_levels():
    rng = np.random.default_rng(22)
    payload = bytes(rng.integers(65, 123, 500, dtype=np.uint8))
    for level in range(0, 21):  # reference sweeps zstd levels 0..20
        compressed = compress(payload, level)
        assert decompress(compressed) == payload


def test_decompress_invalid_raises():
    with pytest.raises(ValueError, match="error determining"):
        decompress(b"")
    with pytest.raises(ValueError, match="error determining"):
        decompress(b"albatross")


def test_maybe_decompress_invalid_returns_false():
    ok, out = maybe_decompress(b"")
    assert not ok and out is None
    ok, out = maybe_decompress(b"albatross")
    assert not ok and out is None


def test_compression_text_mode():
    text = "albatross " * 50
    assert decompress(compress(text), as_text=True) == text


# ---------------------------------------------------------------------------
# stats (test_stats.cc)
# ---------------------------------------------------------------------------
def test_gaussian_pdf_scipy_goldens():
    """test_stats.cc:24-48 — scipy.stats.norm.pdf-generated goldens."""
    from albatross_tpu.stats import gaussian_log_pdf, gaussian_pdf

    xs = [-1.49529605, -0.35674996, -1.19464126, 0.7431096, 0.94945083,
          -0.06465424, -0.36805315, -1.38905131, -1.56751365, 1.8271551]
    variances = [3.39311978, 0.55516885, 0.72540077, 0.05034394, 0.16184329,
                 2.31795834, 0.00988035, 0.11177149, 0.77043322, 2.84884525]
    expected = [1.55783121e-01, 4.77438315e-01, 1.75146437e-01, 7.38065599e-03,
                6.12161951e-02, 2.61797595e-01, 4.23016986e-03, 2.12923882e-04,
                9.22586650e-02, 1.31554532e-01]
    for x, v, e in zip(xs, variances, expected):
        assert float(gaussian_pdf(x, v)) == pytest.approx(e, abs=1e-6)
        assert float(gaussian_log_pdf(x, v)) == pytest.approx(
            np.log(e), abs=1e-6
        )
    assert float(gaussian_pdf(-100.0, 1.0)) < 1e-12
    assert float(gaussian_pdf(100.0, 1.0)) < 1e-12
    assert float(gaussian_pdf(1.0, 1e-6)) < 1e-12
    assert float(gaussian_pdf(1e12, 1e8)) < 1e-12


def test_chi_squared_cdf_table_and_edges():
    """test_stats.cc:50-84 — textbook chi² table + edge-case semantics."""
    from albatross_tpu.stats import chi_squared_cdf_value as cdf

    table = [
        (3.84, 1, 0.95, 1e-4), (10.83, 1, 0.999, 1e-4),
        (5.99, 2, 0.95, 1e-4), (13.82, 2, 0.999, 1e-4),
        (11.07, 5, 0.95, 1e-4), (15.09, 5, 0.99, 1e-4),
        (9.260, 23, 0.005, 1e-5), (38.932, 21, 0.99, 1e-5),
        (96.578, 80, 0.9, 1e-5), (70.065, 100, 0.01, 1e-5),
    ]
    for x, k, p, tol in table:
        assert float(cdf(x, k)) == pytest.approx(p, abs=tol)

    assert float(cdf(0.0, 0.0)) == 1.0
    for k in (1, 2, 10, 100.0):
        assert float(cdf(0.0, k)) < 1e-6
    assert float(cdf(1.0e-4, 0.0)) == pytest.approx(1.0, abs=1e-4)
    assert float(cdf(1.0, 0.0)) == pytest.approx(1.0, abs=1e-4)
    for x in (1000, 10000, 100000):
        assert float(cdf(x, 100)) == pytest.approx(1.0, abs=1e-4)
    assert float(cdf(np.inf, 1)) == pytest.approx(1.0, abs=1e-4)
    for k in (0, 1, 100):
        assert np.isnan(float(cdf(-1e-6, k)))
    assert np.isnan(float(cdf(np.nan, 0)))
    assert np.isnan(float(cdf(np.nan, 1)))


def test_chi_squared_cdf_monotonic():
    """test_stats.cc:135-169 — CDF monotone in the scaled statistic."""
    from albatross_tpu.stats import chi_squared_cdf, chi_squared_cdf_value

    rng = np.random.default_rng(2012)
    q, _ = np.linalg.qr(rng.standard_normal((5, 5)))
    cov = jnp.asarray((q * rng.gamma(2.0, 2.0, 5)[None, :]) @ q.T)
    sample = jnp.asarray(rng.multivariate_normal(np.zeros(5), np.asarray(cov)))
    assert float(chi_squared_cdf(sample, cov)) < 1.0
    previous = -np.finfo(float).eps
    for i in range(50):
        value = float(chi_squared_cdf((i / 5.0) * sample, cov))
        assert previous <= value
        previous = value
    previous = -np.finfo(float).eps
    for i in range(500):
        x = i / 50.0
        value = float(chi_squared_cdf_value(x * x, 1))
        assert previous <= value + 1e-15
        previous = value


# ---------------------------------------------------------------------------
# prediction downgrades + empty predictions
# (test_prediction.cc, test_core_model.cc)
# ---------------------------------------------------------------------------
def _fit_model():
    rng = np.random.default_rng(4)
    x = np.linspace(0, 10, 20)
    y = np.sin(x) + 0.01 * rng.standard_normal(20)
    data = at.RegressionDataset.create(jnp.asarray(x), jnp.asarray(y))
    model = at.gp_from_covariance(
        SquaredExponential(2.0, 1.0) + IndependentNoise(0.1)
    )
    return model, model.fit(data), data


def test_prediction_downgrades_and_empty():
    _, fit, data = _fit_model()
    xs = jnp.linspace(0.0, 10.0, 7)
    pred = fit.predict(xs)
    mean = pred.mean()
    marginal = pred.marginal()
    joint = pred.joint()
    assert mean.shape == (7,)
    np.testing.assert_allclose(np.asarray(marginal.mean), np.asarray(mean))
    np.testing.assert_allclose(np.asarray(joint.mean), np.asarray(mean))
    # empty feature set -> size-0 predictions (test_prediction.cc:45-47)
    empty = fit.predict(jnp.zeros((0,)))
    assert empty.mean().shape == (0,)
    assert empty.marginal().mean.shape == (0,)
    assert empty.joint().covariance.shape == (0, 0)


def test_fit_predict_recovers_targets():
    """test_core_model.cc:30-38 — near-interpolation at train points."""
    _, fit, data = _fit_model()
    pred_mean = np.asarray(fit.predict(data.features).mean())
    assert np.linalg.norm(pred_mean - np.asarray(data.targets.mean)) < 0.2


def test_model_get_set_params():
    model, _, _ = _fit_model()
    params = model.get_params()
    assert len(params) > 0
    for name, param in params.items():
        updated = model.set_param(name, param.value + 1.0)
        assert float(updated.get_params()[name].value) == pytest.approx(
            float(param.value) + 1.0
        )
