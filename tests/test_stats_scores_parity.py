"""Transcription of the reference's distributional-score and MST suites.

Sources (behavioral expectations only — reduced iteration counts):
- /root/reference/tests/test_stats_scores.cc (energy/variogram/CRPS
  properties, weights, degenerate and non-finite handling)
- /root/reference/tests/test_stats_wasserstein.cc (Wasserstein-2 properties
  incl. the ill-conditioned regression case)
- /root/reference/tests/test_minimum_spanning_tree.cc (Kruskal forest /
  Prim tree semantics + the Princeton tinyEWG golden)
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from albatross_tpu import JointDistribution
from albatross_tpu.evaluation import (
    crps_normal,
    energy_score,
    expected_abs_normal_1,
    expected_abs_normal_2,
    variogram_score,
    wasserstein_2,
)
from albatross_tpu.utils import (
    Edge,
    Graph,
    compute_vertices,
    create_graph,
    minimum_spanning_forest,
    minimum_spanning_tree,
)


# ---------------------------------------------------------------------------
# helpers mirroring test_stats_scores.cc:27-35 / test_stats_wasserstein.cc
# ---------------------------------------------------------------------------
def _random_covariance(rng, dim, eigenvalues=None):
    """SPD with random orthogonal eigenvectors and gamma(2,2) spectrum
    (the reference's random_covariance_matrix)."""
    q, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
    if eigenvalues is None:
        eigenvalues = rng.gamma(2.0, 2.0, size=dim)
    return (q * np.asarray(eigenvalues)[None, :]) @ q.T


def _random_joint(rng, dim, eigenvalues=None):
    cov = _random_covariance(rng, dim, eigenvalues)
    mean = rng.normal(size=dim)
    return JointDistribution(jnp.asarray(mean), jnp.asarray(cov))


def _ill_conditioned_joint(rng, dim, tiny=1.0e-8):
    """First eigenvalue pinned at 1e-8
    (test_stats_wasserstein.cc:34-53)."""
    eigenvalues = rng.gamma(2.0, 2.0, size=dim)
    eigenvalues[0] = tiny
    return _random_joint(rng, dim, eigenvalues)


# ---------------------------------------------------------------------------
# death tests -> ValueError (test_stats_scores.cc:38-90)
# ---------------------------------------------------------------------------
def test_energy_score_raises_on_too_few_samples():
    rng = np.random.default_rng(2222)
    dist = _random_joint(rng, 5)
    truth = jnp.asarray(rng.normal(size=5))
    with pytest.raises(ValueError, match="1 or fewer samples"):
        energy_score(dist, truth, num_samples=1)
    with pytest.raises(ValueError, match="1 or fewer samples"):
        energy_score(dist, truth, num_samples=0)


def test_energy_score_raises_on_size_mismatch():
    rng = np.random.default_rng(2222)
    dist = _random_joint(rng, 5)
    truth = jnp.asarray(rng.normal(size=3))
    with pytest.raises(ValueError, match="different sizes"):
        energy_score(dist, truth)


def test_energy_score_raises_on_weight_mismatch():
    rng = np.random.default_rng(2222)
    dist = _random_joint(rng, 5)
    truth = jnp.asarray(rng.normal(size=5))
    with pytest.raises(ValueError, match="weights"):
        energy_score(dist, truth, weights=jnp.ones(3))


def test_variogram_score_raises_on_size_mismatch():
    rng = np.random.default_rng(2222)
    dist = _random_joint(rng, 5)
    truth = jnp.asarray(rng.normal(size=3))
    with pytest.raises(ValueError, match="different sizes"):
        variogram_score(dist, truth)


def test_variogram_score_raises_on_weight_mismatch():
    rng = np.random.default_rng(2222)
    dist = _random_joint(rng, 5)
    truth = jnp.asarray(rng.normal(size=5))
    with pytest.raises(ValueError, match="square matrix"):
        variogram_score(dist, truth, weights=jnp.ones((3, 3)))
    with pytest.raises(ValueError, match="square matrix"):
        variogram_score(dist, truth, weights=jnp.ones((5, 3)))


# ---------------------------------------------------------------------------
# expected |N(mu, sigma^2)|^p identities (test_stats_scores.cc:94-124)
# ---------------------------------------------------------------------------
def test_expected_abs_normal_zero_mean():
    rng = np.random.default_rng(5555)
    for _ in range(50):
        sigma = rng.uniform(0.1, 10.0)
        p1 = float(expected_abs_normal_1(0.0, sigma))
        assert p1 == pytest.approx(sigma * math.sqrt(2.0 / math.pi), abs=1e-12)
        p2 = float(expected_abs_normal_2(0.0, sigma))
        expected2 = sigma * sigma * 2 * math.gamma(1.5) / math.sqrt(math.pi)
        assert p2 == pytest.approx(expected2, abs=1e-12)


def test_expected_abs_normal_non_finite_and_degenerate():
    assert math.isnan(float(expected_abs_normal_1(np.inf, 1.0)))
    assert math.isnan(float(expected_abs_normal_1(0.0, np.nan)))
    assert float(expected_abs_normal_1(3.0, 0.0)) == 3.0
    assert float(expected_abs_normal_1(-3.0, -1.0)) == 3.0


# ---------------------------------------------------------------------------
# energy score invariances (test_stats_scores.cc:129-337)
# ---------------------------------------------------------------------------
MC_SAMPLES = 500


def _se_bound(dist, truth):
    return math.sqrt(
        2.0
        * float(
            jnp.trace(dist.covariance) + jnp.sum((dist.mean - truth) ** 2)
        )
        / MC_SAMPLES
    )


def test_energy_score_translation_invariance():
    rng = np.random.default_rng(6666)
    for _ in range(10):
        dim = int(rng.integers(2, 31))
        dist = _random_joint(rng, dim)
        truth = jnp.asarray(rng.normal(size=dim))
        es = float(energy_score(dist, truth, seed=222, num_samples=1000))

        offset = jnp.asarray(rng.normal(size=dim))
        shifted = JointDistribution(dist.mean + offset, dist.covariance)
        es_shifted = float(
            energy_score(shifted, truth + offset, seed=22, num_samples=1000)
        )
        assert es == pytest.approx(es_shifted, abs=2.0 * _se_bound(dist, truth))


def test_energy_score_rotation_invariance():
    rng = np.random.default_rng(7777)
    for _ in range(8):
        dim = int(rng.integers(2, 31))
        dist = _random_joint(rng, dim)
        truth = jnp.asarray(rng.normal(size=dim))
        es = float(energy_score(dist, truth, seed=222, num_samples=MC_SAMPLES))

        q, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
        q = jnp.asarray(q)
        rotated = JointDistribution(q @ dist.mean, q @ dist.covariance @ q.T)
        es_rot = float(
            energy_score(rotated, q @ truth, seed=22, num_samples=MC_SAMPLES)
        )
        assert es == pytest.approx(es_rot, abs=2.0 * _se_bound(dist, truth))


def test_energy_score_matches_crps_1d():
    rng = np.random.default_rng(9999)
    for _ in range(20):
        mu = rng.uniform(-10.0, 10.0)
        sigma = rng.uniform(0.1, 5.0)
        truth_val = rng.uniform(-10.0, 10.0)
        dist = JointDistribution(
            jnp.asarray([mu]), jnp.asarray([[sigma * sigma]])
        )
        es = float(
            energy_score(
                dist, jnp.asarray([truth_val]), seed=444, num_samples=MC_SAMPLES
            )
        )
        crps = float(crps_normal(mu, sigma, truth_val))
        bound = 2.0 * math.sqrt(2.0 * sigma * sigma / MC_SAMPLES)
        assert es == pytest.approx(crps, abs=bound)


def test_energy_score_approaches_deterministic():
    rng = np.random.default_rng(8888)
    for _ in range(5):
        dim = int(rng.integers(2, 31))
        mean = jnp.asarray(rng.normal(size=dim))
        truth = jnp.asarray(rng.normal(size=dim))
        expected = float(jnp.linalg.norm(mean - truth))
        for var in (1e-4, 1e-6, 1e-8, 1e-10):
            dist = JointDistribution(mean, var * jnp.eye(dim))
            es = float(
                energy_score(dist, truth, seed=333, num_samples=MC_SAMPLES)
            )
            assert es == pytest.approx(
                expected, abs=math.sqrt(var) * dim + 1e-10
            )


def test_energy_score_scaling():
    rng = np.random.default_rng(9000)
    for _ in range(10):
        dim = int(rng.integers(2, 31))
        dist = _random_joint(rng, dim)
        truth = jnp.asarray(rng.normal(size=dim))
        es = float(energy_score(dist, truth, seed=111, num_samples=MC_SAMPLES))
        scale = rng.uniform(0.1, 10.0)
        scaled = JointDistribution(
            dist.mean * scale, dist.covariance * scale * scale
        )
        es_scaled = float(
            energy_score(scaled, truth * scale, seed=111, num_samples=MC_SAMPLES)
        )
        assert es_scaled == pytest.approx(
            scale * es, abs=2.0 * scale * _se_bound(dist, truth)
        )


# ---------------------------------------------------------------------------
# variogram score invariances for both orders
# (test_stats_scores.cc:339-496)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("p", [1.0, 2.0], ids=["madogram", "variogram"])
def test_variogram_score_mean_offset_invariance(p):
    rng = np.random.default_rng(10000)
    for _ in range(10):
        dim = int(rng.integers(2, 31))
        dist = _random_joint(rng, dim)
        truth = jnp.asarray(rng.normal(size=dim))
        vs = float(variogram_score(dist, truth, p=p))

        offset = float(rng.uniform(-10.0, 10.0))
        shifted = JointDistribution(dist.mean + offset, dist.covariance)
        assert float(variogram_score(shifted, truth, p=p)) == pytest.approx(
            vs, abs=1e-8 * max(1.0, abs(vs))
        )
        assert float(
            variogram_score(dist, truth + offset, p=p)
        ) == pytest.approx(vs, abs=1e-8 * max(1.0, abs(vs)))


@pytest.mark.parametrize("p", [1.0, 2.0], ids=["madogram", "variogram"])
def test_variogram_score_scaling(p):
    rng = np.random.default_rng(11000)
    for _ in range(10):
        dim = int(rng.integers(2, 31))
        dist = _random_joint(rng, dim)
        truth = jnp.asarray(rng.normal(size=dim))
        vs = float(variogram_score(dist, truth, p=p))
        scale = rng.uniform(0.1, 10.0)
        scaled = JointDistribution(
            dist.mean * scale, dist.covariance * scale * scale
        )
        vs_scaled = float(variogram_score(scaled, truth * scale, p=p))
        assert vs_scaled == pytest.approx(
            scale ** (2.0 * p) * vs, rel=1e-6, abs=1e-8
        )


@pytest.mark.parametrize("p", [1.0, 2.0], ids=["madogram", "variogram"])
def test_variogram_score_proper_scoring_mean_perturbation(p):
    """Properness in expectation: the per-draw gap is small relative to MC
    noise (the variogram score is proper but not strictly proper), so unlike
    the reference we assert on the aggregate over all perturbations."""
    rng = np.random.default_rng(13000)
    score_true = score_perturbed = 0.0
    for _ in range(5):
        dim = int(rng.integers(2, 13))
        true_dist = _random_joint(rng, dim)
        perturbed = JointDistribution(
            true_dist.mean + jnp.asarray(rng.normal(size=dim)),
            true_dist.covariance,
        )
        cov_np = np.asarray(true_dist.covariance)
        mean_np = np.asarray(true_dist.mean)
        ys = rng.multivariate_normal(mean_np, cov_np, size=120)
        for y_np in ys:
            y = jnp.asarray(y_np)
            score_true += float(variogram_score(true_dist, y, p=p))
            score_perturbed += float(variogram_score(perturbed, y, p=p))
    assert score_true < score_perturbed


def test_energy_score_proper_scoring_mean_perturbation():
    rng = np.random.default_rng(12000)
    for _ in range(4):
        dim = int(rng.integers(2, 13))
        true_dist = _random_joint(rng, dim)
        perturbed = JointDistribution(
            true_dist.mean + jnp.asarray(rng.normal(size=dim)),
            true_dist.covariance,
        )
        cov_np = np.asarray(true_dist.covariance)
        mean_np = np.asarray(true_dist.mean)
        score_true = score_perturbed = 0.0
        for _ in range(40):
            y = jnp.asarray(rng.multivariate_normal(mean_np, cov_np))
            score_true += float(
                energy_score(true_dist, y, seed=555, num_samples=MC_SAMPLES)
            )
            score_perturbed += float(
                energy_score(perturbed, y, seed=555, num_samples=MC_SAMPLES)
            )
        assert score_true < score_perturbed


def test_energy_score_proper_scoring_covariance_perturbation():
    rng = np.random.default_rng(12001)
    for _ in range(3):
        dim = int(rng.integers(2, 13))
        true_dist = _random_joint(rng, dim)
        noise = rng.normal(size=(dim, dim))
        perturbed = JointDistribution(
            true_dist.mean,
            true_dist.covariance + jnp.asarray(0.5 * noise @ noise.T),
        )
        cov_np = np.asarray(true_dist.covariance)
        mean_np = np.asarray(true_dist.mean)
        score_true = score_perturbed = 0.0
        for _ in range(40):
            y = jnp.asarray(rng.multivariate_normal(mean_np, cov_np))
            score_true += float(
                energy_score(true_dist, y, seed=666, num_samples=MC_SAMPLES)
            )
            score_perturbed += float(
                energy_score(perturbed, y, seed=666, num_samples=MC_SAMPLES)
            )
        assert score_true < score_perturbed


# ---------------------------------------------------------------------------
# CRPS edge cases (test_stats_scores.cc:639-666)
# ---------------------------------------------------------------------------
def test_crps_normal_non_finite_inputs():
    inf, nan = np.inf, np.nan
    assert math.isnan(float(crps_normal(inf, 1.0, 0.0)))
    assert math.isnan(float(crps_normal(-inf, 1.0, 0.0)))
    assert math.isnan(float(crps_normal(nan, 1.0, 0.0)))
    assert math.isnan(float(crps_normal(0.0, inf, 0.0)))
    assert math.isnan(float(crps_normal(0.0, nan, 0.0)))
    assert math.isnan(float(crps_normal(0.0, 1.0, inf)))
    assert math.isnan(float(crps_normal(0.0, 1.0, -inf)))
    assert math.isnan(float(crps_normal(0.0, 1.0, nan)))


def test_crps_normal_degenerate_sigma():
    assert float(crps_normal(5.0, 0.0, 3.0)) == 2.0
    assert float(crps_normal(5.0, 0.0, 5.0)) == 0.0
    assert float(crps_normal(5.0, 0.0, 8.0)) == 3.0
    assert float(crps_normal(5.0, -1.0, 3.0)) == 2.0


# ---------------------------------------------------------------------------
# weights (test_stats_scores.cc:669-738)
# ---------------------------------------------------------------------------
def test_energy_score_with_weights():
    rng = np.random.default_rng(14000)
    for _ in range(10):
        dim = int(rng.integers(2, 31))
        dist = _random_joint(rng, dim)
        truth = jnp.asarray(rng.normal(size=dim))

        es_none = float(
            energy_score(dist, truth, seed=123, num_samples=MC_SAMPLES)
        )
        es_uniform = float(
            energy_score(
                dist, truth, weights=jnp.ones(dim), seed=123,
                num_samples=MC_SAMPLES,
            )
        )
        assert es_none == pytest.approx(es_uniform, abs=1e-10)

        zero_first = jnp.ones(dim).at[0].set(0.0)
        offset = JointDistribution(
            dist.mean.at[0].add(1000.0), dist.covariance
        )
        es_large = float(
            energy_score(offset, truth, seed=456, num_samples=MC_SAMPLES)
        )
        es_zeroed = float(
            energy_score(
                offset, truth, weights=zero_first, seed=456,
                num_samples=MC_SAMPLES,
            )
        )
        assert es_zeroed < es_large * 0.5


def test_variogram_score_with_weights():
    rng = np.random.default_rng(15000)
    for _ in range(10):
        dim = int(rng.integers(3, 31))
        dist = _random_joint(rng, dim)
        truth = jnp.asarray(rng.normal(size=dim))
        vs_none = float(variogram_score(dist, truth))
        vs_uniform = float(
            variogram_score(dist, truth, weights=jnp.ones((dim, dim)))
        )
        assert vs_none == pytest.approx(vs_uniform, abs=1e-10)
        vs_zero = float(
            variogram_score(dist, truth, weights=jnp.zeros((dim, dim)))
        )
        assert vs_zero == 0.0


@pytest.mark.parametrize("p", [1.0, 2.0], ids=["madogram", "variogram"])
def test_variogram_score_matches_reference_loop(p):
    """Direct transcription of the reference's row/tail(rest) summation
    (prediction_metrics.hpp:482-509): each unordered pair counted ONCE
    with weight w_ij (i < j) — catches constant-factor and weight-side
    bugs the invariance tests are blind to."""
    rng = np.random.default_rng(42)
    for _ in range(5):
        n = int(rng.integers(3, 12))
        q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        cov = (q * rng.gamma(2.0, 2.0, n)[None, :]) @ q.T
        mu = rng.standard_normal(n)
        y = rng.standard_normal(n)
        w = rng.random((n, n))

        expected = 0.0
        for i in range(n - 1):
            for j in range(i + 1, n):
                m = mu[j] - mu[i]
                s = math.sqrt(max(cov[i, i] + cov[j, j] - 2 * cov[i, j], 0.0))
                if p == 2.0:
                    e = m * m + s * s
                elif s > 0:
                    z = abs(m) / max(1e-16, s)
                    e = s * math.sqrt(2 / math.pi) * math.exp(
                        -0.5 * z * z
                    ) + abs(m) * math.erf(z / math.sqrt(2))
                else:
                    e = abs(m)
                d = abs(y[i] - y[j]) ** p
                expected += w[i, j] * (d - e) ** 2

        ours = float(
            variogram_score(
                JointDistribution(jnp.asarray(mu), jnp.asarray(cov)),
                jnp.asarray(y),
                weights=jnp.asarray(w),
                p=p,
            )
        )
        assert ours == pytest.approx(expected, rel=1e-9)


def test_variogram_score_folds_truth_variance():
    """prediction_metrics.hpp:512-521 — a MarginalDistribution truth adds
    its variance to the prediction covariance before scoring."""
    rng = np.random.default_rng(7)
    dist = _random_joint(rng, 6)
    y = rng.standard_normal(6)
    var = np.full(6, 0.5)
    from albatross_tpu import MarginalDistribution

    v_marg = float(
        variogram_score(dist, MarginalDistribution.create(jnp.asarray(y), jnp.asarray(var)))
    )
    inflated = JointDistribution(
        dist.mean, dist.covariance + jnp.diag(jnp.asarray(var))
    )
    v_inflated = float(variogram_score(inflated, jnp.asarray(y)))
    assert v_marg == pytest.approx(v_inflated, rel=1e-12)
    assert v_marg != pytest.approx(
        float(variogram_score(dist, jnp.asarray(y))), rel=1e-6
    )


def test_energy_score_raises_on_indefinite_covariance():
    """test_stats_scores.cc:741-750 — draw_mvn dies on non-PD covariance;
    semidefinite (singular) covariances like GP posterior joints sample
    fine via the LDLT-equivalent PSD sqrt."""
    mean = jnp.zeros(3)
    non_pd = jnp.diag(jnp.asarray([1.0, -1.0, 1.0]))
    with pytest.raises(ValueError, match="positive definite"):
        energy_score(JointDistribution(mean, non_pd), mean)
    singular = jnp.asarray([[1.0, 1.0, 0.0], [1.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    es = float(energy_score(JointDistribution(mean, singular), mean))
    assert math.isfinite(es) and es > 0.0


# ---------------------------------------------------------------------------
# Wasserstein-2 (test_stats_wasserstein.cc:60-162)
# ---------------------------------------------------------------------------
def test_wasserstein_zero():
    rng = np.random.default_rng(2222)
    for _ in range(20):
        dim = int(rng.integers(1, 31))
        dist = _random_joint(rng, dim)
        bound = 1e-12 * float(
            jnp.trace(dist.covariance) + jnp.sum(dist.mean**2)
        )
        assert float(wasserstein_2(dist, dist)) < max(bound, 1e-12)


def test_wasserstein_zero_ill_conditioned():
    rng = np.random.default_rng(2222)
    tiny = 1.0e-8
    for _ in range(20):
        dim = int(rng.integers(1, 31))
        dist = _ill_conditioned_joint(rng, dim, tiny)
        w2 = float(wasserstein_2(dist, dist))
        assert math.isfinite(w2)
        assert w2 < 2 * tiny * float(
            jnp.trace(dist.covariance) + jnp.sum(dist.mean**2)
        ) + 1e-12


def test_wasserstein_nonnegative():
    rng = np.random.default_rng(2222)
    for _ in range(20):
        dim = int(rng.integers(1, 31))
        a = _random_joint(rng, dim)
        b = _random_joint(rng, dim)
        assert float(wasserstein_2(a, b)) >= 0.0


def test_wasserstein_shift():
    rng = np.random.default_rng(2222)
    for _ in range(20):
        dim = int(rng.integers(1, 31))
        a = _random_joint(rng, dim)
        b = JointDistribution(jnp.asarray(rng.normal(size=dim)), a.covariance)
        w2 = float(wasserstein_2(a, b))
        mean_distance = float(jnp.sum((a.mean - b.mean) ** 2))
        assert w2 - mean_distance < 1e-10


def test_wasserstein_grows_with_covariance():
    rng = np.random.default_rng(2222)
    for _ in range(20):
        dim = int(rng.integers(1, 31))
        a = _random_joint(rng, dim)
        vals, vecs = np.linalg.eigh(np.asarray(a.covariance))
        b = JointDistribution(
            a.mean, jnp.asarray((vecs * (2 * vals)[None, :]) @ vecs.T)
        )
        c = JointDistribution(
            a.mean, jnp.asarray((vecs * (4 * vals)[None, :]) @ vecs.T)
        )
        assert float(wasserstein_2(a, c)) > float(wasserstein_2(a, b))


# ---------------------------------------------------------------------------
# minimum spanning tree / forest (test_minimum_spanning_tree.cc)
# ---------------------------------------------------------------------------
def test_compute_vertices():
    edges = [Edge(0, 1, 1.0)]
    assert len(compute_vertices(edges)) == 2
    edges.append(Edge(1, 2, 1.0))
    assert len(compute_vertices(edges)) == 3
    edges.append(Edge(2, 3, 1.0))
    assert len(compute_vertices(edges)) == 4
    edges.append(Edge(2, 0, 1.0))
    assert len(compute_vertices(edges)) == 4
    edges.append(Edge(3, 0, 1.0))
    assert len(compute_vertices(edges)) == 4


def test_mst_small_example():
    """test_minimum_spanning_tree.cc:45-58 — edge set (order is an
    implementation detail of the reference's priority queue)."""
    graph = create_graph([Edge(0, 1, 0.0), Edge(0, 2, 0.0), Edge(1, 2, 1.0)])
    tree = minimum_spanning_tree(graph)
    got = {frozenset((e.a, e.b)) for e in tree.edges}
    assert got == {frozenset((0, 1)), frozenset((0, 2))}
    assert sum(e.cost for e in tree.edges) == 0.0


def test_msf_disjoint_example():
    """test_minimum_spanning_tree.cc:60-80 — the forest spans every
    component."""
    graph = create_graph(
        [
            Edge(0, 1, 0.0),
            Edge(0, 2, 0.0),
            Edge(1, 2, 1.0),
            Edge(3, 4, 1.0),
            Edge(3, 5, 2.0),
            Edge(6, 7, 2.0),
        ]
    )
    forest = minimum_spanning_forest(graph)
    got = {frozenset((e.a, e.b)) for e in forest.edges}
    assert got == {
        frozenset((0, 1)),
        frozenset((0, 2)),
        frozenset((3, 4)),
        frozenset((3, 5)),
        frozenset((6, 7)),
    }
    assert sum(e.cost for e in forest.edges) == pytest.approx(5.0)


PRINCETON_TINY = [
    (4, 5, 0.35),
    (4, 7, 0.37),
    (5, 7, 0.28),
    (0, 7, 0.16),
    (1, 5, 0.32),
    (0, 4, 0.38),
    (2, 3, 0.17),
    (1, 7, 0.19),
    (0, 2, 0.26),
    (1, 2, 0.36),
    (1, 3, 0.29),
    (2, 7, 0.34),
    (6, 2, 0.40),
    (3, 6, 0.52),
    (6, 0, 0.58),
    (6, 4, 0.93),
]


def test_princeton_tiny():
    """test_minimum_spanning_tree.cc:92-128 — tinyEWG golden MST cost."""
    graph = create_graph([Edge(a, b, c) for a, b, c in PRINCETON_TINY])
    tree = minimum_spanning_tree(graph)
    forest = minimum_spanning_forest(graph)
    assert sum(e.cost for e in tree.edges) == pytest.approx(1.81)
    assert sum(e.cost for e in forest.edges) == pytest.approx(1.81)


def test_maximum_spanning_variants_negate_minimum():
    """minimum_spanning_tree.hpp:242-275 — max variants are the min
    variants on negated costs."""
    from albatross_tpu.utils import (
        maximum_spanning_forest,
        maximum_spanning_tree,
    )

    graph = create_graph([Edge(a, b, c) for a, b, c in PRINCETON_TINY])
    max_tree = maximum_spanning_tree(graph)
    neg = create_graph([Edge(a, b, -c) for a, b, c in PRINCETON_TINY])
    min_of_neg = minimum_spanning_tree(neg)
    assert {frozenset((e.a, e.b)) for e in max_tree.edges} == {
        frozenset((e.a, e.b)) for e in min_of_neg.edges
    }
    assert sum(e.cost for e in max_tree.edges) == pytest.approx(
        -sum(e.cost for e in min_of_neg.edges)
    )
    forest = maximum_spanning_forest(graph)
    assert sum(e.cost for e in forest.edges) == pytest.approx(
        sum(e.cost for e in max_tree.edges)
    )  # connected graph: forest == tree cost


def test_prim_tree_matches_kruskal_forest_on_random_connected_graphs():
    """Stands in for test_minimum_spanning_tree.cc:130-1424
    (mediumEWG, expected cost 10.46351): two independent algorithms must
    agree on total cost for connected graphs."""
    rng = np.random.default_rng(0)
    for _ in range(5):
        n_v = 40
        graph = Graph()
        for v in range(1, n_v):  # random spanning chain => connected
            graph.add_edge(int(rng.integers(0, v)), v, float(rng.uniform()))
        for _ in range(3 * n_v):
            a, b = rng.integers(0, n_v, 2)
            if a != b:
                graph.add_edge(int(a), int(b), float(rng.uniform()))
        tree_cost = sum(
            e.cost for e in minimum_spanning_tree(graph).edges
        )
        forest_cost = sum(
            e.cost for e in minimum_spanning_forest(graph).edges
        )
        assert len(minimum_spanning_tree(graph).edges) == n_v - 1
        assert tree_cost == pytest.approx(forest_cost)
