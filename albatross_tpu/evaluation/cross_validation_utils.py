"""Fast held-out prediction machinery (LOO / LOGO).

TPU-native re-design of
/root/reference/include/albatross/src/evaluation/cross_validation_utils.hpp:102-286.

The math: with the full training covariance factorized once, the held-out
prediction for group g falls out of the diagonal blocks of the inverse,

    mean_g = y_g - ((A^-1)_gg)^-1 v_g       cov_g = ((A^-1)_gg)^-1

(v = A^-1 y is the information vector).  One triangular solve against the
identity replaces the reference's threaded per-column loop; the per-group
small solves are *batched* over the group axis (vmap) when fold sizes are
uniform — the common LOO case is fully vectorized with no factorization at
all (variance = 1/diag(A^-1), Rasmussen Eq. 5.12).
"""

from __future__ import annotations

from typing import Type

import jax
import jax.numpy as jnp
import numpy as np

from ..core.distributions import JointDistribution, MarginalDistribution
from ..indexing.grouping import Grouped
from ..ops.linalg import CholeskyFactor


def leave_one_out_conditional_variance(chol: CholeskyFactor) -> jnp.ndarray:
    """1 / diag(A⁻¹) (cross_validation_utils.hpp:132-144)."""
    return 1.0 / chol.inverse_diagonal()


def leave_one_out_conditional(
    prior: JointDistribution, truth: MarginalDistribution
) -> MarginalDistribution:
    """Conditional of each variable given all others
    (cross_validation_utils.hpp:147-163)."""
    covariance = prior.covariance + jnp.diag(truth.get_variance())
    chol = CholeskyFactor.factorize(covariance)
    loo_variance = leave_one_out_conditional_variance(chol)
    deviation = truth.mean - prior.mean
    loo_mean = truth.mean - chol.solve(deviation) * loo_variance
    return MarginalDistribution(loo_mean, loo_variance)


def _grouped_inverse_blocks(chol, indexers: Grouped):
    """(A⁻¹)_gg per group, batched when group sizes are uniform."""
    from jax.scipy.linalg import solve_triangular

    if not isinstance(chol, CholeskyFactor):
        # generic representation (e.g. DistributedCholesky): delegate to its
        # own inverse_blocks and skip the local-Linv fast paths
        blocks = chol.inverse_blocks(list(indexers.values()))
        return (
            {key: blk for key, blk in zip(indexers.keys(), blocks)},
            None,
            None,
        )

    Linv = solve_triangular(
        chol.L, jnp.eye(chol.L.shape[0], dtype=chol.L.dtype), lower=True
    )
    sizes = [len(idx) for idx in indexers.values()]
    uniform = len(set(sizes)) == 1
    if uniform:
        idx_mat = jnp.asarray(np.stack(indexers.values()))  # (G, b)
        cols = Linv[:, idx_mat]  # (n, G, b)
        cols = jnp.moveaxis(cols, 1, 0)  # (G, n, b)
        blocks = jnp.einsum("gnb,gnc->gbc", cols, cols)
        return {
            key: blocks[g] for g, key in enumerate(indexers.keys())
        }, blocks, idx_mat
    out = {}
    for key, idx in indexers.items():
        cols = Linv[:, jnp.asarray(idx)]
        out[key] = cols.T @ cols
    return out, None, None


def held_out_predictions(
    train_covariance: CholeskyFactor,
    target_mean: jnp.ndarray,
    information: jnp.ndarray,
    indexers: Grouped,
    predict_type: Type = MarginalDistribution,
) -> Grouped:
    """Per-group held-out predictions (cross_validation_utils.hpp:198-251).

    ``target_mean`` is the raw target mean — the information vector already
    accounts for the mean function (see the note at gp.hpp:465-482).
    """
    sizes = [len(idx) for idx in indexers.values()]

    # -- fully vectorized LOO fast path ------------------------------------
    if predict_type is not JointDistribution and all(s == 1 for s in sizes):
        ainv_diag = train_covariance.inverse_diagonal()
        variance = 1.0 / ainv_diag
        order = jnp.asarray(
            np.concatenate([np.asarray(idx) for idx in indexers.values()])
        )
        mean = target_mean[order] - information[order] * variance[order]
        var_o = variance[order]
        out = {}
        for g, key in enumerate(indexers.keys()):
            if predict_type is MarginalDistribution:
                out[key] = MarginalDistribution(mean[g : g + 1], var_o[g : g + 1])
            else:
                out[key] = mean[g : g + 1]
        return Grouped(out)

    blocks, stacked, idx_mat = _grouped_inverse_blocks(
        train_covariance, indexers
    )

    # -- batched uniform-size path -----------------------------------------
    if stacked is not None:
        y_g = target_mean[idx_mat]  # (G, b)
        v_g = information[idx_mat]  # (G, b)
        Lb = jnp.linalg.cholesky(stacked)  # (G, b, b)

        def _one(L, y, v):
            from jax.scipy.linalg import cho_solve

            mean = y - cho_solve((L, True), v)
            eye = jnp.eye(L.shape[0], dtype=L.dtype)
            inv = cho_solve((L, True), eye)
            return mean, inv

        means, invs = jax.vmap(_one)(Lb, y_g, v_g)
        out = {}
        for g, key in enumerate(indexers.keys()):
            if predict_type is JointDistribution:
                out[key] = JointDistribution(means[g], invs[g])
            elif predict_type is MarginalDistribution:
                out[key] = MarginalDistribution(
                    means[g], jnp.diagonal(invs[g])
                )
            else:
                out[key] = means[g]
        return Grouped(out)

    # -- ragged fallback ----------------------------------------------------
    out = {}
    for key, idx in indexers.items():
        idx = jnp.asarray(idx)
        block = blocks[key]
        bchol = CholeskyFactor.factorize(block)
        mean = target_mean[idx] - bchol.solve(information[idx])
        if predict_type is JointDistribution:
            out[key] = JointDistribution(mean, bchol.inverse())
        elif predict_type is MarginalDistribution:
            out[key] = MarginalDistribution(mean, bchol.inverse_diagonal())
        else:
            out[key] = mean
    return Grouped(out)


def leave_one_group_out_conditional(
    prior: JointDistribution,
    truth: MarginalDistribution,
    indexers: Grouped,
    predict_type: Type = MarginalDistribution,
) -> Grouped:
    """Public LOGO conditional API (cross_validation_utils.hpp:255-286)."""
    covariance = prior.covariance + jnp.diag(truth.get_variance())
    chol = CholeskyFactor.factorize(covariance)
    information = chol.solve(truth.mean - prior.mean)
    return held_out_predictions(
        chol, truth.mean, information, indexers, predict_type
    )


def cross_validated_scores(metric, folds: Grouped, predictions: Grouped):
    """Apply a metric per fold (cross_validation_utils.hpp:102-130)."""
    scores = []
    for key, fold in folds.items():
        scores.append(metric(predictions[key], fold.test_dataset.targets))
    return jnp.stack([jnp.asarray(s) for s in scores])
