"""CSV I/O for datasets and predictions.

TPU-native counterpart of
/root/reference/include/albatross/src/utils/csv_utils.hpp:29-270 (write side)
and the fast-cpp-csv-parser usage in the reference examples (read side).

The reference reflects arbitrary feature structs through a cereal-XML trick;
here features are structured arrays, so columns are explicit.  Reading
prefers the native C++ parser (albatross_tpu._native) when built, falling
back to NumPy.
"""

from __future__ import annotations

import csv
from typing import Dict, Optional, Sequence

import jax
import numpy as np

from ..core.dataset import RegressionDataset
from ..core.distributions import MarginalDistribution


def _feature_columns(features) -> Dict[str, np.ndarray]:
    X = np.asarray(jax.device_get(features))
    if X.ndim == 1:
        return {"feature": X}
    return {f"feature_{i}": X[:, i] for i in range(X.shape[1])}


def write_to_csv(
    path_or_stream,
    dataset: RegressionDataset,
    predictions: Optional[MarginalDistribution] = None,
) -> None:
    """Dataset (+ optional held-out predictions) -> CSV
    (csv_utils.hpp write_to_csv)."""
    columns = _feature_columns(dataset.features)
    columns["target"] = np.asarray(jax.device_get(dataset.targets.mean))
    if dataset.targets.variance is not None:
        columns["target_variance"] = np.asarray(
            jax.device_get(dataset.targets.variance)
        )
    if predictions is not None:
        columns["prediction"] = np.asarray(jax.device_get(predictions.mean))
        columns["prediction_variance"] = np.asarray(
            jax.device_get(predictions.get_variance())
        )

    close = False
    if isinstance(path_or_stream, str):
        stream = open(path_or_stream, "w", newline="")
        close = True
    else:
        stream = path_or_stream
    try:
        writer = csv.writer(stream)
        names = list(columns)
        writer.writerow(names)
        n = len(columns[names[0]])
        for i in range(n):
            writer.writerow([repr(float(columns[name][i])) for name in names])
    finally:
        if close:
            stream.close()


def read_csv_columns(path: str) -> Dict[str, np.ndarray]:
    """Column name -> float array.  Uses the native parser when available."""
    try:
        from .._native import parse_csv  # C++ fast path

        return parse_csv(path)
    except Exception:
        with open(path, newline="") as f:
            reader = csv.reader(f)
            header = next(reader)
            rows = [row for row in reader if row]
        data = np.asarray(rows, dtype=np.float64)
        return {name: data[:, i] for i, name in enumerate(header)}


def read_csv_dataset(
    path: str,
    feature_columns: Sequence[str],
    target_column: str = "target",
    variance_column: Optional[str] = None,
) -> RegressionDataset:
    import jax.numpy as jnp

    columns = read_csv_columns(path)
    feats = np.stack([columns[c] for c in feature_columns], axis=1)
    if feats.shape[1] == 1:
        feats = feats[:, 0]
    variance = (
        jnp.asarray(columns[variance_column])
        if variance_column is not None and variance_column in columns
        else None
    )
    return RegressionDataset.create(
        jnp.asarray(feats), jnp.asarray(columns[target_column]), variance
    )
