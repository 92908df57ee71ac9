"""Checkpointing: save/load of models, fits and sampler state.

TPU-native re-design of the reference's cereal-based serialization
(/root/reference/include/albatross/src/cereal/*, SURVEY.md §2.11): the
reference archives every fit type (params+priors, LDLT internals, SPQR
structs) in 4 formats with zstd-compressed matrix payloads and explicit
versioning.

Here everything is a pytree, so one mechanism covers all of it:
* ``save_checkpoint`` flattens the object, stores array leaves as a
  compressed ``.npz``-style payload plus a pickled treedef, with an explicit
  ``SERIALIZATION_VERSION`` (gp.hpp:230's versioning);
* params/priors additionally round-trip through *JSON* (params_json.py) for
  human-readable, cross-language checkpoints mirroring cereal's JSON archive.
"""

from __future__ import annotations

import io
import pickle
import zlib
from typing import Any

import jax
import numpy as np

SERIALIZATION_VERSION = 1
MAGIC = b"ALBTPU01"


def save_checkpoint(path: str, obj: Any) -> None:
    """Serialize any pytree (model, FitModel, chain, ...) to disk.

    Array leaves are materialized to host and zlib-compressed (the cereal
    archives zstd-compress Eigen payloads, cereal/eigen.hpp:25-64).
    """
    leaves, treedef = jax.tree_util.tree_flatten(obj)
    host_leaves = [np.asarray(jax.device_get(leaf)) for leaf in leaves]
    buffer = io.BytesIO()
    np.savez(buffer, *host_leaves)
    payload = {
        "version": SERIALIZATION_VERSION,
        "treedef": pickle.dumps(treedef),
        "arrays": zlib.compress(buffer.getvalue(), level=3),
    }
    with open(path, "wb") as f:
        f.write(MAGIC)
        pickle.dump(payload, f)


def load_checkpoint(path: str) -> Any:
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(f"{path} is not an albatross_tpu checkpoint")
        payload = pickle.load(f)
    if payload["version"] > SERIALIZATION_VERSION:
        raise ValueError(
            f"checkpoint version {payload['version']} is newer than "
            f"supported {SERIALIZATION_VERSION}"
        )
    treedef = pickle.loads(payload["treedef"])
    data = np.load(io.BytesIO(zlib.decompress(payload["arrays"])))
    leaves = [data[key] for key in data.files]
    import jax.numpy as jnp

    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(leaf) for leaf in leaves]
    )
