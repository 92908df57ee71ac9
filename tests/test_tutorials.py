"""Tutorial smoke tests — the five reference notebooks' python mirrors must
run end-to-end (tutorials/README.md; reference tutorials/tutorial_*.ipynb)."""

import importlib
import os
import sys

import pytest

TUTORIALS = [
    "tutorial_1_one_dimension",
    "tutorial_2_maximum_likelihood",
    "tutorial_3_sparse",
    "tutorial_4_state_space",
    "tutorial_5_evaluating_uncertainty",
]


@pytest.mark.parametrize("name", TUTORIALS)
def test_tutorial_runs(name):
    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "tutorials")
    )
    try:
        mod = importlib.import_module(name)
        assert mod.main() in (0, None)
    finally:
        sys.path.pop(0)
