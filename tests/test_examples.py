"""Example smoke tests — the integration lane, mirroring the reference CI
which builds and *runs* its examples (ci/run_thread_sanitizer_tests.sh)."""

import sys

import pytest


def run_example(module_name, argv):
    import importlib

    mod = importlib.import_module(module_name)
    old = sys.argv
    sys.argv = [module_name] + argv
    try:
        assert mod.main() == 0
    finally:
        sys.argv = old


@pytest.mark.parametrize("mode", ["radial_only", "parametric"])
def test_sinc_example(mode):
    run_example("examples.sinc", ["--mode", mode, "--n", "20"])


def test_sparse_example():
    run_example("examples.sparse", ["--n", "60", "--inducing", "8"])


def test_temperature_example():
    run_example("examples.temperature", ["--stations", "50"])


def test_sampler_example(tmp_path):
    run_example(
        "examples.sampler",
        [
            "--n", "15",
            "--walkers", "8",
            "--iterations", "15",
            "--burn-in", "5",
            "--output", str(tmp_path / "chains.csv"),
        ],
    )
    assert (tmp_path / "chains.csv").exists()


def test_inspection_example():
    run_example("examples.inspection", [])


def test_distributed_example():
    run_example("examples.distributed", ["--n", "128"])


def test_accuracy_example():
    run_example("examples.accuracy", ["--n", "400"])
