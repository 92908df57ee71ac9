#!/usr/bin/env bash
# Full CI pipeline (the capability-equivalent of the reference's
# .github/workflows/ci.yaml lanes: unit tests, sanitizers, examples).
set -euo pipefail
cd "$(dirname "$0")"
echo "== lane 1: unit tests (8-device CPU mesh, f64) =="
ci/run_tests.sh
echo "== lane 2: f32 + jax_debug_nans smoke =="
ci/run_f32_debug_lane.sh
echo "== lane 3: native C++ under ASan/UBSan =="
ci/run_native_asan.sh
echo "== lane 4: examples + driver hooks =="
ci/run_examples.sh
echo "CI: ALL LANES GREEN"
