#!/usr/bin/env bash
# Unit/integration lane: full pytest suite on the 8-virtual-device CPU mesh.
# Mirrors /root/reference/ci/run_tests.sh (gcc+clang ASan/UBSan unit lane).
set -euo pipefail
cd "$(dirname "$0")/.."
env PYTHONPATH= PALLAS_AXON_POOL_IPS= python -m pytest tests/ -q
