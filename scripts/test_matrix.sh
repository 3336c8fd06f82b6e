#!/usr/bin/env bash
# Config-matrix test driver — the scripts/tool_test.sh analog.
#
# The reference's CI driver permutes build keys (STATIC/BLAS/MNK/...) and
# reruns the suite per combination; here build-time is trace-time, so the
# matrix permutes the runtime config surface instead: native backend
# on/off, each f64 strategy, and a tightened registry capacity (exercises
# the degrade path).  Hermetic: CPU interpret + 8 virtual devices.
#
# Usage: scripts/test_matrix.sh [extra pytest args]

set -u
cd "$(dirname "$0")/.."

PYTEST=(python -m pytest tests/ -q -x "$@")
fail=0

run() {
    # $1 = label; remaining args = VAR=value env assignments (may be none)
    local label="$1"; shift
    echo "=== ${label}: env $* ==="
    if env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= "$@" "${PYTEST[@]}"; then
        echo "=== ${label}: OK ==="
    else
        echo "=== ${label}: FAILED ==="
        fail=1
    fi
}

run "default        "
run "no-native      " XSMM_NATIVE=0
run "f64=split2     " XSMM_F64=split2
run "f64=float32    " XSMM_F64=float32
run "tiny-registry  " XSMM_REGISTRY_CAPACITY=8
run "getrf-no-unroll" XSMM_GETRF_UNROLL=0

exit ${fail}
