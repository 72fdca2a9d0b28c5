#!/bin/bash
# Warm the CPU-test compilation cache with one clean per-file pytest
# pass.  Short-lived processes write cache entries safely (the
# remote-compile relay's executable serialization crashes long-lived
# processes — see tests/conftest.py); the full suite then runs with
# writes disabled against a fully warm cache.
#
# Usage:  bash tools/warm_cache.sh [pytest args...]
set -u
cd "$(dirname "$0")/.."
fail=0
for f in tests/test_*.py; do
    echo "=== $f"
    FEOS_TPU_CACHE_WRITE=1 python -m pytest "$f" -q "$@" || fail=1
done
exit $fail
