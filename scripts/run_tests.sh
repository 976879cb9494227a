#!/usr/bin/env bash
# Canonical CPU test-suite command (deterministic, one process):
#
#     scripts/run_tests.sh            # pytest tests/ -q
#     scripts/run_tests.sh --chunked  # legacy per-file isolation loop
#
# History: the monolithic run used to segfault intermittently deep into
# the session (XLA CPU with hundreds of live compiled executables in one
# process — round-2/3 carry-over).  tests/conftest.py now drops JAX's
# compiled-function caches at module boundaries, which bounds the live
# executable count; the full suite passes in one process (~35 min on 2
# cores).  The chunked loop remains as a fallback for bisecting an
# individual module crash.
set -u
cd "$(dirname "$0")/.."

if [ "${1:-}" != "--chunked" ]; then
    exec timeout 7200 python -m pytest tests/ -q -rs -p no:cacheprovider
fi

fail=0
results=()
for f in tests/test_*.py; do
    out=$(timeout 1800 python -m pytest "$f" -q 2>&1 | tail -1)
    code=$?
    results+=("$(printf '%-34s %s' "$f" "$out")")
    if [ $code -ne 0 ]; then
        fail=1
        echo "FAIL $f: $out"
    fi
done
printf '%s\n' "${results[@]}"
exit $fail
