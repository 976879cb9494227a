#!/usr/bin/env bash
# Chunked test runner: one pytest process per file.
#
# The monolithic `pytest tests/` run segfaults intermittently deep into the
# session (XLA CPU after hundreds of compilations in one process); per-file
# processes isolate that and give a usable partial report.  ~2 cores in this
# image → serial.
set -u
cd "$(dirname "$0")/.."
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
