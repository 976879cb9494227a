#!/usr/bin/env bash
# Golden-image parity battery on the real device (SURVEY §4 tier-2).
#
#   scripts/run_golden_tests.sh [-k filter] [extra pytest args]
#
# Goldens are rendered by the reference renderer via tools/golden/ (see
# tools/golden/README.md); this runs ray_tpu against them at the
# reference's own per-test spp + thresholds.
set -u
cd "$(dirname "$0")/.."
RAY_TPU_GOLDEN=1 exec python -m pytest tests/test_golden.py -q -s "$@"
