#!/usr/bin/env bash
# Reproduce the round-3 10x scale bench (BASELINE.md "Round-3 scale
# bench"): replicate sf0.1 into a decorrelated 10x dataset, then run the
# headline bench against it. Correctness stays pinned at sf0.01
# (tools/crosscheck.py); this measures plan SCALING only.
set -euo pipefail
SRC="${1:-/root/testdata/sf0.1}"
DST="${2:-/tmp/bench_sf1.0}"
REPLICAS="${3:-10}"

python tools/make_scale_data.py "$SRC" "$DST" "$REPLICAS"
SPARK_GRAFT_SF_DIR="$DST" python bench.py
