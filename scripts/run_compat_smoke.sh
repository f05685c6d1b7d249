#!/usr/bin/env bash
# PySpark-version compatibility smoke — the analog of the reference's
# Polars-version matrix (reference scripts/run_matrix_tests.sh:37-52 and
# .github/workflows/polars-compatibility.yml), reduced to the versions
# installed in the current environment.
#
# Usage:
#   scripts/run_compat_smoke.sh                 # smoke against installed pyspark
#   PYSPARK_VERSIONS="4.0.1 4.1.2" scripts/run_compat_smoke.sh
#       # full matrix: needs one virtualenv per version under .venvs/
#       # (not created here — this sandbox forbids package installs; the
#       # loop documents the intended CI shape)
#
# The smoke itself is intentionally small: import the package, run the
# fast option-surface + edge-case tests, and print the version line the
# CI log would grep. The full suite stays in the default `pytest tests/`.
set -euo pipefail
cd "$(dirname "$0")/.."

run_one() {
  local py="$1"
  echo "== pyspark compat smoke: $("$py" -c 'import pyspark; print(pyspark.__version__)') =="
  "$py" -c "import polars_sim_spark; print('import ok:', polars_sim_spark.__name__)"
  "$py" -m pytest tests/test_join_sim_options.py tests/test_edge_cases.py -q
}

if [[ -n "${PYSPARK_VERSIONS:-}" ]]; then
  for v in $PYSPARK_VERSIONS; do
    venv=".venvs/pyspark-$v"
    if [[ ! -x "$venv/bin/python" ]]; then
      echo "skip $v: no venv at $venv (create with: python -m venv $venv && $venv/bin/pip install pyspark==$v pytest pandas pyarrow numpy duckdb hypothesis)"
      continue
    fi
    run_one "$venv/bin/python"
  done
else
  run_one "$(command -v python)"
fi
echo "compat smoke: OK"
