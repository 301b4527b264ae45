#!/bin/sh
# One-command verification: the exact checks the driver harness runs.
#   sh scripts/verify_all.sh            (from the repo root)
set -e
cd "$(dirname "$0")/.."
echo "== 1/3 oracle gate (Spark vs DuckDB, all queries, sf0.01) =="
python scripts/check_oracle.py
echo "== 2/3 unit + e2e tests =="
python -m pytest tests/ -q
echo "== 3/3 headline bench (one JSON line) =="
python bench.py
