#!/bin/sh
# Pre-snapshot gate — run before EVERY end-of-round / milestone commit.
#
# Round 3 shipped a MinHash engine rewrite in the final snapshot commit
# without re-running the mirror; six driver-green queries went red for a
# whole round (VERDICT r3 item 1).  This gate makes that impossible to
# repeat: it refuses (exit 1) unless BOTH the physical-plan audit and
# the full 212-query oracle-parity mirror are green.
#
# Usage:  sh tools/pre_snapshot_gate.sh   (from the repo root)
set -e
cd "$(dirname "$0")/.."

echo "== gate 1/3: driver-contract smoke (vanilla session, like the driver) =="
python - <<'EOF'
import sys
sys.path.insert(0, ".")
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[4]").appName("gate-smoke").getOrCreate()
import __spark_entry__ as e

rows = e.entry(spark).collect()
assert rows, "entry() returned no rows"
qs, osql = e.queries(), e.oracle_sql()
assert set(osql) <= set(qs), "oracle_sql keys not a subset of queries"
print(f"entry rows={len(rows)} queries={len(qs)} oracles={len(osql)}")
spark.stop()
EOF

echo "== gate 2/3: physical-plan audit (red flags + shuffle snapshot) =="
python tools/audit_plans.py

echo "== gate 3/3: full oracle-parity mirror (sf0.001) =="
python -m pytest tests/test_oracle_parity.py -q

echo "GATE GREEN — safe to commit"
