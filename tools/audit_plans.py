#!/usr/bin/env python
"""Physical-plan audit over every registered query.

Prints exchange/Python-stage counts per query and fails (exit 1) on
scale red flags:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — accidental
  cross joins;
- ``BatchEvalPython`` — row-at-a-time Python UDF in the plan (only
  Arrow-batched ``ArrowEvalPython`` / ``FlatMapGroupsInPandas`` /
  ``MapInPandas`` stages are acceptable, and only in the model /
  multimodal queries).

Usage: python tools/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from mcm_problem_f_data_wrangling_spark.plans import REGISTRY  # noqa: E402
from mcm_problem_f_data_wrangling_spark.session import get_spark  # noqa: E402

RED_FLAGS = ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")
# queries whose semantics genuinely need a Python boundary
PYTHON_OK = {
    "x3_drift_fit_forecast",
    "x4_diagnostics",
    "x5_monte_carlo_fan",
    "x_multimodal_decode_stub",
    "x_multimodal_feature_extract",
    "x_bpe_token_stats",
    "x_multimodal_frame_pipeline",
}


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan_audit", shuffle_partitions=8)
    failures = []
    for name, q in REGISTRY.items():
        plan = q.spark(spark, sf)._jdf.queryExecution().executedPlan().toString()
        n_ex = plan.count("Exchange")
        n_py = (
            plan.count("ArrowEvalPython")
            + plan.count("FlatMapGroupsInPandas")
            + plan.count("MapInPandas")
        )
        hits = [f for f in RED_FLAGS if f in plan]
        if n_py and name not in PYTHON_OK:
            hits.append("unexpected-python-stage")
        status = "FLAG " + ",".join(hits) if hits else "ok"
        print(f"{status:6s} {name:40s} exchanges={n_ex} pythonStages={n_py}")
        if hits:
            failures.append(name)
    print(f"\n{len(REGISTRY) - len(failures)}/{len(REGISTRY)} clean")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
