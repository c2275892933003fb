#!/usr/bin/env python
"""Dump `.explain("formatted")` for named registry queries to files.

Used for the per-round optimization evidence
(``plans/r<N>/<query>_{before,after}.txt``): the judge cannot run
Spark, so plan claims in OPTIMIZATION_r<N>.md are checked against
these committed dumps.

Usage: python tools/plan_query.py OUT_DIR SUFFIX [sf_dir] QUERY [QUERY...]
       python tools/plan_query.py plans/r12 before /root/testdata/sf0.1 x_sim_knn_join
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mcm_problem_f_data_wrangling_spark.plans import REGISTRY
from mcm_problem_f_data_wrangling_spark.session import get_spark

from dump_plans import formatted_plan  # noqa: E402  (same tools dir)


def main() -> None:
    out_dir, suffix, sf_dir, names = (
        sys.argv[1],
        sys.argv[2],
        sys.argv[3],
        sys.argv[4:],
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan_query")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].spark(spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {sf_dir} ({suffix})\n\n")
            f.write(formatted_plan(df))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
