"""Dump .explain("formatted") for named keys to plans/r17/<key>_<tag>.txt.

Round-16 optimization evidence: the judge checks plan claims against these
files. Usage:
  python tools/plan_dump_r17.py <tag> key [key ...]
where <tag> is `before` or `after`.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sparkflow
from sparkflow.plans.explain import formatted_plan
from sparkflow.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17")


def main() -> None:
    tag = sys.argv[1]
    keys = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("plan-dump-r17")
    spark.sparkContext.setLogLevel("ERROR")
    for key in keys:
        df = sparkflow.QUERIES[key](spark, SF)
        path = os.path.join(OUT, f"{key}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {key} @ {SF} ({tag}, r17)\n")
            fh.write(formatted_plan(df))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
