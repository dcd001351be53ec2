"""Plan-shape audit over every registered key (r16 optimization round).

Builds each query's DataFrame, captures .explain("formatted"), and
tallies the guide's smell list per key: BatchEvalPython /
ArrowEvalPython / MapInArrow (Python boundary, §4), CartesianProduct /
BroadcastNestedLoopJoin (§3), Exchange SinglePartition carrying
non-aggregate rows (§2), windowspecdefinition without partition keys,
Exchange / Scan / Sort counts, and whether any parquet scan lost its
PushedFilters. Output: one JSON line per key to --out.

Usage: python tools/plan_audit_r16.py [--sf DIR] [--out FILE] [key ...]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sparkflow
from sparkflow.plans.explain import formatted_plan
from sparkflow.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/plan_audit_r16.jsonl")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    names = args.keys or sorted(sparkflow.QUERIES)
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    fh = open(args.out, "w")
    for name in names:
        rec: dict = {"key": name}
        try:
            df = sparkflow.QUERIES[name](spark, args.sf)
            p = formatted_plan(df)
            rec.update(
                exchanges=p.count("Exchange ("),
                reused=p.count("ReusedExchange"),
                scans=p.count("Scan parquet"),
                sorts=len(re.findall(r"\bSort \(", p)),
                windows=len(re.findall(r"\bWindow \(", p)),
                generates=p.count("Generate ("),
                py_batch=p.count("BatchEvalPython"),
                py_arrow=p.count("ArrowEvalPython"),
                py_map=p.count("MapInPandas") + p.count("MapInArrow")
                + p.count("FlatMapGroupsInPandas") + p.count("PythonMapInArrow"),
                udtf=p.count("PythonUDTF"),
                cartesian=p.count("CartesianProduct"),
                bnlj=p.count("BroadcastNestedLoopJoin"),
                single_part=p.count("Exchange SinglePartition"),
                smj=p.count("SortMergeJoin"),
                shj=p.count("ShuffledHashJoin"),
                bhj=p.count("BroadcastHashJoin"),
                global_window=len(
                    re.findall(r"windowspecdefinition\((?:[a-z_]+#\d+[L]?, )?"
                               r"(?:[a-z_]+#\d+[L]? )?(?:ASC|DESC)", p)
                ),
                rows_frame=0,
            )
            # unpartitioned window: windowspecdefinition whose first arg
            # is an ordering spec rather than a partition column list
            rec["unpart_window"] = len(
                re.findall(r"windowspecdefinition\([^,)]+ (?:ASC|DESC)", p)
            )
        except Exception as e:
            rec["error"] = f"{type(e).__name__}: {e}"[:200]
        fh.write(json.dumps(rec) + "\n")
        fh.flush()
        print(name, "ok" if "error" not in rec else rec["error"], flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
