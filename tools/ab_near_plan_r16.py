"""Same-window A/B of the LSH near-dup PLAN (memo bypassed).

tools/ab_r16.py cannot measure llm_dedup_near / llm_dedup_clusters'
shingle pipeline: _near_pairs memoizes one localCheckpoint per
(session, sf_dir), so after the warmup both OLD and NEW read their
cached checkpoint and the noop write times nothing. This harness
interleaves OLD/NEW executions of `_near_pairs_plan` itself — the full
shingle → MinHash → band join → verify pipeline — in one session.

Usage: python tools/ab_near_plan_r16.py [--sf DIR] [--n 3]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ab_r16 import OLD_ROOT, materialize_old  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=3)
    args = ap.parse_args()

    materialize_old()
    sys.path.insert(0, OLD_ROOT)
    from sparkflow.llm.dedup import _near_pairs_plan as new_plan
    from sparkflow.session import get_spark
    from sparkflow_old.llm.dedup import _near_pairs_plan as old_plan

    spark = get_spark("ab-near-plan-r16")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).write.format("noop").mode("overwrite").save()

    def once(fn) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    once(old_plan)
    once(new_plan)
    olds, news = [], []
    for _ in range(args.n):
        news.append(once(new_plan))
        olds.append(once(old_plan))
    om, nm = statistics.median(olds), statistics.median(news)
    print(
        f"_near_pairs_plan old={om:8.3f}  new={nm:8.3f}  ratio={nm / om:5.2f}"
        f"   (old runs {['%.2f' % t for t in olds]},"
        f" new runs {['%.2f' % t for t in news]})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
