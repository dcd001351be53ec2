"""Same-window A/B: git-HEAD implementations vs working-tree ones.

BASELINE.md round-5 lesson (re-confirmed r16): cross-session timings on
this box drift ±50% on heavy keys, so ONLY interleaved same-session A/B
is meaningful. This harness materializes the committed package as
`sparkflow_old` (relative imports make the rename safe), then for each
key alternates OLD/NEW executions in one session — fresh DataFrame per
iteration (fresh shuffle ids → genuine full executions), noop sink,
spark.catalog.clearCache() before every iteration so persist()-based
variants cannot carry cache across iterations.

Usage: python tools/ab_r16.py [--sf DIR] [--n 3] key [key ...]
"""

from __future__ import annotations

import argparse
import os
import shutil
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OLD_ROOT = "/tmp/sparkflow_ab_old"


def materialize_old() -> None:
    shutil.rmtree(OLD_ROOT, ignore_errors=True)
    os.makedirs(OLD_ROOT)
    subprocess.run(
        f"git -C {REPO} archive HEAD sparkflow | tar -x -C {OLD_ROOT}",
        shell=True,
        check=True,
    )
    os.rename(f"{OLD_ROOT}/sparkflow", f"{OLD_ROOT}/sparkflow_old")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=3, help="timed pairs per key")
    ap.add_argument("keys", nargs="+")
    args = ap.parse_args()

    materialize_old()
    sys.path.insert(0, OLD_ROOT)
    sys.path.insert(0, REPO)
    import sparkflow
    import sparkflow_old
    from sparkflow.session import get_spark

    spark = get_spark("ab-r16")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).write.format("noop").mode("overwrite").save()

    def once(fn) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = fn(spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for key in args.keys:
        old_fn = sparkflow_old.QUERIES[key]
        new_fn = sparkflow.QUERIES[key]
        # one untimed warmup each (JIT, catalog, any session memo)
        once(old_fn)
        once(new_fn)
        olds, news = [], []
        for _ in range(args.n):
            news.append(once(new_fn))
            olds.append(once(old_fn))
        om, nm = statistics.median(olds), statistics.median(news)
        print(
            f"{key:34s} old={om:8.3f}  new={nm:8.3f}  ratio={nm / om:5.2f}"
            f"   (old runs {['%.2f' % t for t in olds]},"
            f" new runs {['%.2f' % t for t in news]})",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
