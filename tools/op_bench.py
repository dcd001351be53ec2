"""Per-operator wall-clock sweep over the full query registry (r16).

Guide §1: measure FIRST, with the noop sink (§1.4) so the number is the
computation, not the toPandas transfer, and with job descriptions (§1.5)
so the UI/event log maps back to keys.

Protocol per key, cold-session-comparable:
  t_build  — QUERIES[key](spark, sf_dir): plan construction. For most
             keys this is py4j RPC only (~0.05-0.3 s); for keys that run
             eager work at build time (streaming availableNow twins,
             staged-posture writers, localCheckpoint users) the real
             execution lands HERE, which is why build is timed and
             reported separately instead of being hidden.
  t_first  — first noop write (cold caches, JIT).
  t_noop   — median of N further noop writes (warm).

Output: one JSON line per key to stdout (and optionally a file), plus a
sorted summary table on stderr. No state is persisted between runs; the
sweep reads only $SPARK_GRAFT_SF_DIR parquet.

Usage:
  python tools/op_bench.py [--sf DIR] [--n 3] [--out FILE] [key ...]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sparkflow
from sparkflow.session import get_spark


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--n", type=int, default=3, help="warm noop iterations")
    ap.add_argument("--out", default=None, help="also append JSONL here")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    names = args.keys or sorted(sparkflow.QUERIES)
    spark = get_spark("op-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the session floor once so key #1 doesn't absorb JVM start.
    noop(spark.range(10))

    out_fh = open(args.out, "a") if args.out else None
    rows = []
    for name in names:
        fn = sparkflow.QUERIES[name]
        spark.sparkContext.setJobDescription(f"op_bench:{name}")
        rec: dict = {"key": name, "sf_dir": args.sf}
        try:
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            rec["t_build"] = round(time.perf_counter() - t0, 4)
            t0 = time.perf_counter()
            noop(df)
            rec["t_first"] = round(time.perf_counter() - t0, 4)
            ts = []
            for _ in range(args.n):
                t0 = time.perf_counter()
                noop(df)
                ts.append(time.perf_counter() - t0)
            rec["t_noop"] = round(statistics.median(ts), 4)
            rec["t_total_cold"] = round(rec["t_build"] + rec["t_first"], 4)
        except Exception as e:  # keep sweeping; a broken key is a finding
            rec["error"] = f"{type(e).__name__}: {e}"[:300]
        finally:
            spark.sparkContext.setJobDescription(None)
        line = json.dumps(rec)
        print(line, flush=True)
        if out_fh:
            out_fh.write(line + "\n")
            out_fh.flush()
        rows.append(rec)

    ok = [r for r in rows if "t_noop" in r]
    ok.sort(key=lambda r: r["t_first"] + r["t_build"], reverse=True)
    print("\n== slowest by cold total (build + first noop) ==", file=sys.stderr)
    for r in ok[:40]:
        print(
            f"{r['key']:34s} build={r['t_build']:7.3f} first={r['t_first']:7.3f} warm={r['t_noop']:7.3f}",
            file=sys.stderr,
        )
    errs = [r for r in rows if "error" in r]
    for r in errs:
        print(f"ERROR {r['key']}: {r['error']}", file=sys.stderr)
    spark.stop()
    sys.exit(1 if errs else 0)


if __name__ == "__main__":
    main()
