"""CDC-apply scale rung: is the MERGE state-sized or log-sized?

The claim _cdc_apply_batch makes for 100 TB: net-effect compaction
(last op per key) means however long the change log grows, the merge
joins against AT MOST one row per touched key — so apply cost is flat
in log length while only the compaction window pass scales with it.

Measured here by amplifying the sf0.1 changelog 1x/10x/50x with
re-sequenced replicas (same keys, strictly later event_ids, so the
LAST replica's ops win — net output identical across amplifications by
construction) and timing the two stages separately.

Usage: python tools/bench_cdc.py [sf_dir]
"""

from __future__ import annotations

import shutil
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from sparkflow.catalog import table
    from sparkflow.session import get_spark
    from sparkflow.sources.io import (
        _cdc_apply_batch,
        _cdc_net,
        _cdc_stage_v1,
        _cdc_users_params,
    )

    spark = get_spark("bench-cdc", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    cut, band_hi = _cdc_users_params(spark, sf_dir)
    ev = table(spark, sf_dir, "events")
    chg = ev.filter(
        (F.col("event_id") >= cut) & (F.col("user_id") < band_hi)
    ).select("event_id", "user_id", "event_type", "value")
    chg.cache().count()
    hi_e = chg.agg(F.max("event_id")).first()[0]

    print(f"sf_dir={sf_dir} cut={cut} band_hi={band_hi} "
          f"base changelog rows={chg.count()} (median of 3 per rung)")
    print(f"{'amp':>4s} {'log rows':>10s} {'net rows':>9s} "
          f"{'t_compact':>10s} {'t_apply':>8s}")

    for amp in (1, 10, 50):
        log = chg
        for k in range(1, amp):
            # replica k: same keys/ops, strictly later sequence numbers
            log = log.unionAll(
                chg.withColumn(
                    "event_id", F.col("event_id") + F.lit(k * (hi_e + 1))
                )
            )
        log = log.localCheckpoint()  # isolate rung cost from union lineage
        n_log = log.count()
        net = _cdc_net(log)  # the operator's own compaction definition

        tc, ta, n_net = [], [], 0
        for it in range(3):
            t0 = time.perf_counter()
            n_net = net.count()  # the log-sized pass: one keyed window
            tc.append(time.perf_counter() - t0)

            base = f"/tmp/sparkflow_io/bench_cdc/amp{amp}_it{it}"
            shutil.rmtree(base, ignore_errors=True)
            _cdc_stage_v1(spark, sf_dir, base, cut)
            t0 = time.perf_counter()
            # the state-sized half: prune + merge + write + commit
            _cdc_apply_batch(spark, base, 1, net, 0, band_hi - 1)
            ta.append(time.perf_counter() - t0)

        print(f"{amp:4d} {n_log:10d} {n_net:9d} "
              f"{statistics.median(tc):9.2f}s {statistics.median(ta):7.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
