"""Durable content-addressed posture staging (r11 verdict item 1).

The contract under test: a posture staged by ONE session is read
through by a FRESH session (different process, different
applicationId) with no re-staging; a corpus whose content digest
changed can never serve the stale artifact (clean miss -> cold
fallback); concurrent publishers never corrupt each other; and the
serving frames are bit-identical to the cold plans they replace.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import textwrap

import pytest

import sparkflow
from sparkflow.sources import staging
from sparkflow.sources.io import distinct_rollup, rollup_serve


def _stage_all(spark, sf_dir):
    for key in ("maintenance_rollup_distinct", "maintenance_rollup_pricing",
                "maintenance_rollup_tumbling"):
        sparkflow.QUERIES[key](spark, sf_dir).collect()


def test_fresh_process_reads_through(spark, sf_small):
    """Stage the distinct rollup + the orderkey bucket family in THIS
    session, then prove a brand-new PROCESS (own SparkContext, own
    applicationId) resolves both postures without any staging write:
    the rollup consumer returns the serving frame, and the bucketed
    probe re-attaches with metadata-only DDL."""
    sparkflow.QUERIES["maintenance_rollup_distinct"](spark, sf_small).collect()
    sparkflow.QUERIES["join_multiway_star_bucketed"](spark, sf_small).collect()
    expected = sorted(
        (r["event_type"], r["n_users"], r["n_events"])
        for r in sparkflow.QUERIES["agg_distinct"](spark, sf_small).collect()
    )
    script = textwrap.dedent(f"""
        import sys
        sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
        import sparkflow
        from sparkflow.session import get_spark
        from sparkflow.operators.joins import _bucketed_table_if_exists
        from sparkflow.sources.io import distinct_rollup, rollup_serve
        import os
        os.environ["SPARK_GRAFT_CPUS"] = "4"
        spark = get_spark("staging-fresh-twin", shuffle_partitions=4)
        spark.sparkContext.setLogLevel("ERROR")
        sf = {sf_small!r}
        serve = rollup_serve(spark, sf, "distinct")
        assert serve is not None, "fresh session missed the published serve frame"
        got = sorted((r["event_type"], r["n_users"], r["n_events"])
                     for r in sparkflow.QUERIES["agg_distinct"](spark, sf).collect())
        assert got == {expected!r}, got
        li = _bucketed_table_if_exists(spark, sf, "lineitem", "l_orderkey", 32)
        assert li is not None, "fresh session missed the published bucket family"
        assert li.count() == 6000
        print("FRESH_SESSION_OK")
        spark.stop()
    """)
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=420,
    )
    assert "FRESH_SESSION_OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]


def test_digest_change_invalidates(spark, sf_small, tmp_path):
    """The invalidation rule IS the address: stage against a private
    copy of the corpus, mutate the corpus (mtime bump — the cheapest
    change a rewrite makes), and every probe must miss — the consumer
    falls back to the raw plan and still returns correct values."""
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    for t in sparkflow.catalog.TABLES:
        shutil.copyfile(
            os.path.join(sf_small, f"{t}.parquet"), corpus / f"{t}.parquet"
        )
    sf = str(corpus)
    cold = sorted(
        (r["event_type"], r["n_users"], r["n_events"])
        for r in sparkflow.QUERIES["agg_distinct"](spark, sf).collect()
    )
    _stage_all(spark, sf)
    assert rollup_serve(spark, sf, "distinct") is not None
    # mutate the corpus: same bytes, newer mtime — a conservative
    # staleness signal (rewrites always bump mtime)
    os.utime(corpus / "events.parquet")
    assert rollup_serve(spark, sf, "distinct") is None
    assert distinct_rollup(spark, sf, create=False) is None
    got = sorted(
        (r["event_type"], r["n_users"], r["n_events"])
        for r in sparkflow.QUERIES["agg_distinct"](spark, sf).collect()
    )
    assert got == cold


def test_concurrent_publish_loser_discards(tmp_path):
    """Two writers race the same artifact: both build private
    scratches, one rename wins, the loser's publish() is a no-op
    success that removes its scratch — never an error, never a
    corrupted final directory."""
    final = tmp_path / "shared" / "kind" / "digest" / "art"
    s1 = staging.scratch_path(str(final), "app-1")
    s2 = staging.scratch_path(str(final), "app-2")
    for s, payload in ((s1, "one"), (s2, "two")):
        os.makedirs(s)
        with open(os.path.join(s, "part-0"), "w") as fh:
            fh.write(payload)
    staging.publish(s1, str(final), {"who": 1})
    staging.publish(s2, str(final), {"who": 2})  # loser: must not raise
    assert staging.is_published(str(final))
    with open(final / "part-0") as fh:
        assert fh.read() == "one"  # winner's bytes, untouched
    assert not os.path.exists(s2)  # loser scratch discarded


def test_serve_frames_bit_identical(spark, sf_med):
    """The serving artifacts are written from the exact read-side
    expressions, so staged reads are bit-identical to the cold plans
    (parquet round-trips doubles losslessly) — checked on the Q1
    pricing frame, whose eight doubles are the most bit-fragile."""
    cold = sparkflow.QUERIES["agg_hash_group"](spark, sf_med)
    # force the cold shape regardless of published artifacts
    from pyspark.sql import functions as F

    from sparkflow.catalog import table
    from sparkflow.oracle_compat import davg, dsum
    from sparkflow.operators.aggregates import _charge_units, _disc_price_units

    li = table(spark, sf_med, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp")
    )
    cold = li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        (F.sum(_disc_price_units()).cast("double") / 10000.0).alias("sum_disc_price"),
        (F.sum(_charge_units()).cast("double") / 1000000.0).alias("sum_charge"),
        davg("l_quantity", "avg_qty"),
        davg("l_extendedprice", "avg_price"),
        davg("l_discount", "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )
    cold_pd = cold.toPandas().sort_values(
        ["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    sparkflow.QUERIES["maintenance_rollup_pricing"](spark, sf_med).collect()
    serve = rollup_serve(spark, sf_med, "pricing")
    assert serve is not None
    warm_pd = serve.toPandas().sort_values(
        ["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    assert cold_pd[warm_pd.columns].equals(warm_pd)  # exact, not approx


def test_read_only_probe_never_writes(spark, sf_small, tmp_path):
    """create=False probes and _bucketed_table_if_exists on an unstaged
    corpus return None without creating anything under the shared
    root."""
    corpus = tmp_path / "c2"
    corpus.mkdir()
    for t in sparkflow.catalog.TABLES:
        shutil.copyfile(
            os.path.join(sf_small, f"{t}.parquet"), corpus / f"{t}.parquet"
        )
    sf = str(corpus)
    digest = staging.corpus_digest(sf, ("events",))
    assert rollup_serve(spark, sf, "distinct") is None
    assert distinct_rollup(spark, sf, create=False) is None
    from sparkflow.operators.joins import _bucketed_table_if_exists

    assert _bucketed_table_if_exists(spark, sf, "lineitem", "l_orderkey", 32) is None
    root = os.path.join(staging.SHARED_ROOT, "rollup", digest)
    assert not os.path.exists(root)


def test_staging_vacuum_lifecycle(spark, sf_small, tmp_path):
    """staging_vacuum (r12): live artifacts are never reclaimed (any
    age), crashed-writer scratches and stale/undigestable artifacts are
    reclaimed only past the min-age window (the open-reader contract),
    and empty parents disappear."""
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    shutil.copy(
        os.path.join(sf_small, "events.parquet"),
        corpus / "events.parquet",
    )
    sf = str(corpus)

    def build():
        return (
            spark.read.parquet(os.path.join(sf, "events.parquet"))
            .groupBy("event_type").count()
        )

    staging.stage_parquet(
        spark, "testvac", sf, ["events"], "counts", build, create=True
    )
    live = staging.shared_path("testvac", sf, ["events"], "counts")
    assert staging.is_published(live)

    # live artifacts survive even a zero-age vacuum
    s = staging.staging_vacuum(min_age_sec=0.0)
    assert staging.is_published(live)
    assert s["kept_live"] >= 1

    # crashed-writer scratches: an OLD one is reclaimed, a YOUNG one is
    # protected by the window
    old_scratch = staging.scratch_path(live, "crashed-app")
    young_scratch = staging.scratch_path(live + "2", "live-app")
    for p in (old_scratch, young_scratch):
        os.makedirs(p)
        with open(os.path.join(p, "part-000"), "w") as fh:
            fh.write("x")
    past = os.path.getmtime(old_scratch) - 7200
    os.utime(old_scratch, (past, past))
    s = staging.staging_vacuum(min_age_sec=3600)
    assert not os.path.exists(old_scratch) and s["removed_scratch"] == 1
    assert os.path.exists(young_scratch) and s["kept_young"] >= 1
    shutil.rmtree(young_scratch)

    # mutate the corpus: the artifact is now stale (unreachable) but a
    # YOUNG manifest keeps it (an open reader may still be scanning)
    os.utime(corpus / "events.parquet")
    s = staging.staging_vacuum(min_age_sec=3600)
    assert staging.is_published(live)

    # ... and past the window it is reclaimed, parents swept
    manifest = os.path.join(live, "_sparkflow_manifest.json")
    os.utime(manifest, (past, past))
    s = staging.staging_vacuum(min_age_sec=3600)
    assert not os.path.exists(live) and s["removed_stale"] == 1
    assert not os.path.exists(os.path.dirname(live))  # empty digest dir

    # a corpus that VANISHED entirely -> undigestable, same age rule
    staging.stage_parquet(
        spark, "testvac", sf, ["events"], "counts", build, create=True
    )
    gone = staging.shared_path("testvac", sf, ["events"], "counts")
    shutil.rmtree(corpus)
    mf = os.path.join(gone, "_sparkflow_manifest.json")
    os.utime(mf, (past, past))
    s = staging.staging_vacuum(min_age_sec=3600)
    assert not os.path.exists(gone) and s["removed_undigestable"] == 1


def test_q3_serve_frame_matches_cold_topk(spark, sf_small):
    """maintenance_rollup_q3 (r12): the maintained top-10 serve frame
    read by limit_topk equals the cold 3-way shuffle plan row-for-row
    (integer revenue units → identical doubles), including the
    contract ordering; retracting the serve falls back cleanly."""
    from pyspark.sql import functions as F

    from sparkflow.catalog import table
    from sparkflow.oracle_compat import rev_sum
    from sparkflow.sources.io import _ROLLUP_TABLES

    staging.unpublish("rollup", sf_small, _ROLLUP_TABLES["q3"], "q3_serve")
    c = table(spark, sf_small, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_small, "orders")
    li = table(spark, sf_small, "lineitem")
    cold = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(rev_sum("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    ).collect()
    sparkflow.QUERIES["maintenance_rollup_q3"](spark, sf_small).collect()
    warm = sparkflow.QUERIES["limit_topk"](spark, sf_small).collect()
    assert [tuple(r) for r in warm] == [tuple(r) for r in cold]
    staging.unpublish("rollup", sf_small, _ROLLUP_TABLES["q3"], "q3_serve")
    assert len(sparkflow.QUERIES["limit_topk"](spark, sf_small).collect()) == 10

def test_mid_read_publish_never_tears(spark, sf_small, tmp_path):
    """r13 (r12 verdict item 9): a concurrent ingest publishing while a
    reader holds the current artifact must never serve a torn frame.
    Three guarantees, each pinned:

    1. a writer MID-BUILD is invisible — its scratch (data files, no
       manifest, not renamed) makes the read-only probe miss cleanly;
    2. an ingest that mutates the corpus publishes under a NEW digest
       address — the open reader's resolved frame is untouched and
       collects identical rows after the publish;
    3. the superseded artifact survives the age-guarded vacuum inside
       the open-reader window and is reclaimed after it."""
    import pandas as pd

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    for t in sparkflow.catalog.TABLES:
        shutil.copyfile(
            os.path.join(sf_small, f"{t}.parquet"), corpus / f"{t}.parquet"
        )
    sf = str(corpus)
    from sparkflow.catalog import table as _table

    def build():
        return _table(spark, sf, "events").groupBy("event_type").count()

    # (1) mid-build: scratch with data but no manifest/rename -> miss
    final = staging.shared_path("race", sf, ("events",), "counts")
    scratch = staging.scratch_path(final, "torn-writer")
    build().write.mode("overwrite").parquet(scratch)
    assert not staging.is_published(final)
    assert staging.stage_parquet(
        spark, "race", sf, ("events",), "counts", build, create=False
    ) is None
    shutil.rmtree(scratch)

    # publish for real; resolve an open reader
    staging.stage_parquet(
        spark, "race", sf, ("events",), "counts", build, create=True
    )
    reader = staging.stage_parquet(
        spark, "race", sf, ("events",), "counts", build, create=False
    )
    before = reader.toPandas().sort_values("event_type").reset_index(drop=True)
    assert len(before) > 0

    # (2) concurrent ingest: corpus mutates (append-style mtime bump),
    # the ingest session publishes under the NEW digest
    old_final = final
    os.utime(corpus / "events.parquet")
    new_final = staging.shared_path("race", sf, ("events",), "counts")
    assert new_final != old_final
    staging.stage_parquet(
        spark, "race", sf, ("events",), "counts", build, create=True
    )
    assert staging.is_published(new_final)

    # (3) age-guarded vacuum keeps the superseded artifact inside the
    # open-reader window...
    staging.staging_vacuum(min_age_sec=3600)
    assert staging.is_published(old_final)
    # ...and the open reader still collects the identical, un-torn frame
    after = reader.toPandas().sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)
    # window over (reader gone): the orphan is reclaimed, the live
    # (new-digest) artifact is kept at any age
    staging.staging_vacuum(min_age_sec=0)
    assert not os.path.exists(old_final)
    assert staging.is_published(new_final)
    shutil.rmtree(new_final, ignore_errors=True)


def test_maintenance_vacuum_sweeps_staging_root(spark, sf_small, tmp_path):
    """r13 (r12 verdict item 9): the registered maintenance_vacuum key
    also garbage-collects the shared staging root — a backdated orphan
    (its corpus deleted, manifest older than the 1-hour window) is
    reclaimed by running THE KEY, while a live artifact for an intact
    corpus survives, and the key's own output stays non-empty."""
    # live artifact on a private corpus copy
    corpus = tmp_path / "live_corpus"
    corpus.mkdir()
    for t in sparkflow.catalog.TABLES:
        shutil.copyfile(
            os.path.join(sf_small, f"{t}.parquet"), corpus / f"{t}.parquet"
        )
    sf = str(corpus)
    from sparkflow.catalog import table as _table

    live = staging.stage_parquet(
        spark, "mvkind", sf, ("events",), "live", lambda: _table(
            spark, sf, "events").groupBy("event_type").count(),
        create=True,
    )
    assert live is not None
    live_path = staging.shared_path("mvkind", sf, ("events",), "live")

    # orphan artifact whose corpus is then deleted; manifest backdated
    # beyond the open-reader window
    gone = tmp_path / "gone_corpus"
    gone.mkdir()
    shutil.copyfile(
        os.path.join(sf_small, "events.parquet"), gone / "events.parquet"
    )
    orphan_path = staging.shared_path("mvkind", str(gone), ("events",), "dead")
    staging.stage_parquet(
        spark, "mvkind", str(gone), ("events",), "dead", lambda: _table(
            spark, str(gone), "events").groupBy("event_type").count(),
        create=True,
    )
    shutil.rmtree(gone)
    old = 4000.0
    import time

    manifest = os.path.join(orphan_path, "_sparkflow_manifest.json")
    os.utime(manifest, (time.time() - old, time.time() - old))

    out = sparkflow.QUERIES["maintenance_vacuum"](spark, sf_small).collect()
    assert len(out) > 0
    assert not os.path.exists(orphan_path), "orphan survived the sweep"
    assert staging.is_published(live_path), "live artifact was reclaimed"
    shutil.rmtree(live_path, ignore_errors=True)


def test_staging_vacuum_keeps_unverifiable_source(
        spark, sf_small, tmp_path, monkeypatch):
    """r13 + r14 advice, composed: a TRANSIENT I/O failure digesting a
    still-present source corpus (unmounted volume, permission hiccup)
    must NOT class a live warm artifact as garbage — kept_unverifiable,
    any age, re-checked next sweep. But the DETERMINISTIC
    FileNotFoundError corpus_digest raises when the corpus dir exists
    with its table files permanently deleted ('no data files') is
    permanently unresolvable — keeping those forever is a disk leak, so
    they sweep as undigestable past the age window (r14 advice)."""
    corpus = tmp_path / "corpus_unv"
    corpus.mkdir()
    shutil.copy(
        os.path.join(sf_small, "events.parquet"),
        corpus / "events.parquet",
    )
    sf = str(corpus)

    def build():
        return (
            spark.read.parquet(os.path.join(sf, "events.parquet"))
            .groupBy("event_type").count()
        )

    staging.stage_parquet(
        spark, "testunv", sf, ["events"], "counts", build, create=True
    )
    live = staging.shared_path("testunv", sf, ["events"], "counts")
    assert staging.is_published(live)

    # transient failure: source dir present, digest raises a
    # non-FileNotFoundError OSError -> kept, any age
    mf = os.path.join(live, "_sparkflow_manifest.json")
    past = os.path.getmtime(mf) - 7200
    os.utime(mf, (past, past))
    real_digest = staging.corpus_digest

    def flaky_digest(sf_dir, tables):
        if os.path.abspath(sf_dir) == os.path.abspath(sf):
            raise OSError(5, "I/O error")
        return real_digest(sf_dir, tables)

    monkeypatch.setattr(staging, "corpus_digest", flaky_digest)
    s = staging.staging_vacuum(min_age_sec=3600)
    assert staging.is_published(live)
    assert s.get("kept_unverifiable", 0) == 1

    # stat RACE (r15 advice): a concurrent corpus rewrite deletes a
    # listed file between listing and stat — corpus_digest raises a
    # plain FileNotFoundError that is NOT CorpusEmptyError. The source
    # dir exists, so the artifact must be kept unverifiable (the old
    # blanket FileNotFoundError handler deleted it as undigestable).
    def racy_digest(sf_dir, tables):
        if os.path.abspath(sf_dir) == os.path.abspath(sf):
            raise FileNotFoundError(2, "raced stat", "events.parquet")
        return real_digest(sf_dir, tables)

    monkeypatch.setattr(staging, "corpus_digest", racy_digest)
    os.utime(mf, (past, past))
    s = staging.staging_vacuum(min_age_sec=3600)
    assert staging.is_published(live)
    assert s.get("kept_unverifiable", 0) == 1
    monkeypatch.setattr(staging, "corpus_digest", real_digest)

    # permanent no-data-files: dir exists, table files deleted ->
    # corpus_digest's deterministic FileNotFoundError -> undigestable,
    # swept once past the age window (NOT kept forever)
    os.remove(corpus / "events.parquet")
    os.utime(mf, (past, past))
    s = staging.staging_vacuum(min_age_sec=3600)
    assert not os.path.exists(live)
    assert s["removed_undigestable"] >= 1


def test_staging_vacuum_stale_digest_sweeps(spark, sf_small, tmp_path):
    """A source that digests SUCCESSFULLY to a different address is the
    ordinary stale case: swept past the window (split out of the
    unverifiable test when r14 advice tightened no-data-files)."""
    corpus = tmp_path / "corpus_stale"
    corpus.mkdir()
    shutil.copy(
        os.path.join(sf_small, "events.parquet"),
        corpus / "events.parquet",
    )
    sf = str(corpus)

    def build():
        return (
            spark.read.parquet(os.path.join(sf, "events.parquet"))
            .groupBy("event_type").count()
        )

    staging.stage_parquet(
        spark, "teststale", sf, ["events"], "counts", build, create=True
    )
    live = staging.shared_path("teststale", sf, ["events"], "counts")
    assert staging.is_published(live)

    # rewrite the source file -> mtime bump -> different digest
    shutil.copy(
        os.path.join(sf_small, "events.parquet"),
        corpus / "events.parquet",
    )
    mf = os.path.join(live, "_sparkflow_manifest.json")
    past = os.path.getmtime(mf) - 7200
    os.utime(mf, (past, past))
    s = staging.staging_vacuum(min_age_sec=3600)
    assert not os.path.exists(live)
    assert s["removed_stale"] >= 1
