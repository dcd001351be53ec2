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
from .streaming import cep  # noqa: F401  (§2.9 CEP pattern combinator, r11)
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

# Keys whose DRIVER CONTRACT changed since their last attestation — an
# oracle was added (no_oracle -> EXACT) or the registered semantics were
# deliberately redefined. The mechanical code-stale rotation below cannot
# distinguish these from collateral staleness (module granularity stales
# ~20 sibling keys per edit, and its oldest-attested-first budget order
# pushes RECENTLY-attested-but-deliberately-changed keys to the back,
# past the driver's ~50-key prefix — observed in r8: the five graduated
# keys landed at positions 35-166). Maps key -> the round DURING which
# the contract changed; the entry is SPENT (ignored, safe to delete)
# once an artifact from a round >= that round attests the key — the new
# contract's row has landed. Round-9 redesign (r8 verdict "What's
# wrong" #1): the old list form had no spent rule, so after the driver
# attested the listed keys their fronting outlived its purpose and
# broke the stale-before-fresh / round-ordering meta-tests for the
# whole window until the next manual edit.
_CONTRACT_CHANGED: dict = {
    # All pre-r15 entries are SPENT (every listed key's newest
    # CORRECTNESS_r*.json row is >= its listed round: the r14
    # evidence-refresh cohort attested in r14, fn_json r14,
    # join_multiway_star r12, agg_hash_group/agg_distinct r11) and
    # deleted per the spent rule above.
    #
    # The r14 plan-rewrite pair and the r15 evidence-refresh cohort all
    # attested in r15 (>= their listed rounds) — spent, deleted.
    #
    # r16 (r15 verdict item 4): EVIDENCE REFRESH for the r10 cohort —
    # these 26 keys' newest driver evidence dates to r10, the oldest
    # left on the board (all judge-verified EXACT in r15, so risk is
    # low; this rotates the driver's own artifact evidence). Derived
    # from the committed CORRECTNESS_r*.json artifacts: every key whose
    # newest green row is r10.
    "agg_arg_extremes": 16,
    "agg_bitmap_distinct": 16,
    "agg_collect": 16,
    "agg_cube": 16,
    "agg_decimal_sum": 16,
    "agg_filtered": 16,
    "agg_global": 16,
    "agg_grouping_sets": 16,
    "agg_histogram": 16,
    "agg_misc": 16,
    "agg_mode": 16,
    "agg_observed_metrics": 16,
    "agg_percentile": 16,
    "agg_pivot": 16,
    "agg_rollup": 16,
    "agg_stats": 16,
    "agg_string_agg": 16,
    "agg_unpivot": 16,
    "join_asof_forward": 16,
    "join_bloom_filter": 16,
    "join_broadcast_nested_loop": 16,
    "join_null_safe": 16,
    "join_partition_pruned": 16,
    "llm_knn_ivf_kmeans": 16,
    "maintenance_table_optimize_zorder": 16,
    "maintenance_table_optimize_zorder_incremental": 16,
}


def _rotation_plan(last_round: dict, stale_set: set,
                   contract_changed: dict, keys) -> dict:
    """Pure segmentation of the registry order — THE single definition
    the rotation applies and the meta-tests assert against (they cannot
    drift from the implementation by re-deriving segment membership).

    Segments, in prefix order:
      unattested — no successful CORRECTNESS row ever; registration order.
      changed    — unspent _CONTRACT_CHANGED keys (attested, but only by
                   rounds OLDER than the listed change round): the next
                   artifact must record the new contract, so they jump
                   both staleness queues. Spent entries (last attestation
                   round >= listed round) fall through to stale/rest.
      stale      — attested keys whose implementing module has a commit
                   topologically >= their attesting artifact's commit,
                   least-recently-attested first.
      rest       — fresh-code attested keys, least-recently-attested
                   first (the bounded re-attestation budget).

    The realized registry order (`order`) is unattested + changed +
    ROUND-ROBIN INTERLEAVE of stale and rest (r10 verdict item 3): with
    strict segment concatenation, a code-stale backlog larger than the
    driver's ~50-key prefix STARVES the rest queue — 30 keys last
    attested in rounds <= 5 sat at positions 101-130 behind ~100
    module-touched keys, structurally invisible. Alternating the two
    queues guarantees BOTH aging signals drain every round: a prefix of
    P samples ~P/2 from each, so any key re-enters the harness within
    ~2·len(segment)/P rounds regardless of how lopsided the segments
    get."""
    seen = set(last_round)
    unattested = [k for k in keys if k not in seen]
    changed = [
        k for k, rnd in contract_changed.items()
        if k in seen and last_round[k] < rnd
    ]
    stale = [k for k in keys
             if k in stale_set and k in seen and k not in changed]
    rest = [k for k in keys
            if k in seen and k not in stale_set and k not in changed]
    # stable sorts: within the same round, current registration order
    stale.sort(key=lambda k: last_round[k])
    rest.sort(key=lambda k: last_round[k])
    woven = []
    for i in range(max(len(stale), len(rest))):
        if i < len(stale):
            woven.append(stale[i])
        if i < len(rest):
            woven.append(rest[i])
    return {"unattested": unattested, "changed": changed,
            "stale": stale, "rest": rest,
            "order": unattested + changed + woven}


def _rotate_never_attested() -> None:
    """Self-maintaining attestation rotation: front the keys that have no
    successful row in ANY committed CORRECTNESS_r*.json yet (driver
    artifact, one per round), THEN the keys whose implementing module has
    a commit NEWER than the artifact that last attested them (round-6
    verdict: the r06 sample and the r06 commit were disjoint — the only
    operators whose code changed were exactly the ones whose attestations
    predated the change; staleness must be code-aware, not just
    round-aged), INTERLEAVED round-robin with the remaining attested
    keys least-recently-attested first (r10 verdict item 3: a code-stale
    backlog bigger than the driver prefix must not starve the
    oldest-evidence queue). The woven tail is the re-attestation budget
    (round-3 advice): once the never-attested pool shrinks below the
    driver's ~50-key prefix, the prefix automatically tops up half from
    each queue, so a regression in an old operator re-enters the
    harness within a bounded number of rounds instead of becoming
    structurally invisible. A key whose only rows are errors OR hash
    mismatches stays unattested and is retried first.

    Determinism: the order is a pure function of the CORRECTNESS_r*.json
    artifacts PRESENT IN THE WORKING TREE plus committed git history
    (an uncommitted round artifact participates; uncommitted CODE does
    not — commit operator changes before relying on the rotation to
    front them); with no artifacts present (fresh pre-round-1 tree) the
    static priority above stands unchanged, and with git unavailable the
    code-stale segment is empty (pure round-age ordering)."""
    # one artifact parse: the attested set is exactly last_round's keys
    last_round = _last_attested_round()
    if not last_round:
        return
    # reuse this call's last_round instead of re-parsing the artifacts
    # (review r7): _code_stale_set() would re-derive it
    import os as _os

    _root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    stale_set = _code_stale_keys(
        registry.QUERIES, last_round, _git_last_change_times(_root), _root
    )
    plan = _rotation_plan(last_round, stale_set, _CONTRACT_CHANGED,
                          list(registry.QUERIES))
    registry.reorder(plan["order"])


def _git_last_change_times(root: str | None = None) -> dict:
    """repo-relative path -> TOPOLOGICAL recency rank (larger = newer)
    of the newest commit touching it, from one `git log --topo-order
    --name-only` walk (newest-first, so the first sighting of a path
    wins). Ranks, not commit timestamps (advice r7): %ct is not monotone
    with ancestry — a rebased/cherry-picked change carrying an older
    author clock than the attesting artifact's commit would be
    classified fresh and skip re-attestation. Topo order guarantees a
    descendant always outranks its ancestors; incomparable commits
    (parallel branches) resolve arbitrarily-but-conservatively within
    the coarse module-level staleness this feeds. {} when git is
    unavailable or errors — callers must degrade to round-age-only
    ordering, never raise at import time."""
    import os
    import subprocess

    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        out = subprocess.run(
            ["git", "-C", root, "log", "--topo-order",
             "--format=%x01", "--name-only"],
            capture_output=True, text=True, timeout=20,
        )
    except Exception:
        return {}
    if out.returncode != 0:
        return {}
    times: dict = {}
    rank = 0  # newest commit = 0, each older commit more negative
    for ln in out.stdout.splitlines():
        if ln.startswith("\x01"):
            rank -= 1
        elif ln:
            times.setdefault(ln, rank)
    return times


def _impl_relpath(fn, root: str) -> str | None:
    """Repo-relative source path (git-style forward slashes) of the
    module implementing a registered query callable."""
    import os
    import sys as _sys

    mod = _sys.modules.get(getattr(fn, "__module__", ""))
    path = getattr(mod, "__file__", None)
    if not path:
        return None
    try:
        rel = os.path.relpath(os.path.abspath(path), root)
    except ValueError:
        return None
    return rel.replace(os.sep, "/")


def _code_stale_keys(queries: dict, last_round: dict, file_times: dict,
                     root: str) -> set:
    """Attested keys whose implementing MODULE has a commit
    topologically newer than (or equal to) the commit of the
    CORRECTNESS artifact that last attested them. `file_times` maps
    path -> recency value where LARGER = NEWER — topo ranks from
    _git_last_change_times (not wall-clock timestamps, which rebases
    break). Module granularity is deliberately coarse-conservative: an
    unrelated change to a shared module re-fronts every key it
    implements (extra re-attestation, never a missed one).

    Round-boundary rule (r8 verdict): an attesting artifact that exists
    on disk but that git knows NOTHING about (the driver's just-written,
    untracked CORRECTNESS_r{N}.json) is BY CONSTRUCTION newer than any
    commit — uncommitted code does not participate in the rotation, so
    nothing can postdate it. Such keys are never stale, keeping the
    rotation meta-tests green in the window between a driver run and
    the next commit."""
    import os

    stale = set()
    for key, fn in queries.items():
        rnd = last_round.get(key)
        if rnd is None:
            continue
        art = f"CORRECTNESS_r{rnd:02d}.json"
        art_t = file_times.get(art)
        if art_t is None and os.path.exists(os.path.join(root, art)):
            continue  # untracked artifact = newest attestation: not stale
        rel = _impl_relpath(fn, root)
        code_t = file_times.get(rel) if rel else None
        # >= not >: if the module edit and the attesting artifact land in
        # ONE commit, the attested run predates the edit — flag stale
        # (review r7; '>' would reproduce the r06 invisibility this
        # mechanism exists to prevent)
        if art_t is not None and code_t is not None and code_t >= art_t:
            stale.add(key)
    return stale


def _code_stale_set(root: str | None = None) -> set:
    """The live code-stale set for the current tree (see _code_stale_keys)."""
    import os

    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return _code_stale_keys(
        registry.QUERIES, _last_attested_round(root),
        _git_last_change_times(root), root,
    )


def _successful_rows(root: str | None = None):
    """Yield (round_number, key, row_dict) for every SUCCESSFUL row in
    the committed CORRECTNESS_r*.json artifacts: hash-matched against
    the oracle, or completed a rows-only check (err == 'no_oracle' with
    a row count). A row that errored, or that RAN but mismatched
    (rows/hash False), is NOT yielded — those need re-attestation after
    the fix, so they stay in the front prefix. This is THE single
    definition of the attestation success rule — the rotation, its
    tests, and tools/reseed.py's degeneracy baseline all consume it."""
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
                yield rnd, key, row


def _attested_keys(root: str | None = None) -> set[str]:
    """Keys with at least one successful row in any committed
    CORRECTNESS_r*.json (see _successful_rows for the success rule)."""
    return {key for _, key, _row in _successful_rows(root)}


def _last_attested_round(root: str | None = None) -> dict:
    """key -> the LATEST round number whose artifact has a successful
    row for it. Drives the re-attestation ordering: smaller = staler =
    re-attested sooner."""
    last: dict = {}
    for rnd, key, _row in _successful_rows(root):
        if rnd > last.get(key, -1):
            last[key] = rnd
    return last


_rotate_never_attested()

QUERIES = registry.QUERIES
ORACLES = registry.ORACLES
