"""General CEP pattern combinator (SURVEY §2.9) — the FlinkCEP
`Pattern.begin(...).next(...).followedBy(...).notFollowedBy(...)
.times(n).within(t)` surface compiled to the engine's carried-window
algebra, so a user can point a NEW pattern at any keyed event frame
without writing window algebra by hand (r10 verdict item 2: the one
reference-side capability that was demonstrated by three hardcoded
rungs — stream_cep_funnel / _negation / _times — but not productized).

How the compiler works
----------------------
FlinkCEP executes patterns with an NFA; this compiler instead exploits
a greedy-dominance property that makes the most-used pattern class
NFA-free and LINEAR per key (one sort, one Window stage chain — the
same shape as the hand-written rungs, viable at 100 TB where a
per-event NFA state machine is not):

For a chain of POSITIVE steps p1 → p2 → ... → pm under a whole-pattern
`within(T)` bound, define the carried value

    h_i(row) = start-timestamp of the LATEST-starting chain matching
               steps 1..i and ending strictly before `row`

computed as h_1 = ts on p1-rows, and h_i = (p_i-row ? carry(h_{i-1}))
where carry is MAX over ROWS UNBOUNDED PRECEDING..1 PRECEDING for a
relaxed transition (`followed_by`) or LAG(1) for a strict one
(`next`). Maximizing the start timestamp is OPTIMAL: the chain's span
`ts_m - ts_1` is minimized by the latest feasible start, so the
max-start chain satisfies `within` iff ANY chain does — existence
detection is exact without enumerating chains. `times(n)` expands to n
copies of the step (relaxed internal contiguity, FlinkCEP's default;
`consecutive=True` gives FlinkCEP's `.consecutive()` strict form), and
the carry consumes strictly-earlier rows only, so each copy binds a
DISTINCT event.

`not_followed_by` is supported in TERMINAL position with a `within`
horizon — exactly the form FlinkCEP itself requires a time window for
(a pattern may not END in notFollowedBy without one). The negation
compiles to one forward-looking window (earliest negated event after
the match row); the match survives iff that event is absent or beyond
`last_ts + T`. Mid-pattern negation is deliberately NOT offered: under
a mid negation the greedy max-start chain is no longer dominant (a
killed late-start chain can coexist with a surviving early-start one),
so exactness would require carrying a Pareto frontier — the NFA. The
builder raises at construction time rather than silently mis-matching.

Semantics summary (documented contract, what the oracle checks):
- match rows = events satisfying the LAST positive step's predicate
  for which a chain of distinct, strictly-ordered earlier events
  matches the previous steps under the declared contiguities;
- `within(T)`: chain span `match_ts - start_ts <= T` (whole-pattern
  bound, FlinkCEP's `within`);
- terminal `not_followed_by(q, within=T)`: no q-event in
  `(match_ts, match_ts + T]`.

Output schema: `(key, match_id, match_ts, start_ts[, next_<neg>_ts])`
— ids/timestamps of the match row plus the chain-start timestamp (the
carried value), and for negation patterns the earliest following
negated event's timestamp (NULL if none), so callers can audit the
negation decision. Streaming: the compiled plan is window algebra over
event time, so its batch-analog semantics equal the NFA's on bounded
event-time data (SURVEY §2.9 analog strategy); the three hand rungs'
TRUE streaming twins in streaming/stateful.py remain the
unbounded-execution evidence.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

_UNITS_US = {
    "hour": 3600 * 1_000_000,
    "hours": 3600 * 1_000_000,
    "minute": 60 * 1_000_000,
    "minutes": 60 * 1_000_000,
    "second": 1_000_000,
    "seconds": 1_000_000,
    "day": 86400 * 1_000_000,
    "days": 86400 * 1_000_000,
}


def _duration_us(d) -> int:
    """'24 hours' / '30 minutes' / numeric seconds → microseconds."""
    if isinstance(d, (int, float)):
        return int(d * 1_000_000)
    n, unit = d.strip().split()
    try:
        return int(n) * _UNITS_US[unit.lower()]
    except KeyError:
        raise ValueError(f"unsupported duration unit {unit!r}") from None


@dataclass(frozen=True)
class _Step:
    name: str
    pred: object  # pyspark Column (untyped: Column isn't importable cheaply)
    contiguity: str  # 'begin' | 'followed_by' | 'next'
    times: int = 1
    consecutive: bool = False  # internal contiguity of the times-expansion
    etype: str | None = None  # set when the predicate is an event_type
    # equality — the declarative form the STREAMING compiler needs
    # (arbitrary Columns can't be evaluated row-at-a-time in keyed state)
    optional: bool = False  # FlinkCEP .optional(): annotates, never gates
    # (see CepPattern.optional for why that is the exact semantics here)


@dataclass(frozen=True)
class CepPattern:
    """Immutable builder — every combinator returns a NEW pattern, so a
    prefix can be shared and extended into several patterns safely."""

    steps: tuple = field(default_factory=tuple)
    neg: object = None  # (name, pred) terminal negation
    neg_within_us: int | None = None
    within_us: int | None = None

    # -- builders ---------------------------------------------------
    # Each takes EITHER an arbitrary pyspark Column predicate OR
    # `etype="view"` (event-type equality). The etype form additionally
    # enables compile_stream (the O(1)-state streaming twin needs a
    # row-evaluable predicate, not a Column).
    @staticmethod
    def _resolve(name, pred, etype):
        if pred is None:
            if etype is None:
                raise ValueError(f"step {name!r} needs pred or etype")
            pred = F.col("event_type") == etype
        return pred

    @classmethod
    def begin(cls, name: str, pred=None, etype: str | None = None) -> "CepPattern":
        return cls(steps=(
            _Step(name, cls._resolve(name, pred, etype), "begin",
                  etype=etype),))

    def followed_by(self, name: str, pred=None,
                    etype: str | None = None) -> "CepPattern":
        """Relaxed contiguity (FlinkCEP followedBy): other events may
        sit between the previous step's event and this one."""
        self._check_open(name)
        return replace(
            self,
            steps=self.steps + (_Step(
                name, self._resolve(name, pred, etype), "followed_by",
                etype=etype),),
        )

    def next(self, name: str, pred=None,
             etype: str | None = None) -> "CepPattern":
        """Strict contiguity (FlinkCEP next): this step's event must be
        the IMMEDIATELY following event of the key."""
        self._check_open(name)
        return replace(
            self,
            steps=self.steps + (_Step(
                name, self._resolve(name, pred, etype), "next",
                etype=etype),),
        )

    def times(self, n: int, consecutive: bool = False) -> "CepPattern":
        """The last step must occur n times (FlinkCEP times(n); relaxed
        internal contiguity by default, consecutive=True for FlinkCEP's
        .consecutive() strict form)."""
        if not self.steps:
            raise ValueError("times() requires a begin() step first")
        if self.neg is not None:
            raise ValueError("times() cannot quantify a notFollowedBy step")
        if n < 1:
            raise ValueError("times(n) requires n >= 1")
        last = self.steps[-1]
        return replace(
            self,
            steps=self.steps[:-1]
            + (replace(last, times=n, consecutive=consecutive),),
        )

    def optional(self) -> "CepPattern":
        """FlinkCEP `.optional()` on the last step — with the match
        semantics this compiler documents (emit at the last step's row,
        report the greedy max-start chain), an optional step can NEVER
        gate or move the match: the variant that skips it is strictly
        less constrained, so it matches whenever the including variant
        does and its max start dominates. Exactly like FlinkCEP — which
        emits BOTH branch matches — the information is which branches
        matched, so here the optional step ANNOTATES: the output gains
        a `with_<name>` boolean per optional step, true iff a chain
        INCLUDING that step (and every required step) also satisfies
        the pattern within its window. One extra carry chain per
        optional step (k+1 chains total, not 2^k: other optional steps
        can only hurt a variant, so each flag's best witness excludes
        them)."""
        if not self.steps:
            raise ValueError("optional() requires a begin() step first")
        if self.neg is not None:
            raise ValueError("optional() cannot apply to notFollowedBy")
        return replace(
            self,
            steps=self.steps[:-1] + (replace(self.steps[-1], optional=True),),
        )

    def one_or_more(self) -> "CepPattern":
        """FlinkCEP `oneOrMore()` — the existence-collapse theorem: under
        relaxed contiguity and emit-at-last-step semantics, requiring
        "at least n occurrences" of a step is equivalent to requiring
        EXACTLY n, because extra occurrences are just intervening events
        that followedBy already ignores (a chain using n of the N
        available occurrences is a witness either way). So
        A.followedBy(B).oneOrMore().followedBy(C) ≡ A→B→C, and
        times(n..m) ranges collapse to times(n). This method documents
        the theorem in the API instead of making callers derive it; the
        equivalence is pinned by brute force in pytest. (FlinkCEP emits
        one match PER repetition count — a multiplicity this engine's
        one-row-per-match-row contract deliberately folds.)"""
        if not self.steps:
            raise ValueError("one_or_more() requires a begin() step first")
        return self  # ≡ times(1): see the theorem above

    def not_followed_by(self, name: str, pred, within) -> "CepPattern":
        """TERMINAL negation (FlinkCEP notFollowedBy — which FlinkCEP
        itself only allows at the end of a pattern when a time window
        is declared): the match is dropped if a `pred` event occurs in
        (match_ts, match_ts + within]. Mid-pattern negation is not
        offered — the greedy carried-max chain is not dominant under a
        mid negation (exactness would need an NFA's Pareto frontier),
        and a combinator that silently approximated would be worse than
        one that refuses."""
        self._check_open(name)
        return replace(
            self, neg=(name, pred), neg_within_us=_duration_us(within)
        )

    def within(self, duration) -> "CepPattern":
        """Whole-pattern time bound (FlinkCEP within): the chain's span
        from first to last matched event must be <= duration."""
        return replace(self, within_us=_duration_us(duration))

    @staticmethod
    def _event_expansion(steps) -> list:
        """times-expanded [(event_type, transition)] for one chain —
        the declarative form the streaming compiler consumes. Requires
        every step declared via `etype`."""
        out = []
        for s in steps:
            if s.etype is None:
                raise ValueError(
                    f"step {s.name!r} was built from a Column predicate —"
                    " declare it with etype=... to compile for streaming"
                )
            inner = "next" if s.consecutive else "followed_by"
            for k in range(s.times):
                out.append((s.etype, s.contiguity if k == 0 else inner))
        return out

    def stream_chains(self) -> tuple:
        """(main_chain, [(flag_name, variant_chain), ...]) — the same
        chain set the batch compiler builds (required steps gate; one
        variant per optional step annotates), each times-expanded to
        [(event_type, transition)]. No negation (the forward-looking
        negation window is future-dependent; its streaming form is the
        watermarked outer interval join, see
        stateful.cep_negation_stream)."""
        if self.neg is not None:
            raise ValueError(
                "streaming compile covers positive patterns — negation "
                "streams via the watermarked interval-join twin"
            )
        if self.steps and self.steps[-1].optional:
            raise ValueError(
                "the final step cannot be optional — it anchors the "
                "match row"
            )
        required = [s for s in self.steps if not s.optional]
        main = self._event_expansion(required)
        variants = []
        for o in (s for s in self.steps if s.optional):
            chain = [s for s in self.steps if not s.optional or s is o]
            variants.append((f"with_{o.name}", self._event_expansion(chain)))
        return main, variants

    def expanded_event_steps(self) -> list:
        """The gating (required-step) chain as [(event_type,
        transition)] — see stream_chains for the full set including
        optional-step annotation variants."""
        return self.stream_chains()[0]

    def compile_stream(self, spark, files_dir: str, sf_dir: str):
        """TRUE-STREAMING compile (readStream + applyInPandasWithState):
        the carry chains are literally a per-key state machine — per
        chain, state = the m-1 running-max carries plus the m-1
        previous-row hits (for strict transitions), O(1) per key
        regardless of stream length — so the same declarative pattern
        runs unbounded with bounded state, Flink's CEP-on-keyed-state
        shape. Optional steps stream too: their annotation chains ride
        in the same state tuple and emit the same `with_<name>` flags
        as the batch compile. Output timestamps in epoch µs (the
        stateful-twin convention). Bit-equality with the batch compile
        is pinned by pytest across micro-batch boundaries."""
        from . import stateful

        main, variants = self.stream_chains()
        return stateful.cep_compiled_stream(
            spark, files_dir, sf_dir, main, self.within_us,
            flag_variants=variants,
        )

    def _check_open(self, name: str) -> None:
        if not self.steps:
            raise ValueError(f"begin() must come before step {name!r}")
        if self.neg is not None:
            raise ValueError(
                "notFollowedBy is terminal — no step may follow it "
                "(FlinkCEP imposes the same restriction)"
            )

    # -- compiler ---------------------------------------------------
    def compile(
        self,
        df: DataFrame,
        key: str = "user_id",
        ts: str = "ts",
        tiebreak: str = "event_id",
    ) -> DataFrame:
        """Compile onto `df`, keyed by `key`, event-ordered by
        (`ts`, `tiebreak`). Returns the match frame (one row per match
        of the last positive step): (key, match_id, match_ts, start_ts
        [, next_<neg>_ts]). Linear per key: one hash exchange on the
        key, one sort, then a chain of Window operators over the SAME
        (partition, order) — no self-joins, no NFA state."""
        if not self.steps:
            raise ValueError("empty pattern")
        if self.neg is not None and self.neg_within_us is None:
            raise ValueError("notFollowedBy requires a within horizon")
        if self.steps[-1].optional:
            raise ValueError(
                "the final step cannot be optional — it anchors the "
                "match row"
            )
        required = [s for s in self.steps if not s.optional]
        order = [F.col(ts), F.col(tiebreak)]
        w_order = Window.partitionBy(key).orderBy(*order)
        w_prev = w_order.rowsBetween(Window.unboundedPreceding, -1)

        def build_chain(cur, steps, prefix):
            """Materialize one hit/carry chain; expand times(n) into n
            single-occurrence transitions — the carry consumes strictly-
            earlier rows, so copies bind distinct events (relaxed → MAX
            over ub..-1, consecutive → LAG(1)). Returns (df, final
            hit-column name)."""
            expanded: list[tuple] = []  # (pred, transition)
            for s in steps:
                inner = "next" if s.consecutive else "followed_by"
                for k in range(s.times):
                    expanded.append(
                        (s.pred, s.contiguity if k == 0 else inner)
                    )
            prev_col = None
            for i, (pred, trans) in enumerate(expanded):
                if i == 0:
                    hit = F.when(pred, F.col(ts))
                else:
                    carry = (
                        F.max(F.col(prev_col)).over(w_prev)
                        if trans == "followed_by"
                        else F.lag(F.col(prev_col), 1).over(w_order)
                    )
                    hit = F.when(pred, carry)
                prev_col = f"{prefix}{i}"
                cur = cur.withColumn(prev_col, hit)
            return cur, prev_col

        def within_ok(col):
            if self.within_us is None:
                return F.col(col).isNotNull()
            return F.col(col).isNotNull() & (
                F.unix_micros(F.col(ts)) - F.unix_micros(F.col(col))
                <= self.within_us
            )

        # main chain (required steps) gates the match; one extra chain
        # per optional step computes its annotation flag
        cur, prev_col = build_chain(df, required, "_cep_h")
        flags = []
        for j, o in enumerate(s for s in self.steps if s.optional):
            variant = [s for s in self.steps if not s.optional or s is o]
            cur, vcol = build_chain(cur, variant, f"_cep_v{j}_h")
            flags.append(within_ok(vcol).alias(f"with_{o.name}"))

        match = within_ok(prev_col)

        out_cols = [
            F.col(key),
            F.col(tiebreak).alias("match_id"),
            F.col(ts).alias("match_ts"),
            F.col(prev_col).alias("start_ts"),
            *flags,
        ]
        if self.neg is not None:
            neg_name, neg_pred = self.neg
            w_next = w_order.rowsBetween(1, Window.unboundedFollowing)
            neg_col = f"next_{neg_name}_ts"
            cur = cur.withColumn(
                neg_col, F.min(F.when(neg_pred, F.col(ts))).over(w_next)
            )
            match = match & (
                F.col(neg_col).isNull()
                | (
                    F.unix_micros(neg_col) - F.unix_micros(F.col(ts))
                    > self.neg_within_us
                )
            )
            out_cols.append(F.col(neg_col))
        return cur.filter(match).select(*out_cols)


# One registered key proving the compiler end-to-end against an exact
# oracle on a pattern NONE of the hand rungs implement (4 steps with a
# times(2) quantifier); the three hand rungs' equivalence to their
# compiled forms is pinned by pytest (tests/test_cep_compile.py).
_CEP_CARRY = """MAX({src}) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"""


@register(
    "stream_cep_compile",
    oracle=f"""
    WITH s0 AS (
      SELECT user_id, event_id, event_type, ts,
             CASE WHEN event_type = 'view' THEN ts END AS h0
      FROM events
    ), s1 AS (
      SELECT *, CASE WHEN event_type = 'click'
                     THEN {_CEP_CARRY.format(src='h0')} END AS h1
      FROM s0
    ), s2 AS (
      SELECT *, CASE WHEN event_type = 'click'
                     THEN {_CEP_CARRY.format(src='h1')} END AS h2
      FROM s1
    ), s3 AS (
      SELECT *, CASE WHEN event_type = 'purchase'
                     THEN {_CEP_CARRY.format(src='h2')} END AS h3
      FROM s2
    )
    SELECT user_id, event_id AS match_id, ts AS match_ts, h3 AS start_ts
    FROM s3
    WHERE h3 IS NOT NULL
      AND epoch_us(ts) - epoch_us(h3) <= 172800000000::BIGINT
    """,
)
def stream_cep_compile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The combinator driving a pattern no hand rung implements:
    `begin(view).followedBy(click).times(2).followedBy(purchase)
    .within(48h)` — view, then two distinct clicks, then purchase, all
    by one user inside 48 hours (48h because the testdata's ~10h
    per-user event spacing makes a 4-event chain span ~30h). The oracle
    unrolls the SAME carried-window algebra in SQL — each CTE is one
    carry step — so the compiler's greedy-dominance semantics are
    checked bit-exact, not just row-counted."""
    pat = (
        CepPattern.begin("view", etype="view")
        .followed_by("click", etype="click")
        .times(2)
        .followed_by("purchase", etype="purchase")
        .within("48 hours")
    )
    return pat.compile(
        table(spark, sf_dir, "events"),
        key="user_id",
        ts="ts",
        tiebreak="event_id",
    )


@register(
    "stream_cep_optional",
    oracle=f"""
    WITH s0 AS (
      SELECT user_id, event_id, event_type, ts,
             CASE WHEN event_type = 'view' THEN ts END AS h0
      FROM events
    ), m1 AS (
      SELECT *, CASE WHEN event_type = 'purchase'
                     THEN {_CEP_CARRY.format(src='h0')} END AS hm
      FROM s0
    ), v1 AS (
      SELECT *, CASE WHEN event_type = 'click'
                     THEN {_CEP_CARRY.format(src='h0')} END AS hv1
      FROM m1
    ), v2 AS (
      SELECT *, CASE WHEN event_type = 'purchase'
                     THEN {_CEP_CARRY.format(src='hv1')} END AS hv2
      FROM v1
    )
    SELECT user_id, event_id AS match_id, ts AS match_ts, hm AS start_ts,
           (hv2 IS NOT NULL
            AND epoch_us(ts) - epoch_us(hv2) <= 129600000000::BIGINT)
             AS with_click
    FROM v2
    WHERE hm IS NOT NULL
      AND epoch_us(ts) - epoch_us(hm) <= 129600000000::BIGINT
    """,
)
def stream_cep_optional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The combinator's optional-step surface: `begin(view)
    .followedBy(click).optional().followedBy(purchase).within(36h)` —
    every view→purchase pair within 36 hours, ANNOTATED with whether a
    click-including funnel also completed in the window (`with_click`).
    This is the conversion-attribution split every funnel analyst asks
    for next (assisted vs direct purchases), and it exercises the
    annotation semantics `optional()` documents: the flag chain can
    never gate or move the match (the skip variant dominates under
    greedy max-start), so the compiler runs k+1 carry chains — one
    gating, one per optional step. The oracle unrolls BOTH chains in
    SQL (m* = gating, v* = click variant) and recomputes the flag
    expression bit-exactly."""
    pat = (
        CepPattern.begin("view", etype="view")
        .followed_by("click", etype="click")
        .optional()
        .followed_by("purchase", etype="purchase")
        .within("36 hours")
    )
    return pat.compile(
        table(spark, sf_dir, "events"),
        key="user_id",
        ts="ts",
        tiebreak="event_id",
    )
