"""Event-sequence analytics over an events stream at rest: retention
cohorts and transition matrices — the behavioral reports an event
pipeline serves next to its windowed aggregates.

Scale shape: both operators reduce the raw event stream to narrow
keys before anything wide moves. Cohorts shuffle distinct
(user, day) pairs (partial-agg'd); transitions shuffle once on the
user id for the lag window and then aggregate a (type, type) matrix
that is tiny by construction (|event types|²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def retention_cohorts(
    df: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Classic retention cohort matrix: users are cohorted by their
    first active day; for each (cohort_day, offset_days) report how
    many of that cohort's users were active offset_days later. Emits
    ``(cohort_day, offset_days, n_users)``.

    Shape at scale: events collapse to DISTINCT (user, day) pairs
    first — partial-agg'd, so each partition emits at most
    users × days rows regardless of event volume. The cohort lookup
    is a self-aggregate joined back on the user id (same
    partitioning, AQE-reusable), and the final matrix groupBy
    produces cohorts × horizon rows — dashboard-sized."""
    days = df.select(
        F.col(user_col).alias("_u"), F.to_date(F.col(ts_col)).alias("_d")
    ).distinct()
    cohort = days.groupBy("_u").agg(F.min("_d").alias("cohort_day"))
    return (
        days.join(cohort, "_u")
        # (_u, _d) is distinct, so count(*) counts distinct users
        .groupBy(
            "cohort_day",
            F.datediff(F.col("_d"), F.col("cohort_day"))
            .cast("bigint")
            .alias("offset_days"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def transition_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-user event-type transition matrix (first-order Markov
    counts): for each consecutive pair of events in a user's timeline
    — ordered by (ts, tiebreak) so ties are deterministic — count
    ``prev_type -> event_type`` occurrences and the per-prev_type
    transition share in integer basis points. Emits
    ``(prev_type, next_type, n, p_bp)``.

    Shape at scale: ONE shuffle (lag window on the user id); the
    matrix groupBy and the per-row denominator window both run over
    |event types|² rows — negligible. No floats: p_bp is exact
    integer division, so the result hash-matches any engine."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), F.col(tiebreak_col)
    )
    pairs = (
        df.select(
            F.col(user_col),
            F.col(ts_col),
            F.col(tiebreak_col),
            F.col(type_col).alias("next_type"),
        )
        .withColumn("prev_type", F.lag("next_type").over(w))
        .filter(F.col("prev_type").isNotNull())
    )
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.expr("(n * 10000) div sum(n) over (partition by prev_type)").alias(
            "p_bp"
        ),
    )


__all__ = [
    "retention_cohorts",
    "transition_counts",
    "value_trend",
    "zscore_anomalies",
    "mad_outliers",
    "scd2_intervals",
    "cusum_shifts",
    "twap",
]


def value_trend(
    df: DataFrame,
    group_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    base_date: str = "2024-01-01",
) -> DataFrame:
    """Per-group OLS trend of a metric over time — the drift report an
    event pipeline serves next to its windowed aggregates ("is
    checkout value trending down this month?").

    Determinism: the five OLS sufficient statistics (n, Σx, Σy, Σxy,
    Σx²) are EXACT integers — x is whole days since ``base_date``, y
    is the metric in cents (DECIMAL(18,2)·100) — so the partial
    aggregation is shuffle-order-independent. The closed-form slope
    (n·Σxy − Σx·Σy) / (n·Σx² − Σx²) is evaluated as ONE IEEE double
    division of two exactly-computed DECIMAL(38,0) operands: both
    engines see identical operands, so the quotient is bit-identical.
    Groups with a degenerate x spread (denominator 0) are emitted with
    a NULL slope rather than dropped.

    Shape at scale: a single partial-agg'd groupBy — the shuffle
    carries |groups| rows of five bigint sums; nothing else moves.
    The bigint sums hold to ~10^14 rows per group at cent scale; past
    that, pre-demean x per group (two-pass) before summing."""
    x = F.datediff(F.col(ts_col).cast("date"), F.lit(base_date).cast("date")).cast(
        "bigint"
    )
    y = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    big = "decimal(38,0)"
    stats = (
        # NULL ts/value rows are excluded OUTRIGHT (not silently
        # counted in n while skipped by the sums, which would distort
        # the slope and differ between engines' COUNT semantics).
        df.filter(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .select(F.col(group_col), x.alias("_x"), y.alias("_y"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_x").alias("_sx"),
            F.sum("_y").alias("_sy"),
            F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
            F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        )
    )
    num = (
        F.col("n").cast(big) * F.col("_sxy").cast(big)
        - F.col("_sx").cast(big) * F.col("_sy").cast(big)
    )
    den = (
        F.col("n").cast(big) * F.col("_sxx").cast(big)
        - F.col("_sx").cast(big) * F.col("_sx").cast(big)
    )
    return stats.select(
        F.col(group_col),
        F.col("n").cast("bigint").alias("n"),
        F.when(den != 0, num.cast("double") / den.cast("double"))
        .otherwise(F.lit(None).cast("double"))
        .alias("slope_cents_per_day"),
    )


def zscore_anomalies(
    df: DataFrame,
    group_col: str,
    id_col: str = "event_id",
    value_col: str = "value",
    nsigma: int = 3,
) -> DataFrame:
    """Events whose metric deviates more than ``nsigma`` standard
    deviations from their group mean — the outlier report behind
    alerting and data-quality quarantine. NULL-valued events are
    excluded from both the statistics and the candidate rows (a NULL
    measurement is not a 0-cent measurement).

    Determinism: the z-test is pure integer algebra. With y in exact
    cents and per-group (n, Σy, Σy²), (y − μ)² > k²·σ² rewrites to
    (n·y − Σy)² > k²·(n·Σy² − Σy·Σy) — both sides exact
    DECIMAL(38,0), no square roots, no IEEE boundary to flip between
    engines. Holds to ~10^9 rows per group at cent scale (n·y ≤ 10^19
    squared inside 38 digits); past that, demean in micro-units first.

    Shape at scale: the (id, group, cents) projection is built once
    behind one uniform exchange; the stats branch partial-aggs it to
    |groups| rows which broadcast back onto the row branch — the
    events scan happens exactly once (ReusedExchange), and nothing
    wider than the projection ever shuffles."""
    big = "decimal(38,0)"
    # The isNotNull sits in the SHARED subtree: the broadcast join on
    # group_col infers isnotnull(group_col) onto the row branch, and if
    # the stats branch doesn't carry the identical filter the two
    # subtrees de-canonicalize and the events scan runs twice (q100's
    # ReusedExchange lesson; verified in test_plans).
    # The projection is deliberately NARROW — (id, group, cents) only,
    # no raw value column. The stats branch consumes (group, cents);
    # if the row branch carried an extra column, column pruning would
    # give the two branches different projections below the exchange
    # and de-canonicalize the diamond (observed: second full events
    # scan). The caller gets cents back; value = cents/100 exactly.
    s = (
        df.filter(F.col(group_col).isNotNull() & F.col(value_col).isNotNull())
        .select(
            F.col(id_col),
            F.col(group_col),
            (F.col(value_col).cast("decimal(18,2)") * 100).cast("long").alias("_y"),
        )
        .repartition(F.col(id_col))
    )
    stats = s.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
    )
    # Null-safe _y on purpose: the filter would otherwise infer
    # isnotnull(_y) onto the row branch only (same de-canonicalization).
    y_safe = F.coalesce(F.col("_y"), F.lit(0)).cast(big)
    d = F.col("_n").cast(big) * y_safe - F.col("_sy").cast(big)
    var_n2 = F.col("_n").cast(big) * F.col("_syy").cast(big) - F.col(
        "_sy"
    ).cast(big) * F.col("_sy").cast(big)
    return (
        s.join(F.broadcast(stats), group_col)
        .filter(d * d > F.lit(nsigma * nsigma) * var_n2)
        .select(id_col, group_col, F.col("_y").alias("value_cents"))
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    id_col: str = "event_id",
    value_col: str = "value",
    k: int = 3,
) -> DataFrame:
    """Robust outlier report: events whose metric deviates more than
    ``k`` MADs (median absolute deviations) from their group MEDIAN —
    the quarantine rule that, unlike the z-score (:func:`
    zscore_anomalies`), a few extreme values cannot drag.

    Determinism: both medians are exact SET-SELECTIONS, not
    interpolations — the smallest value whose cumulative count reaches
    half the group (lower median), chosen over per-group COUNT tables
    with integer 2·cum >= n tests; the final flag |y − med| > k·mad is
    pure bigint cents. No floats anywhere, so any engine reproduces
    the row set bit-for-bit.

    Shape at scale (r14 rewrite, measured): events aggregate ONCE into
    the bounded per-(group, cents) COUNT table and the deviation
    distribution is DERIVED from that same table (re-group its counts
    by |cents − med| — the q224 idiom) instead of re-scanning and
    re-aggregating the corpus rows; both medians then reduce
    count-table rows only. The old shape repartitioned the full rows
    up front and aggregated the corpus twice, and its diamond
    de-canonicalized besides (static plan: 8 scans, a full-row
    exchange, a second corpus-sized aggregation). Now: two pruned
    scans (counts branch and the row-emission branch — sharing them
    would force the full-row exchange back), zero corpus-row
    shuffles; the |groups|-row median/MAD maps broadcast onto the
    final scan. NULL values are excluded outright."""
    w = Window.partitionBy(group_col).orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy(group_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )

    def lower_median(counts: DataFrame, out_col: str) -> DataFrame:
        return (
            counts.select(
                group_col,
                "_v",
                F.sum("_c").over(w).alias("_cum"),
                F.sum("_c").over(w_all).alias("_n"),
            )
            .filter(2 * F.col("_cum") >= F.col("_n"))
            .groupBy(group_col)
            .agg(F.min("_v").alias(out_col))
        )

    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    base = df.filter(
        F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
    )
    c1 = base.select(F.col(group_col), cents.alias("_v")).groupBy(
        group_col, "_v"
    ).agg(F.count(F.lit(1)).alias("_c"))
    med = lower_median(c1, "_med")
    # deviation counts from the VALUE count table, never the rows
    c2 = (
        c1.join(F.broadcast(med), group_col)
        .select(
            group_col,
            F.abs(F.col("_v") - F.col("_med")).alias("_v"),
            "_c",
        )
        .groupBy(group_col, "_v")
        .agg(F.sum("_c").alias("_c"))
    )
    mad = lower_median(c2, "_mad")
    rows = base.select(
        F.col(id_col), F.col(group_col), cents.alias("_y")
    )
    return (
        rows.join(F.broadcast(med), group_col)
        .join(F.broadcast(mad), group_col)
        .filter(F.abs(F.col("_y") - F.col("_med")) > F.lit(k) * F.col("_mad"))
        .select(id_col, group_col, F.col("_y").alias("value_cents"))
    )


def scd2_intervals(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """SCD Type-2 interval build (q141's operator form): collapse each
    key's timeline into runs of the same attribute value and emit
    validity intervals ``(user, type, valid_from, valid_to, n_events)``
    — ``valid_to`` NULL marks the current run. Gaps-and-islands: a
    change-flag lag window, a running-sum island id, a partial-agg'd
    run groupBy, and a closing lead window — all four stages share ONE
    hash exchange on the key (the (key, island) groupBy is co-located
    under hash(key)); every window orders by (ts, unique id)."""
    w_order = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = df.select(
        user_col,
        type_col,
        ts_col,
        id_col,
        F.when(
            F.lag(type_col).over(w_order).isNull()
            | (F.lag(type_col).over(w_order) != F.col(type_col)),
            1,
        )
        .otherwise(0)
        .alias("_chg"),
    )
    islands = flagged.withColumn("_isl", F.sum("_chg").over(w_cum))
    runs = islands.groupBy(user_col, "_isl").agg(
        F.min(type_col).alias(type_col),
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    w_next = Window.partitionBy(user_col).orderBy("_isl")
    return runs.select(
        user_col,
        type_col,
        "valid_from",
        F.lead("valid_from").over(w_next).alias("valid_to"),
        "n_events",
    )


def cusum_shifts(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    pct: int = 10,
) -> DataFrame:
    """CUSUM level-shift detection over a pre-aggregated integer
    series, exact and iteration-free. The textbook recursion
    ``C_t = max(0, C_{t-1} + dev_t)`` has the closed form
    ``C_t = S_t - min_{i<=t} S_i`` (prefix sum minus running
    minimum), so the whole detector is two ordered windows — no loop,
    no UDF. Deviations are scaled by the group's period count
    (``dev = x*N - T``) to stay in exact integers (no mean division);
    the final prefix sum is 0 by construction, a built-in sanity
    check. ``cusum_pos`` flags upward level shifts, ``cusum_neg``
    (running max minus S) downward ones; ``shift_flag`` fires when
    either exceeds ``pct``% of total volume — compared cross-
    multiplied (``cusum * 100 > T * N * pct``), zero floats anywhere.

    The input must be the BOUNDED per-(group, period) series table
    (one aggregation upstream), never row-level data: every window
    here partitions by group over that table."""
    wg = Window.partitionBy(group_col)
    wo = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    x = F.col(value_col)
    d = (
        df.withColumn("_n", F.count(F.lit(1)).over(wg))
        .withColumn("_t", F.sum(value_col).over(wg))
        .withColumn("_s", F.sum(x * F.col("_n") - F.col("_t")).over(wo))
    )
    # the recursion starts at C=0 BEFORE the first observation, so the
    # running extremum must include the virtual empty-prefix S_0 = 0
    # (least/greatest with 0) — without it the first rows under-report
    d = d.withColumn(
        "cusum_pos", F.col("_s") - F.least(F.min("_s").over(wo), F.lit(0))
    ).withColumn(
        "cusum_neg", F.greatest(F.max("_s").over(wo), F.lit(0)) - F.col("_s")
    )
    flag = (
        F.col("cusum_pos") * 100 > F.col("_t") * F.col("_n") * F.lit(pct)
    ) | (F.col("cusum_neg") * 100 > F.col("_t") * F.col("_n") * F.lit(pct))
    return d.withColumn("shift_flag", flag).drop("_n", "_t", "_s")


def twap(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """Time-weighted average of an integer ``value_col`` per group —
    the metrics/finance aggregation where each observation counts for
    how LONG it held, not how often it printed (a once-a-day sensor
    and a 1000-tick burst weigh by duration, unlike a plain mean).
    Each observation is weighted by the seconds until the group's next
    observation; the last one carries zero weight; the denominator is
    the group's observed span. Epoch seconds are ``epoch_us div 1e6``
    (truncation — the q152 rounding corollary, identical in both
    engines); duration in SECONDS keeps ``value * dur`` far from
    bigint overflow. Groups whose span is zero (single observation or
    all within one second) fall back to the plain truncating integer
    mean, flagged by ``degenerate``.

    Shape: one ordered lead window per group over (group, ts, id,
    value) rows, then a partial-agg'd rollup — the q141 family's
    single-shuffle discipline."""
    wo = Window.partitionBy(*group_cols).orderBy(ts_col, id_col)
    secs = (F.col(ts_col).cast("long"))  # timestamp->long truncates to s
    d = df.select(*group_cols, ts_col, id_col, value_col).withColumn(
        "_s", secs
    ).withColumn(
        "_dur", F.coalesce(F.lead("_s").over(wo) - F.col("_s"), F.lit(0))
    )
    agg = d.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.col(value_col) * F.col("_dur")).alias("_num"),
        (F.max("_s") - F.min("_s")).alias("span_s"),
        F.sum(value_col).alias("_sv"),
    )
    return agg.select(
        *group_cols,
        "n_obs",
        "span_s",
        F.when(F.col("span_s") > 0, F.expr("_num div span_s"))
        .otherwise(F.expr("_sv div n_obs"))
        .alias("twap"),
        (F.col("span_s") == 0).alias("degenerate"),
    )


def basket_lift(
    df: DataFrame,
    basket_cols: list[str],
    item_col: str,
) -> DataFrame:
    """Co-occurrence lift over arbitrary baskets: for every unordered
    item pair, ``lift_bp = n_ab * N * 10000 div (n_a * n_b)`` where N
    is the basket count and n_x the number of baskets containing x —
    the normalized association statistic behind q194 (user-day event
    baskets) and equally applicable to order/part baskets.

    ONE corpus shuffle: each basket contracts to its sorted distinct
    item-set (``collect_set`` subsumes the DISTINCT), pairs enumerate
    INSIDE the bounded array, and the basket count, marginals and
    pair counts all branch off that single aggregate (1 scan,
    consumers on ReusedExchange — the q194 plan contract). The ratio
    computes in DECIMAL(38,0) because ``n_ab * N * 1e4`` outgrows
    int64 once baskets pass ~1e7. Output:
    ``(item_a, item_b, n_ab, lift_bp)`` ordered by the pair."""
    baskets = df.groupBy(*basket_cols).agg(
        F.sort_array(F.collect_set(item_col)).alias("_items")
    )
    n = baskets.filter(F.size("_items") >= 1).agg(
        F.count(F.lit(1)).alias("_n")
    )
    marg = (
        baskets.select(F.explode("_items").alias("_item"))
        .groupBy("_item")
        .agg(F.count(F.lit(1)).alias("_nt"))
    )
    pair_expr = (
        "explode(flatten(transform(_items, (x, i) ->"
        " transform(slice(_items, i + 2, size(_items)),"
        " y -> struct(x AS item_a, y AS item_b)))))"
    )
    pairs = (
        baskets.select(F.expr(pair_expr).alias("p"))
        .select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    ma = F.broadcast(
        marg.select(F.col("_item").alias("item_a"), F.col("_nt").alias("_na"))
    )
    mb = F.broadcast(
        marg.select(F.col("_item").alias("item_b"), F.col("_nt").alias("_nb"))
    )
    return (
        pairs.join(ma, "item_a")
        .join(mb, "item_b")
        .crossJoin(F.broadcast(n))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            F.expr(
                "CAST(CAST(n_ab AS DECIMAL(38,0)) * _n * 10000"
                " div (CAST(_na AS DECIMAL(38,0)) * _nb) AS BIGINT)"
            ).alias("lift_bp"),
        )
        .orderBy("item_a", "item_b")
    )


def association_rules(
    df: DataFrame,
    basket_cols: list[str],
    item_col: str,
) -> DataFrame:
    """DIRECTIONAL association rules over arbitrary baskets — the
    classic market-basket mining triple for every ordered item pair
    (antecedent -> consequent), in exact integer basis points:

    - ``support_bp``    = n_ab * 10000 div N        (pair frequency)
    - ``confidence_bp`` = n_ab * 10000 div n_a      (P(b | a))
    - ``lift_bp``       = n_ab * N * 10000 div (n_a * n_b)

    The directional companion to :func:`basket_lift` (lift is
    symmetric; confidence is not — 'buyers of a also buy b' and the
    reverse differ exactly when the marginals differ, which is the
    actionable half of rule mining).

    Shape at scale (r14 rewrite, measured): ONE corpus shuffle (the
    basket contraction) and ONE explode. Each basket emits, from one
    generator expression, a (NULL, NULL) basket-counter row, a
    (item, NULL) marginal row per item, and one UNORDERED (a, b) row
    per in-array pair (n_ab is symmetric; directions expand above
    the aggregate, so only the bounded |items|² cell table doubles).
    Everything reduces through ONE (a, b, count) cell aggregate:
    antecedent marginals ride a per-``a`` window, the basket total a
    single-partition window (the bounded-table totals idiom — both
    windows also act as a pushdown barrier, so the consequent-slice
    filter and join inference cannot reach below the aggregate and
    re-run the explode; the old shape ran THREE explodes over the
    contraction), and the consequent marginal is a broadcast
    self-slice of the windowed cell table. DECIMAL(38,0) for the
    lift product (the q189/q194 idiom); everything non-negative so
    truncating division is engine-portable. Output ordered by
    (antecedent, consequent)."""
    baskets = df.groupBy(*basket_cols).agg(
        F.sort_array(F.collect_set(item_col)).alias("_items")
    )
    tp = dict(baskets.dtypes)["_items"]
    assert tp.startswith("array<") and tp.endswith(">")
    el = tp[len("array<"):-1]
    gen = (
        "explode(concat("
        f" CASE WHEN size(_items) >= 1 THEN array(struct("
        f"   CAST(NULL AS {el}) AS a, CAST(NULL AS {el}) AS b))"
        f"  ELSE array() END,"
        f" transform(_items, x -> struct(x AS a, CAST(NULL AS {el}) AS b)),"
        " flatten(transform(_items, (x, i) ->"
        " transform(slice(_items, i + 2, size(_items)),"
        " y -> struct(x AS a, y AS b))))"
        "))"
    )
    cells = (
        baskets.select(F.expr(gen).alias("_p"))
        .select("_p.a", "_p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w_a = Window.partitionBy("a")
    w_all = Window.partitionBy(F.lit(1))
    fr = cells.select(
        "a",
        "b",
        "_c",
        F.sum(
            F.when(F.col("b").isNull() & F.col("a").isNotNull(), F.col("_c"))
        ).over(w_a).alias("_na"),
        F.sum(F.when(F.col("a").isNull(), F.col("_c"))).over(w_all).alias(
            "_n"
        ),
    )
    # Consequent marginals: the b-IS-NULL slice of the windowed cell
    # table, reading the count from the wA window output (_na == _c on
    # a marginal row) so the window is load-bearing for this branch —
    # a _c read would let window elimination strip both windows here,
    # and with the barrier gone the slice predicate pushes below the
    # cell aggregate and re-runs the explode (observed). The single
    # predicate references b only, which is not wA's partition key, so
    # it cannot push below the surviving window; the (NULL, NULL)
    # sentinel row rides along harmlessly (a NULL join key never
    # matches).
    mb = F.broadcast(
        fr.filter(F.col("b").isNull()).select(
            F.col("a").alias("_bk"), F.col("_na").alias("_nb")
        )
    )
    return (
        # null-safe join key (trap 12): a plain equality infers
        # isnotnull(_bk) = isnotnull(a) on the build side, which pushes
        # below wA (a IS its partition key), below the cell aggregate
        # and into the explode — splitting the corpus subtree. The
        # probe side filters b IS NOT NULL, so <=> matches exactly the
        # same rows.
        fr.filter(F.col("b").isNotNull())
        .join(mb, F.col("b").eqNullSafe(F.col("_bk")))
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("a").alias("antecedent"),
                        F.col("b").alias("consequent"),
                        F.col("_na").alias("_ma"),
                        F.col("_nb").alias("_mc"),
                    ),
                    F.struct(
                        F.col("b").alias("antecedent"),
                        F.col("a").alias("consequent"),
                        F.col("_nb").alias("_ma"),
                        F.col("_na").alias("_mc"),
                    ),
                )
            ).alias("d"),
            F.col("_c").alias("n_ab"),
            "_n",
        )
        .select(
            "d.antecedent",
            "d.consequent",
            "n_ab",
            F.expr("n_ab * 10000 div _n").alias("support_bp"),
            F.expr("n_ab * 10000 div d._ma").alias("confidence_bp"),
            F.expr(
                "CAST(CAST(n_ab AS DECIMAL(38,0)) * _n * 10000"
                " div (CAST(d._ma AS DECIMAL(38,0)) * d._mc) AS BIGINT)"
            ).alias("lift_bp"),
        )
        .orderBy("antecedent", "consequent")
    )


def spike_days(
    ser: DataFrame,
    group_col: str,
    day_col: str,
    value_col: str,
    *,
    threshold_tenths: int = 13,
    min_baseline: int = 3,
) -> DataFrame:
    """Spike audit over a pre-aggregated per-(group, day) series (the
    q200 kernel): each day is compared to the LOWER median of the
    trailing 7 OBSERVED days EXCLUDING itself (a spike must not drag
    its own baseline); emits every day with >= ``min_baseline``
    baseline observations and a positive median, with the ratio in
    basis points and a cross-multiplied integer flag at
    ``threshold_tenths``/10 x. ``day_col`` must be integer epoch days
    (the range frame is arithmetic). Output columns:
    ``(group, day_i, value, baseline_med, ratio_bp, spike)``."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(day_col)
        .rangeBetween(-7, -1)
    )
    n = F.count(F.lit(1)).over(w)
    med = F.element_at(
        F.sort_array(F.collect_list(value_col).over(w)),
        F.floor((n + F.lit(1)) / F.lit(2)).cast("int"),
    )
    r = ser.select(
        group_col,
        day_col,
        value_col,
        med.alias("baseline_med"),
        n.alias("_nb"),
    )
    return (
        r.filter(
            (F.col("_nb") >= min_baseline) & (F.col("baseline_med") > 0)
        )
        .select(
            group_col,
            day_col,
            value_col,
            "baseline_med",
            F.expr(f"{value_col} * 10000 div baseline_med").alias("ratio_bp"),
            (
                F.col(value_col) * 10
                > F.col("baseline_med") * threshold_tenths
            ).alias("spike"),
        )
    )


def _windowed_presence_counts(
    act: DataFrame,
    group_col: str,
    day_col: str,
    user_col: str,
    window: int,
) -> DataFrame:
    """Exact moving-window distinct-user counts per (group, day)
    WITHOUT the window-way day-offset explode (r14): a user's
    activity days cover the reporting days ``[a, a+window-1]``; merged
    per-user cover INTERVALS (island detection via lag — a new island
    starts when the gap from the previous active day reaches
    ``window``; adjacent islands produce net-zero boundary deltas, so
    only true overlaps must merge) emit +1/-1 deltas at
    ``[start, end+window)``, and one cumulative sum per group over the
    union of deltas and observed-day markers reads off the windowed
    cardinality at every observed day. Shuffled volume is the
    contracted activity table once (island window) plus <= 2 interval
    endpoints per island — never ``window x`` the activity rows (q210:
    80k act rows exploded to 2.3M before; islands emit ~2 rows per
    user-burst). Both window chains share one total order per spec
    (q152 discipline); everything is integer and tie-independent
    (delta rows sort before their day's marker, and sums commute
    within a tie). Returns ``(group, day, n_today, n_window)`` for
    observed days only; duplicate activity rows are collapsed by an
    internal distinct that the optimizer merges with the caller's
    (trap 15 works FOR us here)."""
    # The contraction carries a count column so BOTH consumers can
    # reference it load-bearingly: a bare distinct + a count-only
    # marker branch collapses into its own scan (trap 15a, measured —
    # q203's marker aggregation re-scanned events), whereas
    # sum/max(least(_m, 1)) cannot be folded away and pins every
    # branch to this ONE aggregate (the q195 discipline).
    dd = (
        act.select(group_col, user_col, day_col)
        .groupBy(group_col, user_col, day_col)
        .agg(F.count(F.lit(1)).alias("_m"))
    )
    wlag = Window.partitionBy(group_col, user_col).orderBy(day_col)
    flagged = (
        dd.withColumn("_prev", F.lag(day_col).over(wlag))
        .withColumn(
            "_new",
            (
                F.col("_prev").isNull()
                | (F.col(day_col) - F.col("_prev") >= window)
            ).cast("long"),
        )
        .withColumn(
            "_isl",
            F.sum("_new").over(
                wlag.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    islands = flagged.groupBy(group_col, user_col, "_isl").agg(
        F.min(day_col).alias("_s"),
        F.max(day_col).alias("_e"),
        # == 1 always (_m >= 1); rides into the deltas arithmetically
        # so column pruning cannot narrow this branch's copy of dd.
        F.max(F.least(F.col("_m"), F.lit(1))).alias("_lb"),
    )
    deltas = islands.select(
        group_col,
        F.explode(
            F.array(
                F.struct(
                    F.col("_s").alias("_d"),
                    F.col("_lb").cast("long").alias("_delta"),
                ),
                F.struct(
                    (F.col("_e") + window).alias("_d"),
                    (-F.col("_lb")).cast("long").alias("_delta"),
                ),
            )
        ).alias("_x"),
    ).select(
        group_col,
        F.col("_x._d").alias(day_col),
        F.col("_x._delta").alias("_delta"),
        F.lit(0).alias("_rank"),
        F.lit(None).cast("bigint").alias("n_today"),
    )
    markers = (
        dd.groupBy(group_col, day_col)
        .agg(F.sum(F.least(F.col("_m"), F.lit(1))).alias("n_today"))
        .select(
            group_col,
            day_col,
            F.lit(0).cast("long").alias("_delta"),
            F.lit(1).alias("_rank"),
            "n_today",
        )
    )
    wcum = (
        Window.partitionBy(group_col)
        .orderBy(day_col, "_rank")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        deltas.unionByName(markers)
        .withColumn("_nw", F.sum("_delta").over(wcum))
        .filter(F.col("_rank") == 1)
        .select(
            group_col, day_col, "n_today", F.col("_nw").alias("n_window")
        )
    )


def rolling_wau(
    act: DataFrame,
    group_col: str,
    day_col: str,
    user_col: str,
    *,
    window: int = 7,
) -> DataFrame:
    """Rolling ``window``-day distinct active users per group (the
    q203 kernel), over a CONTRACTED distinct-activity frame — one row
    per (group, day, user); callers dedupe the raw event log first
    (COUNT(DISTINCT) OVER a moving frame has no Spark window form).
    r14: WIDE windows route through the interval-delta kernel
    (:func:`_windowed_presence_counts` — per-user cover islands emit
    two endpoint deltas, one cumulative sum per group reads the
    moving cardinality at observed days; exact by construction,
    value-identical, and the shuffle never multiplies the activity
    table). NARROW windows keep the ``window``-way day-offset
    explode: interleaved best-of-5 at sf0.1 measured the explode
    FASTER at window=7 (0.89 s vs 1.26 s — three window chains +
    a union cost more than a 7x fan-out of an already-contracted
    frame) and the kernel 1.7-2.2x faster at window=28 (q210 1.79 ->
    1.08 s, q207 1.83 -> 0.83 s, where the explode is a 28-29x blow-
    up). The crossover sits around window~10; dispatch below it.
    ``day_col`` must be integer epoch days. Output:
    ``(group, day, wau)``."""
    if window <= 10:
        contrib = act.select(
            group_col,
            user_col,
            day_col,
            F.explode(F.expr(f"sequence(0, {window - 1})")).alias("_off"),
        ).select(
            group_col,
            user_col,
            (F.col(day_col) + F.col("_off")).alias(day_col),
            (F.col("_off") == 0).alias("_here"),
        )
        return (
            contrib.groupBy(group_col, day_col)
            .agg(
                F.count_distinct(user_col).alias("wau"),
                F.max("_here").alias("_observed"),
            )
            .filter("_observed")
            .select(group_col, day_col, "wau")
        )
    counts = _windowed_presence_counts(
        act, group_col, day_col, user_col, window
    )
    # n_window + least(n_today, 0) == n_window exactly (n_today >= 1
    # on marker rows), but keeps n_today load-bearing: a bare select
    # pruned the marker branch's count, demoting its aggregate to
    # keys-only — which then collapsed through the distinct into a
    # SECOND events scan (trap 15; plan-contracted back to one).
    return counts.select(
        group_col,
        day_col,
        (F.col("n_window") + F.least(F.col("n_today"), F.lit(0))).alias(
            "wau"
        ),
    )


def returning_rate(
    act: DataFrame,
    group_col: str,
    day_col: str,
    user_col: str,
    *,
    past: int = 28,
) -> DataFrame:
    """Rolling returning-user rate per group (the q207 kernel): of
    the users active on day d, the share also seen in the PRIOR
    ``past`` days. r14 rewrite: "seen in [d-past, d-1]" is evaluated
    DIRECTLY as a per-(group, user) RANGE-frame window over the
    activity days — ``max(day) over (orderBy day range [-past, -1])``
    is non-null exactly when the user has prior-window activity — so
    the (past+1)-way day-offset explode (29x the contracted activity
    table: 80k -> 2.3M rows at sf0.1, then a 2.3M-row merge
    aggregation) is gone; the window exchange carries the activity
    rows once. The range frame (not ``lag``) keeps duplicate
    (group, user, day) rows exact — a same-day duplicate is offset-0
    presence, never prior-window evidence — and the (group, day,
    user) merge aggregation is retained so duplicate inputs collapse
    exactly as before. Emitted only for days with active users; rate
    in integer basis points. Output: ``(group, day, n_active,
    n_returning, returning_bp)``."""
    win = (
        Window.partitionBy(group_col, user_col)
        .orderBy(day_col)
        .rangeBetween(-past, -1)
    )
    marked = act.select(group_col, user_col, day_col).withColumn(
        "_ret", F.max(day_col).over(win).isNotNull()
    )
    per_user = marked.groupBy(group_col, day_col, user_col).agg(
        F.max("_ret").alias("_ret")
    )
    agg = per_user.groupBy(group_col, day_col).agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum(F.col("_ret").cast("long")).alias("n_returning"),
    )
    return agg.filter(F.col("n_active") > 0).select(
        group_col,
        day_col,
        "n_active",
        "n_returning",
        F.expr("n_returning * 10000 div n_active").alias("returning_bp"),
    )


def growth_accounting(
    act: DataFrame,
    group_col: str,
    day_col: str,
    user_col: str,
) -> DataFrame:
    """Daily growth accounting per group (the q209 kernel) over a
    CONTRACTED distinct-activity frame: per (group, day) the four
    cohorts of the canonical DAU decomposition — ``n_new`` (first
    seen that day), ``n_retained`` (also active the previous day),
    ``n_resurrected`` (back after a gap), ``n_churned`` (active the
    previous day, absent today) — with ``n_new + n_retained +
    n_resurrected = n_active`` by construction. ONE lineage:
    first-seen rides the activity table as a window (same bounded
    table the 2-way today/yesterday explode fans out), one
    aggregation per (group, day, user) merges the markers, one
    bounded rollup counts the cohorts. Emitted for observed
    (n_active > 0) days. ``day_col`` must be integer epoch days.
    Output: ``(group, day, n_active, n_new, n_retained,
    n_resurrected, n_churned)``."""
    from pyspark.sql.window import Window

    act2 = act.withColumn(
        "_first_day",
        F.min(day_col).over(Window.partitionBy(group_col, user_col)),
    )
    contrib = act2.select(
        group_col,
        user_col,
        "_first_day",
        F.explode(
            F.array(
                F.struct(
                    F.col(day_col).alias("d"),
                    F.lit(True).alias("cur"),
                    F.lit(False).alias("prev"),
                ),
                F.struct(
                    (F.col(day_col) + 1).alias("d"),
                    F.lit(False).alias("cur"),
                    F.lit(True).alias("prev"),
                ),
            )
        ).alias("m"),
    ).select(
        group_col,
        user_col,
        "_first_day",
        F.col("m.d").alias(day_col),
        F.col("m.cur").alias("cur"),
        F.col("m.prev").alias("prev"),
    )
    pu = contrib.groupBy(group_col, day_col, user_col).agg(
        F.max("cur").alias("cur"),
        F.max("prev").alias("prev"),
        F.min("_first_day").alias("_first_day"),
    )
    agg = pu.groupBy(group_col, day_col).agg(
        F.sum(F.col("cur").cast("long")).alias("n_active"),
        F.sum(
            (F.col("cur") & (F.col("_first_day") == F.col(day_col)))
            .cast("long")
        ).alias("n_new"),
        F.sum((F.col("cur") & F.col("prev")).cast("long")).alias(
            "n_retained"
        ),
        F.sum(
            (
                F.col("cur")
                & ~F.col("prev")
                & (F.col("_first_day") < F.col(day_col))
            ).cast("long")
        ).alias("n_resurrected"),
        F.sum((F.col("prev") & ~F.col("cur")).cast("long")).alias(
            "n_churned"
        ),
    )
    return agg.filter(F.col("n_active") > 0)


def change_point_from_daily(
    daily: DataFrame,
    group_col: str,
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Single change-point per group (binary segmentation, one split)
    over a CONTRACTED integer daily series — the q235 kernel: pick
    the split maximizing the between-segment variance
    ``SL^2/j + SR^2/(n-j)`` (equivalent to minimizing two-segment SSE
    since total SS is fixed). The objective is compared through the
    quantized integer key ``(SL^2*(n-j) + SR^2*j) * 1000 div
    (j*(n-j))`` — exact bigint algebra, so the argmax (ties ->
    earliest day) is deterministic under any partitioning and on any
    engine. Magnitudes bound: (series-total)^2 * n * 1000 must fit
    bigint — lift to DECIMAL(38,0) for series beyond ~10^5 units x
    1000 days. Input: one row per (group, day) with an integer
    ``value_col``; groups with a single row have no valid split and
    drop out. Output per group: ``(group, split_day, n_days,
    pre_mean, post_mean, shift)`` with floor means (truncation
    identical across engines on these operands). All windows ride ONE
    partitioning of the bounded series.

    Overflow guard (round-11 advice): the key needs
    ``(sum|x|)^2 * n * 1000`` to fit bigint. ANSI mode already makes
    the overflow a loud runtime error rather than corruption, but the
    raw arithmetic error names no fix — the guard below checks the
    bound per group (``assert_true`` riding the key expression so
    column pruning cannot drop it) and fails with a message that says
    to rescale ``value_col`` or lift the key to DECIMAL(38,0)."""
    w = Window.partitionBy(group_col).orderBy(day_col)
    wa = Window.partitionBy(group_col)
    pre = daily.select(
        group_col,
        day_col,
        F.row_number().over(w).alias("j"),
        F.sum(value_col).over(w).alias("sl"),
        F.sum(value_col).over(wa).alias("s"),
        F.sum(F.abs(F.col(value_col))).over(wa).alias("sabs"),
        F.count(F.lit(1)).over(wa).alias("n"),
    )
    # conservative double-precision bound with margin (9.2e18 <
    # 2^63-1): objective numerator <= sabs^2 * n, quantizer x1000
    guard_sql = (
        "assert_true(sabs <= CAST(floor(sqrt(9.2e18 / (1000.0 * n))) "
        "AS BIGINT), 'change_point_from_daily: (sum(abs(value)))^2 * "
        "n_days * 1000 exceeds BIGINT - rescale value_col to coarser "
        "units or lift the objective key to DECIMAL(38,0)')"
    )
    keyed = pre.filter(F.col("j") < F.col("n")).select(
        group_col,
        day_col,
        "j",
        "n",
        "sl",
        (F.col("s") - F.col("sl")).alias("sr"),
        F.expr(
            f"CASE WHEN {guard_sql} IS NULL THEN "
            "((sl * sl * (n - j) + (s - sl) * (s - sl) * j) * 1000) "
            "div (j * (n - j)) END"
        ).alias("k"),
    )
    wb = Window.partitionBy(group_col).orderBy(
        F.col("k").desc(), F.col(day_col)
    )
    best = keyed.withColumn("rn", F.row_number().over(wb)).filter(
        F.col("rn") == 1
    )
    return best.select(
        group_col,
        F.col(day_col).alias("split_day"),
        F.col("n").alias("n_days"),
        F.expr("sl div j").alias("pre_mean"),
        F.expr("sr div (n - j)").alias("post_mean"),
        F.expr("sr div (n - j) - sl div j").alias("shift"),
    )
