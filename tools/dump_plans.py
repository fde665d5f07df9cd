"""Regenerate PLANS.md: formatted physical plans for headline queries
with scale annotations. Run from the repo root:

    python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kaflow_spark.plans.explain import explain_str
from kaflow_spark.queries import REGISTRY
from kaflow_spark.session import get_spark

# query -> what a reviewer should see in the plan and why it scales
HEADLINERS: dict[str, str] = {
    "q03_in_between_like": (
        "All three predicates appear in PushedFilters — the parquet "
        "reader skips row groups via min/max stats; ReadSchema is only "
        "the two projected columns. At 100 TB the scan reads a "
        "fraction of the table."
    ),
    "q05_join_dim_chain": (
        "Two BroadcastHashJoins: nation and region ship to every "
        "executor; the customer side never shuffles. Zero Exchange on "
        "the fact table — the plan is scan→join→join→sort regardless "
        "of customer's size."
    ),
    "q12_tpch_q1_agg": (
        "Two HashAggregate nodes (partial then final) around one "
        "Exchange: map-side combine collapses each partition to at "
        "most |groups| rows (6 here) before the shuffle — shuffle "
        "volume is O(groups × partitions), independent of row count. "
        "Decimal sums keep the result shuffle-order-independent."
    ),
    "q21_topk": (
        "TakeOrderedAndProject, not a global Sort: each partition "
        "keeps a size-10 heap and only k rows travel to the driver. "
        "ORDER BY+LIMIT never materializes a full sort at any scale."
    ),
    "q28_correlated_scalar_subquery": (
        "Catalyst decorrelates the per-customer average into an "
        "Aggregate + join — no per-row re-execution of the subquery; "
        "the plan is two scans of orders + one shuffle on o_custkey."
    ),
    "q40_asof_join": (
        "The as-of join is a union + window (last ignorenulls), so "
        "the plan shows ONE Exchange on user_id feeding a sort within "
        "partitions — no range-join fan-out; cost matches an ordinary "
        "equi-join of the two inputs."
    ),
    "q41_minhash_near_dup": (
        "ONE shingle pass (persisted, eagerly materialized) feeds both "
        "the signature kernel and the exact-verify joins; candidate "
        "pairing is an equi-join Exchange on (band, bucket) carrying "
        "24-byte rows, then a pure-JVM groupBy band-count screen + "
        "est_jaccard filter so only ~true pairs reach the verify — "
        "LSH turns all-pairs O(n²) into shuffle-partitionable "
        "O(n·bands)."
    ),
    "q68_benchmark_contamination": (
        "Inverted-index contamination join: the benchmark gram table "
        "is broadcast (a benchmark suite is small by definition), so "
        "the corpus side streams past it with ZERO corpus shuffle; "
        "only matched (doc, bench) pairs reach the partial-agg'd "
        "groupBy. The corpus is scanned once no matter how many "
        "benchmarks are screened."
    ),
    "q70_hash_split": (
        "Deterministic train/val/test split is a pure scan-side "
        "projection — the only Exchange below is the declared query's "
        "ORDER BY (oracle determinism); the operator itself adds no "
        "shuffle (asserted in tests/test_curation.py). The md5-prefix "
        "comparison makes the split stable across engines, runs, and "
        "partitionings; at 100 TB this is a zero-cost column, not a "
        "job."
    ),
    "q71_sequence_packing": (
        "Sequence packing as a per-shard prefix-sum window: ONE "
        "Exchange on the shard key, then a sorted running sum per "
        "shard. A global running sum would serialize onto a single "
        "task; partitioning by source keeps every shard independent, "
        "which is how a 100 TB corpus actually packs (per file/date)."
    ),
    "q75_exists_not_exists": (
        "EXISTS and NOT EXISTS decorrelate to one LeftSemi and one "
        "LeftAnti hash join on the correlation key — no per-row "
        "subquery execution, no NestedLoop (plan-contract-tested)."
    ),
    "q85_chunk_overlap": (
        "Context-window chunking is a pure scan-side Generate: "
        "tokenize once, explode(sequence) over the arithmetic chunk "
        "count, JVM slice per chunk. The only Exchange below is the "
        "declared ORDER BY — the operator itself never shuffles, so "
        "chunking 100 TB is a map-only pass that scales with input "
        "splits."
    ),
    "q86_doc_frequency": (
        "Token document-frequency: explode → two stacked "
        "HashAggregates, each partial-agg'd before its Exchange, so "
        "shuffle rows are (token, doc_id) then (token) — never text. "
        "The corpus-size denominator is a BroadcastNestedLoopJoin of "
        "a ONE-ROW aggregate, not a driver round-trip, so the whole "
        "table is one job."
    ),
    "q88_tfidf_top_terms": (
        "TF-IDF reuses ONE (id, token) count aggregate for both the "
        "per-doc token total and the per-token document frequency — "
        "the plan shows the count frame feeding two branches, then "
        "equi-joins on narrow keys and a single row_number window for "
        "top-k. Integer idf-ratio scoring keeps every operator "
        "whole-stage-codegen'd; no floats, no UDFs."
    ),
    "q90_split_leakage": (
        "Decontamination report: the near-dup pair frame (a dedup "
        "pipeline's OUTPUT — orders of magnitude smaller than the "
        "corpus) joins the scan-side hash_split map twice on ids. "
        "AQE broadcasts the pair side at runtime, so the corpus-wide "
        "split map is never shuffled; split assignment itself is md5 "
        "column arithmetic, zero-cost at any scale."
    ),
    "q95_contamination_wordgrams": (
        "The fast decontamination path: word-8-gram inverted-index "
        "join (one exploded row per WORD position, ~6x fewer than "
        "q68's per-character grams), benchmark side broadcast, corpus "
        "side scan->project->explode with no Exchange before the "
        "partial-agg'd overlap count. The words array is its own "
        "projection below the gram transform — inlining the split "
        "would re-split each document once per window."
    ),
    "q37_doc_fingerprint": (
        "Sort BELOW the expensive projection: the range partitioner "
        "samples its child to pick sort bounds, so a sort above the "
        "md5 kernel would execute the kernel twice; here the sampling "
        "job re-reads only the pruned parquet scan and the stride-8 "
        "expression kernel runs exactly once on sorted batches — "
        "pure JVM, no python worker in the plan at all."
    ),
    "q100_quality_threshold": (
        "ReusedExchange is the contract: the (doc_id, score) frame is "
        "materialized through ONE hash exchange and both the p75-"
        "threshold branch and the final filter branch read it, so the "
        "regexp scoring scan runs exactly once. The final filter is "
        "null-safe (coalesce) on purpose — a bare score>=thr lets the "
        "optimizer infer isnotnull(score) on one branch only, which "
        "de-canonicalizes the subtrees and silently re-runs the scan."
    ),
    "q119_hard_negatives": (
        "Anchor vectors broadcast into a BroadcastNestedLoopJoin whose "
        "only predicate is the label inequality: the corpus scans "
        "once, each row scores against every anchor JVM-side, and the "
        "per-anchor top-k window shuffles only (query_id, id, score) "
        "rows — vectors never cross the wire."
    ),
    "q120_shuffle_shards": (
        "No global sort: shard id is a pure expression of the seeded "
        "md5 (scan-side), and the row_number window partitions BY "
        "SHARD, so the single exchange hash-partitions on shard and "
        "every shard numbers itself in parallel."
    ),
    "q114_tpch_q15_top_supplier": (
        "The revenue CTE's groupBy exchange is shared by the max "
        "branch (ReusedExchange) — one lineitem scan+aggregate, not "
        "two. Two optimizer inferences can silently break this: the "
        "max-equality filter infers isnotnull(tr) and the supplier "
        "join infers isnotnull(l_suppkey), each onto one branch only. "
        "The query uses null-safe equality and carries the cheap "
        "isnotnull in the shared subtree so both branches stay "
        "canonical-equal; test_plans locks the 2-scan contract."
    ),
    "q124_substring_dedup_clip": (
        "The clip step over the q96 span stage: the corpus-wide "
        "position-explode shuffles (id, pos, xxhash64) 24-byte rows — "
        "window TEXT never moves — then spans collapse per document "
        "and the splice is a higher-order fold over each doc's sorted "
        "span array, joined LEFT back to the pruned corpus scan so "
        "span-free documents pass through untouched."
    ),
    "q125_session_paths": (
        "Sessionization (shared _sessionized helper with q31) runs "
        "both gaps-and-islands windows on ONE user_id exchange; the "
        "per-session path assembles from sort_array(collect_list("
        "struct(rn, type))) so the aggregate stays partial-aggregable "
        "and shuffle-order-insensitive; the final count groups the "
        "tiny distinct-path table."
    ),
    "q121_ohlc_bars": (
        "First/last-in-window via min_by/max_by on struct(ts, "
        "event_id): a single two-phase aggregate — partial map-side, "
        "final after one exchange on the group keys (the struct-keyed "
        "min_by/max_by buffer is not hash-aggregable, so Spark plans "
        "SortAggregate; still partial-agg'd, so the exchange carries "
        "aggregate rows only). No window operator, no per-row shuffle."
    ),
    "q129_tpch_q2_min_cost_supplier": (
        "Q2's correlated MIN as a self diamond: the derived "
        "(part,supp) min-unit-price aggregate is built once — its "
        "lineitem exchange feeds BOTH the per-part MIN branch and the "
        "row branch as ReusedExchange (the branches re-run only the "
        "cheap aggregate above it). Part and the region-pruned "
        "supplier dim broadcast INTO the shared subtree, so the "
        "pruning happens before the only fact shuffle; the cost "
        "equality is null-safe so constraint inference cannot "
        "de-canonicalize the diamond. Top-100 is "
        "TakeOrderedAndProject — per-partition heaps, no global sort."
    ),
    "q135_lexical_retrieval_topk": (
        "Sparse lexical retrieval: the corpus postings aggregate is "
        "built once — ReusedExchange feeds both the document-frequency "
        "rollup and the scoring join (the dfreq count is written as "
        "sum(least(tf,1)) because a plain count() gets pruned out of "
        "the shared aggregate, de-canonicalizing the diamond and "
        "doubling the corpus explode). The query side broadcasts "
        "weighted postings; scoring partial-aggs map-side to "
        "(query, doc, score); the per-query top-k runs as "
        "WindowGroupLimit (partial per-partition + final), never a "
        "global sort."
    ),
    "q136_quality_deciles": (
        "Exact global deciles WITHOUT a global sort: the expensive "
        "score projection is shared (one scan) between the bounded "
        "|distinct score_bp| count table — whose cumulative window is "
        "one light task over <= 10001 rows — and the final bucket "
        "join; the tiny bucket map broadcasts back. BOTH join keys "
        "are coalesce expressions: both sides descend from the shared "
        "subtree, so constraint inference on either attribute would "
        "split the diamond."
    ),
    "q146_fuzzy_key_match": (
        "Edit-distance-family matching as an equi-join: d+1 "
        "interleaved character projections guarantee any <= d "
        "substitutions leave one projection untouched (recall 1 by "
        "construction — the brute-force oracle attests it), so the "
        "blocking join is hash-partitionable on (chunk, length, "
        "projection). The exact Hamming verify evaluates ONCE per "
        "candidate pair, above the dedup aggregate — a verify-first "
        "ordering re-evaluates the interpreted per-char expression "
        "under the join post-condition and the inferred isnotnull "
        "(measured 2-4x slower)."
    ),
    "q139_gapfill_locf": (
        "Resample-then-fill without materializing raw events twice "
        "per spine input: the (type, hour) spine is generated from a "
        "FUSED one-row summary (min/max hour + collect_set of types "
        "in a single aggregate — separate range and distinct branches "
        "each cost another full scan; fused, the optimizer collapses "
        "it to one extra column-pruned map-side pass). The fill is "
        "one last-non-null window per type over spine-sized rows; "
        "bars carry exact bigint cents."
    ),
    "q130_tpch_q11_important_stock": (
        "Q11's HAVING-over-total as a scalar diamond: the per-part "
        "value aggregate (lineitem shuffled once, on l_partkey, after "
        "the broadcast supplier prune) feeds both the 1-row "
        "(cnt,total) reduction and the output rows; the scalar comes "
        "back as a broadcast cross join and the threshold test is "
        "exact DECIMAL(38,0) cents algebra — no IEEE division, no "
        "boundary flips between engines. One fact scan via "
        "ReusedExchange."
    ),
    "q154_edit_distance_join": (
        "Deletion-neighborhood blocking planned as a plain hash "
        "equi-join on the variant string: explode (<= L+1 variants "
        "per key), SortMerge/ShuffledHash on _v, partial-agg'd pair "
        "dedup, then the levenshtein verify as a projected filter — "
        "no NestedLoop anywhere. The O(n²) semantics ride an O(n) "
        "blocking join with recall 1 by construction."
    ),
    "q156_quantile_normalization": (
        "Every window in the plan runs over the (source, value) "
        "COUNT table — the raw scan feeds one partial-agg'd groupBy "
        "and is never globally sorted. The only non-equi join is the "
        "global order-statistic lookup, visible as "
        "BroadcastNestedLoopJoin over the bounded global count table "
        "(legal precisely because that table is value-domain-sized); "
        "the doc-level reattach is a plain equi-join."
    ),
    "q160_asof_nearest": (
        "ONE hash exchange on user_id feeds BOTH direction windows "
        "(backward carry-forward, forward carry-backward) over the "
        "same (ts, side) sort prefix — the nearest pick is a "
        "row-local CASE afterwards. No join operator at all: the "
        "union-and-window composition replaces the range join that "
        "would fan out unboundedly on skewed time ranges."
    ),
    "q164_winnow_near_dup": (
        "Winnowing screen: per-doc window-min selects ~1/w of word "
        "grams (one id-partitioned window), the candidate stage is a "
        "hash equi-join on the gram with partial-agg'd pair counts, "
        "and the exact verify joins by id. Fingerprint df is "
        "near-unique per doc (word grain), so bucket fan-out stays "
        "linear — the char-grain variant measured here floods or "
        "loses recall (CLAUDE.md trap 8)."
    ),
    "q174_dsir_importance": (
        "DSIR importance weights: ONE gram pipeline (scan, tokenize, "
        "explode, md5 bucket, count) shared via ReusedExchange between "
        "the per-doc branch and the bucket-distribution branch — the "
        "coalesce null-safe join keeps both subtrees canonical "
        "(q100/q136 idiom) and the corpus totals ride a single-"
        "partition window over the bounded 4096-row bucket table "
        "instead of a third aggregation branch. Text never shuffles; "
        "the distribution table broadcasts."
    ),
    "q179_cusum_changepoints": (
        "CUSUM without iteration: the max(0, C+dev) recursion is the "
        "closed form S_t - min(0, running min S), so the whole "
        "detector is one events aggregation to the bounded (type, "
        "day) series plus two ordered windows OVER THAT TABLE. The "
        "only corpus-sized work is the partial-agg'd daily rollup."
    ),
    "q191_length_duplication_calibration": (
        "Round-9 re-grain: the dup-flag count window partitions on "
        "the 128-bit two-seed xxhash64 identity, so the exchange "
        "below it shuffles 16-byte keys instead of full document "
        "bytes (the last full-text shuffle key in the registry); the "
        "NTILE decile assignment still runs with NO corpus-wide "
        "single-partition sort (bounded value-table cumulative + "
        "per-value row_number + the closed form)."
    ),
    "q194_cooccurrence_lift": (
        "ONE corpus shuffle: collect_set contracts each (user, day) "
        "basket to its sorted distinct type-set (subsuming DISTINCT), "
        "pairs enumerate INSIDE the bounded array, and the basket "
        "count, marginals and pair counts all branch off that single "
        "aggregate — 1 scan with 3 ReusedExchange under the static "
        "planner. A self-join formulation measured 3 corpus scans "
        "(join-side isnotnull inference + branch pruning "
        "de-canonicalized the shared distinct)."
    ),
    "q198_volume_autocorrelation": (
        "q74 exact-moments discipline on lag pairs: the five moment "
        "sums accumulate in DECIMAL(38,0) and float enters only in "
        "the final fixed sqrt/divide expression; the 7-way lag side "
        "reuses the series exchange (null-safe join keys — plain "
        "equi-keys de-canonicalized the branches into 2 scans)."
    ),
    "q203_rolling_wau": (
        "Exact windowed COUNT(DISTINCT) — unsupported as a Spark "
        "window — via a 7-day explode of the CONTRACTED distinct-"
        "activity table plus one distinct count per (type, day); the "
        "observed-day flag rides the SAME aggregation (max over the "
        "offset-0 marker), keeping the query to one events scan."
    ),
    "q253_semantic_near_dup": (
        "SemDeDup at document grain: IVF multi-assignment (one Arrow "
        "matmul) explodes to (list, id, vec) rows; each (list, "
        "salt-cell) group is an independent in-list Gram verify task "
        "— never an all-pairs join — and n_lists is the lever that "
        "bounds per-task cost at 100 TB (SemDeDup runs L~50k). The "
        "whole q253-q256 family reads ONE persisted pair "
        "materialization (semantic_pair_frame)."
    ),
    "q257_weighted_priority_sample": (
        "Exactly-k weighted WOR per group with the rank fully pushed "
        "down: a Partial+Final WindowGroupLimit pair around ONE hash "
        "exchange on the group key means each map task forwards at "
        "most k rows per group — the shuffle carries O(groups * k) "
        "rows no matter the corpus size. The priority key is one "
        "IEEE division of md5-derived integers (no RNG state, "
        "engine-portable)."
    ),
    "q259_brand_association_rules": (
        "Directional rule mining in ONE corpus shuffle: orders "
        "contract to sorted distinct brand-sets (part broadcast), "
        "unordered in-array pairs emit both directions, and basket "
        "count / marginals / pair counts all branch off the single "
        "basket aggregate (ReusedExchange x3); normalizers return as "
        "broadcasts into the bounded |brands|^2 cell table."
    ),
    "q261_tukey_outlier_rate": (
        "Robust outlier rate without a second fact pass: quartiles "
        "come from exact integer selectors over the bounded "
        "(segment, cents) value grid, fences compare in doubled "
        "units, and the outlier tally sums the GRID's counts against "
        "broadcast fences — the orders table scans once, and both "
        "grid consumers share the exchange."
    ),
    "q269_semantic_dedup_corpus": (
        "The emitted semantically-deduplicated corpus: CC over the "
        "shared persisted semantic pair frame (tiny), quality "
        "regexes projected ABOVE the broadcast cc join so only "
        "cluster MEMBERS pay them, the keeper argmax one bounded "
        "aggregation with a single consumer (a drop-list "
        "formulation duplicated the scoring scan), and the "
        "corpus-sized pass is one narrow (doc_id, source) scan + "
        "two broadcast left joins — documents scans exactly twice, "
        "every join broadcast."
    ),
    "q270_source_entropy_evenness": (
        "Entropy/evenness in ONE scan: cells -> per-source windows "
        "-> one bounded rollup; the float stage is per-CELL "
        "(-p ln p) floored to integer micro-nats BEFORE the "
        "cross-cell sum, so the engine-divergent ln ULP never "
        "reaches a hashed value and the sum is exact integer "
        "arithmetic."
    ),
}


_CBO_SHAPES = {
    "q103 shape (TPC-H Q7, worst-first text order)": """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
FROM lineitem_st
JOIN orders_st   ON l_orderkey = o_orderkey
JOIN customer_st ON c_custkey = o_custkey
JOIN supplier_st ON s_suppkey = l_suppkey
JOIN nation_st n1 ON s_nationkey = n1.n_nationkey
JOIN nation_st n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
GROUP BY supp_nation, cust_nation, l_year
""",
    "q115 shape (TPC-H Q9, selective part filter written last)": """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS profit
FROM lineitem_st
JOIN orders_st ON o_orderkey = l_orderkey
JOIN supplier_st ON s_suppkey = l_suppkey
JOIN nation_st ON s_nationkey = n_nationkey
JOIN part_st ON p_partkey = l_partkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, o_year
""",
}


def cbo_section(spark, sf_dir: str) -> list[str]:
    """Optimized join chains for two declared-query shapes with CBO
    stats absent vs present (tests/test_cbo.py asserts the same
    inversions; this records WHAT moves for a reviewer)."""
    from kaflow_spark.catalog import register_tables_with_stats

    register_tables_with_stats(
        spark,
        sf_dir,
        ("region", "nation", "customer", "supplier", "orders", "lineitem", "part"),
    )
    out = [
        "## CBO: stats-driven join reorder (q103/q115 shapes)",
        "",
        "The declared q103/q115 plans hand-stage prune-the-fact-first",
        "with broadcast hints; with external-table column stats",
        "(`catalog.register_tables_with_stats`) and",
        "`spark.sql.cbo.joinReorder.enabled`, Catalyst derives the same",
        "staging from statistics alone. Below: the optimized plan's",
        "`Join Inner` chain (top = applied last) for each shape written",
        "in its WORST order, stats absent vs present.",
        "",
    ]
    for title, q in _CBO_SHAPES.items():
        out += [f"### {title}", ""]
        for flag, label in (("false", "stats ignored (cbo off)"),
                            ("true", "stats used (cbo on)")):
            spark.conf.set("spark.sql.cbo.enabled", flag)
            spark.conf.set("spark.sql.cbo.joinReorder.enabled", flag)
            plan = spark.sql(q)._jdf.queryExecution().optimizedPlan().toString()
            joins = [
                ln.strip()[:100]
                for ln in plan.splitlines()
                if "Join Inner" in ln
            ]
            out += [f"**{label}**", "", "```"] + joins + ["```", ""]
        spark.conf.unset("spark.sql.cbo.enabled")
        spark.conf.unset("spark.sql.cbo.joinReorder.enabled")
    return out


def dpp_section(spark, sf_dir: str) -> list[str]:
    """Dynamic partition pruning over a month-partitioned fact layout —
    the storage-layout half of the 100 TB read story (the flat-file
    half is PushedFilters/ReadSchema above). Writes the layout to a
    temp dir, plans the q101-shaped star join under the STATIC planner
    (AQE off — trap 9), then executes and reports measured partition
    counts."""
    import tempfile

    from pyspark.sql import functions as F

    from kaflow_spark.plans.explain import scan_partition_metrics
    from kaflow_spark.sources.layout import (
        month_dim,
        star_join_quarter_revenue,
        write_month_partitioned,
    )

    tmp = tempfile.mkdtemp(prefix="dpp_plans_")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_month_partitioned(orders, f"{tmp}/orders_by_month", "o_orderdate",
                            month_col="month")
    fact = spark.read.parquet(f"{tmp}/orders_by_month")
    n_months = fact.select("month").distinct().count()
    lo, hi = fact.agg(F.min("month"), F.max("month")).first()
    dim = month_dim(spark, lo, hi, month_col="month")

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    q = star_join_quarter_revenue(fact, dim, "1996Q2")
    static_plan = explain_str(q)
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    q = star_join_quarter_revenue(fact, dim, "1996Q2")
    q.collect()
    scans = [m for m in scan_partition_metrics(q) if "numPartitions" in m]
    fact_scan = max(scans, key=lambda m: m.get("numOutputRows", 0))

    # keep only the interesting plan fragment: the partitioned scan node
    keep = [
        ln for ln in static_plan.splitlines()
        if any(k in ln for k in (
            "Scan parquet", "PartitionFilters", "SubqueryBroadcast",
            "BroadcastHashJoin", "dynamicpruning", "ReusedExchange",
        ))
    ]
    return [
        "## dynamic partition pruning (storage layout)",
        "",
        "`sources/layout.py`: the fact table written as `month=YYYY-MM/`"
        " directories (write_month_partitioned), star-joined to a tiny"
        " calendar dim filtered on `quarter` — an attribute the layout"
        " knows nothing about, so only DPP can prune the fact scan."
        " Catalyst plans a `dynamicpruningexpression` into the scan's"
        " PartitionFilters and reuses the dim broadcast to evaluate it"
        " at runtime, before the fact scan lists files. Measured on the"
        f" layout just written: **{fact_scan['numPartitions']} of"
        f" {n_months} partitions read** ({fact_scan.get('numFiles', '?')}"
        " files) — at 100 TB that is the difference between reading one"
        " quarter and reading a decade. Contract-tested in"
        " tests/test_dpp.py (plan node + runtime scan metrics + pruned"
        " == unpartitioned answer).",
        "",
        "```",
        *[ln.rstrip()[:160] for ln in keep],
        "```",
        "",
    ]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — physical plans of headline queries",
        "",
        f"Generated by `python tools/dump_plans.py` at `{sf_dir}`.",
        "Each section: why this plan survives a 100 TB scale-up, then",
        'the actual `.explain("formatted")` output (plan shapes are',
        "asserted in tests/test_plans.py, so regressions fail CI).",
        "",
    ]
    for name, note in HEADLINERS.items():
        df = REGISTRY[name].spark(spark, sf_dir)
        txt = explain_str(df)
        out += [f"## {name}", "", note, "", "```", txt.strip(), "```", ""]
    out += cbo_section(spark, sf_dir)
    out += dpp_section(spark, sf_dir)
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(HEADLINERS)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
