"""Dataset-curation operators for LLM training-data pipelines.

The reference engine (kaflow) stops at transport + per-record
transforms; a training-data pipeline additionally curates the corpus
before tokenization. These operators cover the four standard curation
stages — benchmark-contamination screening, per-domain quota capping,
deterministic corpus splitting, and sequence packing — each expressed
as declarative DataFrame plans (no Python in the hot path) so Catalyst
plans them like any relational query.

Scale notes (100 TB lens) are on each operator; the common theme is
that the corpus side is only ever scanned, exploded, or
window-partitioned by a parallel key — nothing here shuffles the
document text more than once, and the only broadcast is the (small by
definition) benchmark suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from kaflow_spark.operators.dedup import char_shingles


def contamination_overlaps(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    bench_id_col: str,
    bench_text_col: str,
    *,
    k: int = 8,
    min_overlap: int = 1,
) -> DataFrame:
    """Benchmark-contamination screen: for every (corpus doc,
    benchmark item) pair sharing at least ``min_overlap`` distinct
    character ``k``-grams, emit ``(id, bench_id, overlap)``.

    Shape at scale: an inverted-index join. Both sides explode to
    (id, gram-hash) rows; the benchmark side is SMALL by definition
    (a benchmark suite is thousands of items, not billions), so it is
    broadcast and the corpus side never shuffles — the per-executor
    hash join streams corpus grams past the in-memory benchmark gram
    table, and only the matched (doc, bench) pairs reach the
    (partial-agg'd) groupBy. Grams are xxhash64 hashes, 8 bytes each;
    the overlap COUNT is hash-invariant, which is what lets a
    string-gram oracle attest this plan exactly.
    """
    dg = docs.select(
        F.col(id_col).alias("_did"),
        F.explode(char_shingles(text_col, k)).alias("_g"),
    )
    bg = bench.select(
        F.col(bench_id_col).alias("_bid"),
        F.explode(char_shingles(bench_text_col, k)).alias("_g"),
    )
    return (
        dg.join(F.broadcast(bg), "_g")
        # shingle arrays are distinct per doc, so plain COUNT counts
        # distinct shared grams
        .groupBy("_did", "_bid")
        .agg(F.count(F.lit(1)).alias("overlap"))
        .filter(F.col("overlap") >= F.lit(min_overlap))
        .select(
            F.col("_did").alias(id_col),
            F.col("_bid").alias(bench_id_col),
            "overlap",
        )
    )


def quota_per_key(
    df: DataFrame, key_col: str, order_col: str, cap: int
) -> DataFrame:
    """Per-key quota sampling: keep the first ``cap`` rows per
    ``key_col`` in ``order_col`` order (deterministic — the standard
    'at most N documents per domain' curation rule).

    One shuffle (window partition by key); a skewed key caps at
    ``cap`` rows kept but still sorts its partition — for pathological
    domains pre-filter with a sampled count if needed."""
    w = Window.partitionBy(key_col).orderBy(order_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.lit(cap))
        .drop("_rn")
    )


def _hex_threshold(frac: float) -> str:
    """Cumulative fraction -> 8-hex-digit threshold string. Comparing
    the first 8 md5 hex chars against it lexicographically equals
    comparing the 32-bit numeric prefix — and works identically in
    any engine with a lowercase-hex md5()."""
    return format(min(int(frac * (1 << 32)), (1 << 32) - 1), "08x")


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    *,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic corpus split (train/val/test ...): assign each id
    to a named split with probability proportional to its weight,
    decided by the md5 of the id (+ optional salt) — stable across
    runs, engines, partitionings, and cluster sizes, which is the
    property a training pipeline needs (re-running the pipeline must
    not migrate documents between train and test).

    Pure scan-side projection: no shuffle, no RNG, no state. md5 is
    used (not xxhash64) because every engine agrees on it — the split
    must be reproducible OUTSIDE this engine too (e.g. a downstream
    decontamination job in another system).
    """
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    key = (
        F.concat(F.col(id_col).cast("string"), F.lit(salt))
        if salt
        else F.col(id_col).cast("string")
    )
    prefix = F.substring(F.md5(key), 1, 8)
    expr: F.Column | None = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cond = prefix < F.lit(_hex_threshold(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    assigned = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, assigned)


def hash_split_sql(
    id_col: str, weights: dict[str, float], *, salt: str = ""
) -> str:
    """The ANSI-ish SQL twin of :func:`hash_split`'s assignment
    expression (used by oracles and portable downstream jobs)."""
    total = sum(weights.values())
    key = (
        f"CAST({id_col} AS VARCHAR)"
        if not salt
        else f"CAST({id_col} AS VARCHAR) || '{salt}'"
    )
    prefix = f"substring(md5({key}), 1, 8)"
    names = list(weights)
    parts = []
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name] / total
        parts.append(f"WHEN {prefix} < '{_hex_threshold(cum)}' THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{names[-1]}' END"


def pack_greedy(
    df: DataFrame,
    part_col: str,
    order_col: str,
    size_col: str,
    budget: int,
    *,
    bin_col: str = "bin_id",
) -> DataFrame:
    """Sequence packing: assign each row (document) to a training bin
    of ~``budget`` tokens, filling bins in ``order_col`` order within
    each ``part_col`` shard. A document lands in bin
    ``floor(prefix_sum_before_it / budget)`` — the streaming-packing
    contract where a bin absorbs documents until its cumulative tokens
    cross the budget (the last document may overflow; exact bin-packing
    is NP-hard and non-deterministic under parallelism, this contract
    is deterministic and window-expressible in any engine).

    Packing is per-shard (``part_col``) — a GLOBAL running sum would
    serialize onto one task at scale, while per-shard windows
    parallelize by the shard key, which is how a 100 TB corpus is
    packed in practice (per input file / domain / date)."""
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return df.withColumn(bin_col, (prev / F.lit(budget)).cast("bigint"))


# --- PII scrubbing -------------------------------------------------

# Engine-portable patterns: no backreferences or lookaround, so Java
# regex (Spark) and RE2 (DuckDB, Go) agree on every match.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d()\- ]{7,}\d", "<PHONE>"),
)


def pii_scrub(text: F.Column | str) -> F.Column:
    """Replace emails, IPv4 addresses, and phone-like digit runs with
    typed placeholder tokens. Order matters (emails before phones so
    digit-bearing local parts don't half-match); patterns are chosen
    to behave identically under Java regex and RE2."""
    col = F.col(text) if isinstance(text, str) else text
    for pat, rep in PII_PATTERNS:
        col = F.regexp_replace(col, pat, rep)
    return col


def pii_scrub_sql(text_col: str) -> str:
    """DuckDB twin of :func:`pii_scrub` (regexp_replace with the 'g'
    flag, same pattern order)."""
    expr = text_col
    for pat, rep in PII_PATTERNS:
        sql_pat = pat.replace("\\", "\\\\").replace("'", "''")
        expr = f"regexp_replace({expr}, '{sql_pat}', '{rep}', 'g')"
    return expr


def split_counts_exact(df: DataFrame, split_col: str = "split") -> DataFrame:
    """Sanity aggregate for :func:`hash_split`: rows per split (used
    by tests and ops dashboards)."""
    return df.groupBy(split_col).agg(F.count(F.lit(1)).alias("n"))


__all__ = [
    "contamination_overlaps",
    "quota_per_key",
    "hash_split",
    "hash_split_sql",
    "pack_greedy",
    "pii_scrub",
    "pii_scrub_sql",
    "split_counts_exact",
    "PII_PATTERNS",
]
