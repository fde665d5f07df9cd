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

from kaflow_spark.operators.dedup import char_shingle_pairs128, ensure_map_last_win
from kaflow_spark.operators.parallelism import fan_out


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
    (partial-agg'd) groupBy. Grams are 128-bit two-seed xxhash64
    identities (16 bytes); the overlap COUNT is hash-invariant, which
    is what lets a string-gram oracle attest this plan exactly.

    Session side effect: planning this operator sets
    ``spark.sql.mapKeyDedupPolicy=LAST_WIN`` for the WHOLE session
    (via :func:`ensure_map_last_win` — duplicate map keys are the
    per-doc dedup mechanism). Code in the same session that relies on
    the default EXCEPTION policy to surface duplicate map keys will
    silently stop raising after this runs.
    """
    # 128-bit two-seed gram identity: a 64-bit collision between a
    # corpus gram and a benchmark gram would falsely DROP a document
    # as contaminated — destructive, so the wider key is mandatory
    # (expected false matches at 1e11 corpus x 1e7 bench grams is
    # ~0.05 under 64 bits, <1e-15 under 128). The identity is carried
    # as TWO long columns, never a struct key, and per-doc dedup is
    # the O(n) map build — see char_shingle_pairs128 for the measured
    # kernel-selection rationale.
    ensure_map_last_win(docs)
    dg = (
        fan_out(docs, id_col)
        .select(
            F.col(id_col).alias("_did"),
            F.explode(char_shingle_pairs128(text_col, k)).alias("_g"),
        )
        .select("_did", F.col("_g.key").alias("_h1"), F.col("_g.value").alias("_h2"))
    )
    bg = (
        bench.select(
            F.col(bench_id_col).alias("_bid"),
            F.explode(char_shingle_pairs128(bench_text_col, k)).alias("_g"),
        )
        .select("_bid", F.col("_g.key").alias("_h1"), F.col("_g.value").alias("_h2"))
    )
    return (
        dg.join(F.broadcast(bg), ["_h1", "_h2"])
        # both sides are per-doc distinct, so plain COUNT counts
        # distinct shared grams and partial-aggregates map-side
        .groupBy("_did", "_bid")
        .agg(F.count(F.lit(1)).alias("overlap"))
        .filter(F.col("overlap") >= F.lit(min_overlap))
        .select(
            F.col("_did").alias(id_col),
            F.col("_bid").alias(bench_id_col),
            "overlap",
        )
    )


def word_ngrams(words_col: str, n: int = 8) -> F.Column:
    """Distinct word ``n``-grams (grams space-rejoined) over an
    ALREADY-MATERIALIZED words-array column. The public
    decontamination standard operates on word/token n-grams rather
    than character grams (GPT-3 appendix C and successors screen on
    8-13-gram collisions): one gram per WORD position instead of per
    CHARACTER position cuts the inverted-index explode ~6x for
    English-like text while keeping exact-match semantics on word
    sequences. Pure JVM slice/join expressions, hash-free, so an
    ANSI-SQL oracle reproduces the fingerprint set exactly. Docs with
    fewer than ``n`` words yield their full word sequence as the
    single gram.

    Takes a column NAME holding ``array<string>`` (see
    :func:`words_of`) rather than building the split inline: an
    expression referenced inside a ``transform`` lambda is
    re-evaluated per element, so an inline ``split`` would re-split
    the document once per window — materializing the array first
    makes gram construction O(words), not O(words * windows)."""
    words = F.col(words_col)
    nw = F.greatest(F.size(words) - (n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), nw),
            lambda j: F.array_join(F.slice(words, j, n), " "),
        )
    )


def words_of(text_col: str) -> F.Column:
    """Whitespace tokenization matching the oracle's
    ``string_split_regex(trim(text), '\\s+')``."""
    return F.split(F.trim(F.col(text_col)), r"\s+")


def contamination_overlaps_wordgrams(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    bench_id_col: str,
    bench_text_col: str,
    *,
    n: int = 8,
    min_overlap: int = 1,
) -> DataFrame:
    """Word-n-gram benchmark-contamination screen: same inverted-index
    shape as :func:`contamination_overlaps` (benchmark side broadcast,
    corpus side never shuffles) but both sides explode word n-grams —
    ~1/avg_word_len of the character-gram row count — so the
    explode+join moves ~6x fewer rows at the same detection semantics
    the large-model decontamination literature uses. ``overlap``
    counts distinct shared word n-grams; ``min_overlap=1`` flags any
    shared n-word span."""
    dg = (
        fan_out(docs, id_col)
        .select(F.col(id_col).alias("_did"), words_of(text_col).alias("_w"))
        .select("_did", F.explode(word_ngrams("_w", n)).alias("_g"))
    )
    bg = (
        bench.select(
            F.col(bench_id_col).alias("_bid"), words_of(bench_text_col).alias("_w")
        )
        .select("_bid", F.explode(word_ngrams("_w", n)).alias("_g"))
    )
    return (
        dg.join(F.broadcast(bg), "_g")
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


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict[str, float],
    *,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic stratified sampling: keep a per-stratum fraction
    of rows, decided by the md5 of the id — the reproducible
    alternative to ``df.sampleBy`` (whose RNG draw depends on
    partitioning and seed plumbing). Strata not listed in
    ``fractions`` keep ``default_fraction``.

    Like :func:`hash_split` this is a pure scan-side projection +
    filter: no shuffle, no RNG state, stable across engines and
    re-runs — re-sampling the corpus after adding documents keeps
    every previously-kept id (a growing corpus never churns the
    sample)."""
    key = (
        F.concat(F.col(id_col).cast("string"), F.lit(salt))
        if salt
        else F.col(id_col).cast("string")
    )
    prefix = F.substring(F.md5(key), 1, 8)
    thresh = F.lit(_hex_threshold(default_fraction))
    for stratum, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == F.lit(stratum), F.lit(_hex_threshold(frac))
        ).otherwise(thresh)
    return df.filter(prefix < thresh)


def stratified_sample_sql(
    strata_col: str,
    id_col: str,
    fractions: dict[str, float],
    *,
    default_fraction: float = 0.0,
    salt: str = "",
) -> str:
    """Portable SQL predicate twin of :func:`stratified_sample`."""
    key = (
        f"CAST({id_col} AS VARCHAR)"
        if not salt
        else f"CAST({id_col} AS VARCHAR) || '{salt}'"
    )
    cases = " ".join(
        f"WHEN {strata_col} = '{stratum}' THEN '{_hex_threshold(frac)}'"
        for stratum, frac in sorted(fractions.items())
    )
    return (
        f"substring(md5({key}), 1, 8) < "
        f"(CASE {cases} ELSE '{_hex_threshold(default_fraction)}' END)"
    )


def temperature_fractions(
    counts: dict[str, int], alpha: float, target_total: int
) -> dict[str, float]:
    """Per-stratum keep fractions for temperature-based mixture
    resampling: stratum s gets a share proportional to count(s)^alpha
    of ``target_total`` rows (alpha=1 → natural mix, alpha=0 →
    uniform; LLM data mixes typically use alpha in [0.2, 0.7] to
    up-weight small domains). Returned fractions cap at 1.0 — this
    operator only downsamples; small domains that would need
    up-sampling keep everything.

    Pure driver-side arithmetic over the (small) per-stratum counts;
    feed the result to :func:`stratified_sample` for a deterministic,
    shuffle-free resample."""
    if not counts:
        return {}
    shares = {s: c**alpha for s, c in counts.items()}
    z = sum(shares.values())
    return {
        s: min(1.0, (shares[s] / z) * target_total / max(counts[s], 1))
        for s in counts
    }


def _tokens(text_col: str) -> F.Column:
    """Whitespace tokens via regexp_extract_all(\\S+) — the one
    tokenization that behaves identically in Spark and DuckDB (split()
    semantics differ on empty strings and leading separators)."""
    return F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0)


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Gopher-style per-document repetition/quality signals: token
    count, distinct-token count, the count of the single most frequent
    token, and integer-basis-point ratios (distinct/total, top/total)
    used as repetition filters ('drop docs whose top token exceeds X%
    of the text').

    Shape at scale: explode tokens → two-level partial-agg'd groupBy
    ((doc, token) counts, then per-doc maxima). The corpus text
    shuffles once as (doc_id, token) pairs; every aggregate is
    map-side-combined. Integer bp arithmetic keeps the output
    hash-exact across engines."""
    toks = df.select(F.col(id_col).alias("_id"), F.explode(_tokens(text_col)).alias("_t"))
    per_tok = toks.groupBy("_id", "_t").agg(F.count(F.lit(1)).alias("_c"))
    per_doc = per_tok.groupBy("_id").agg(
        F.sum("_c").alias("ntok"),
        F.count(F.lit(1)).alias("ndistinct"),
        F.max("_c").alias("top_count"),
    )
    ntok = F.greatest(F.col("ntok"), F.lit(1))
    int_bp = lambda num: ((num * 10000 - (num * 10000) % ntok) / ntok).cast("bigint")  # noqa: E731
    return per_doc.select(
        F.col("_id").alias(id_col),
        "ntok",
        "ndistinct",
        "top_count",
        int_bp(F.col("ndistinct")).alias("distinct_bp"),
        int_bp(F.col("top_count")).alias("top_bp"),
    )


def vocab_stats(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus-level vocabulary statistics: total tokens, distinct
    tokens, hapax count (tokens occurring exactly once), and the
    count of the most frequent token. One explode + one partial-agg'd
    groupBy over (token) — the classic word-count shape that scales
    by token-hash partitioning."""
    toks = df.select(F.explode(_tokens(text_col)).alias("_t"))
    per_tok = toks.groupBy("_t").agg(F.count(F.lit(1)).alias("_c"))
    return per_tok.agg(
        F.sum("_c").alias("total_tokens"),
        F.count(F.lit(1)).alias("distinct_tokens"),
        F.sum(F.when(F.col("_c") == 1, 1).otherwise(0)).alias("hapax"),
        F.max("_c").alias("top_token_count"),
    )


def top_ngrams(
    df: DataFrame, text_col: str, n: int = 2, k: int = 20
) -> DataFrame:
    """Corpus-wide top-k word n-grams with a total deterministic order
    (count DESC, gram ASC). n-grams form JVM-side by zipping the token
    array against its own tail (arrays_zip of slices — no interpreted
    lambda), then explode → count → TakeOrderedAndProject: the full
    corpus shuffles only (gram, partial-count) pairs and the top-k
    never materializes a global sort."""
    slices = ", ".join(
        f"slice(_toks, {i + 1}, greatest(size(_toks) - {n - 1}, 0))"
        for i in range(n)
    )
    ex = (
        df.select(_tokens(text_col).alias("_toks"))
        .select(F.explode(F.expr(f"arrays_zip({slices})")).alias("_s"))
        .select(
            F.concat_ws(" ", *[F.col("_s")[str(i)] for i in range(n)]).alias("gram")
        )
    )
    return (
        ex.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("gram"))
        .limit(k)
    )


def chunk_with_overlap(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_tokens: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Context-window chunking: split each document's whitespace-token
    sequence into chunks of ``chunk_tokens`` tokens starting every
    ``stride`` tokens (overlap = chunk_tokens - stride), the standard
    pre-tokenization step for long documents. Emits
    ``(id, chunk_idx, ntok, chunk_text)``; a document shorter than one
    chunk yields exactly one (possibly empty) chunk.

    Shape at scale: a pure scan-side generate — tokenize once, compute
    the chunk count arithmetically, ``explode(sequence(...))`` and
    slice. No shuffle, no UDF; the token array is built once per row
    and every chunk is a JVM ``slice`` of it. Chunk count uses integer
    div so the last chunk is the first whose window reaches the end
    (never an empty trailing chunk)."""
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    base = df.select(
        F.col(id_col).alias("_id"),
        _tokens(text_col).alias("_toks"),
    ).select("_id", "_toks", F.size("_toks").cast("bigint").alias("_n"))
    last_idx = F.expr(
        f"div(greatest(_n - {chunk_tokens}, 0L) + {stride - 1}, {stride})"
    )
    start = F.col("chunk_idx") * stride  # 0-based token offset
    return (
        base.select(
            "_id",
            "_toks",
            "_n",
            F.explode(F.sequence(F.lit(0).cast("bigint"), last_idx)).alias(
                "chunk_idx"
            ),
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("chunk_idx"),
            F.least(F.lit(chunk_tokens).cast("bigint"), F.col("_n") - start)
            .alias("ntok"),
            F.array_join(
                F.slice("_toks", start + 1, F.lit(chunk_tokens)), " "
            ).alias("chunk_text"),
        )
    )


def doc_frequency(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_doc_bp: int = 0,
) -> DataFrame:
    """Token document-frequency table: for every token, the number of
    distinct documents containing it (``df_docs``), its total
    occurrence count, and its document frequency in integer basis
    points — keeping only tokens present in at least ``min_doc_bp``
    bp of documents. With a high threshold this is corpus-driven
    stopword discovery; with 0 it is the IDF table a TF-IDF scorer
    joins against.

    Shape at scale: explode → (token, doc) groupBy → (token) groupBy,
    all partial-agg'd; text shuffles once as (token, doc_id) pairs.
    The total document count is a 1-row broadcast, never a driver
    round-trip inside the plan."""
    from kaflow_spark.functions.textstats import int_div

    toks = df.select(
        F.col(id_col).alias("_id"), F.explode(_tokens(text_col)).alias("token")
    )
    per = toks.groupBy("token", "_id").agg(F.count(F.lit(1)).alias("_c"))
    freq = per.groupBy("token").agg(
        F.count(F.lit(1)).alias("df_docs"), F.sum("_c").alias("total_count")
    )
    tot = df.agg(F.count(F.lit(1)).alias("_ndocs"))
    return (
        freq.crossJoin(F.broadcast(tot))
        .filter(F.col("df_docs") * 10000 >= F.lit(min_doc_bp) * F.col("_ndocs"))
        .select(
            "token",
            "df_docs",
            "total_count",
            int_div(F.col("df_docs") * 10000, F.col("_ndocs")).alias("df_bp"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 3,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document — the keyword/topic signal
    a curation pipeline attaches before domain bucketing. The score is
    *integer-exact* (``tf_count * ndocs * 10000 // (doc_tokens *
    df_docs)`` — raw idf ratio instead of log-idf) so it is
    bit-identical across engines; ties break on token asc. Emits
    ``(id, term_rank, token, tfidf_bp)``.

    Shape at scale (r14 rewrite, measured): ONE explode. The original
    built per-doc totals and document frequencies as separate
    aggregate branches joined back on — isnotnull inference on the
    join keys de-canonicalized the diamond, so the explode + (id,
    token) aggregate ran THREE times (static plan: 3 scans, 3
    Generates) and the vocabulary-sized dfreq broadcast build added a
    wild variance tail. Both statistics are now WINDOW sums over the
    single postings frame — count over the token partition IS the
    document frequency (one row per (doc, token)), sum over the doc
    partition IS the doc length — and the final top-k row_number
    shares the doc-id window's partitioning, so the plan is explode →
    3 exchanges of contracted (id, token, count) triples, no
    vocabulary broadcast anywhere. Interleaved best-of-5 on sf0.1:
    3.03 s → 2.21 s (and the 10-30 s noise-tail samples vanish with
    the broadcast build)."""
    from kaflow_spark.functions.textstats import int_div

    per = (
        fan_out(df, id_col)
        .select(
            F.col(id_col).alias("_id"),
            F.explode(_tokens(text_col)).alias("token"),
        )
        .groupBy("_id", "token")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    wt = Window.partitionBy("token")
    wi = Window.partitionBy("_id")
    ndocs = df.agg(F.count(F.lit(1)).alias("_ndocs"))
    w = Window.partitionBy("_id").orderBy(
        F.col("tfidf_bp").desc(), F.col("token")
    )
    return (
        per.withColumn("_df", F.count(F.lit(1)).over(wt))
        .withColumn("_ntok", F.sum("_c").over(wi))
        .crossJoin(F.broadcast(ndocs))
        .select(
            "_id",
            "token",
            int_div(
                F.col("_c") * F.col("_ndocs") * 10000,
                F.col("_ntok") * F.col("_df"),
            ).alias("tfidf_bp"),
        )
        .withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(
            F.col("_id").alias(id_col),
            F.col("term_rank").cast("bigint").alias("term_rank"),
            "token",
            "tfidf_bp",
        )
    )


def unigram_surprisal(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document mean unigram surprisal in integer basis points — a
    Shannon-style quality/novelty signal: documents made of corpus-rare
    tokens score high, boilerplate scores low. Token surprisal is the
    *exact* floor-log2 of the corpus-total-to-token-count ratio,
    computed as ``length(bin(total // count)) - 1`` — pure integer
    arithmetic that both Spark and DuckDB evaluate bit-identically (no
    libm ``log`` whose last bit could differ across engines). Emits
    ``(id, ntok, bits_bp)`` for every document with >= 1 token;
    ``bits_bp = sum(count * bits) * 10000 // ntok``.

    Shape at scale (r14 rewrite, measured): ONE explode. The original
    joined a per-token totals aggregate back onto the postings frame —
    isnotnull(token) inference de-canonicalized the diamond, so the
    explode re-ran three times above the reused fan-out exchange
    (static plan: 3 Generates). The per-token total is now a WINDOW
    sum over the single postings frame and the grand total a 1-row
    broadcast aggregated straight off the postings exchange
    (ReusedExchange) — no vocabulary-sized aggregate or broadcast at
    all. Interleaved best-of-5 on sf0.1: 2.42 s → 1.03 s (the
    null-safe-join repair of the old shape measured 1.93 s — removing
    the vocab aggregate beats repairing it). Shuffled rows are (id,
    token, count) triples, never text."""
    from kaflow_spark.functions.textstats import int_div

    per = (
        fan_out(df, id_col)
        .select(
            F.col(id_col).alias("_id"),
            F.explode(_tokens(text_col)).alias("token"),
        )
        .groupBy("_id", "token")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    wt = Window.partitionBy("token")
    # least(_c, 2^62) == _c (counts can't reach 2^62) but blocks the
    # sum-over-count collapse that rewrote the grand total as count(*)
    # straight off the explode — splitting the diamond into a second
    # Generate (trap 15 family; plan-asserted back to one explode).
    grand = per.agg(
        F.sum(F.least(F.col("_c"), F.lit(1 << 62))).alias("_g")
    )
    bits = (
        F.length(F.bin(int_div(F.col("_g"), F.col("_tc")))) - 1
    ).cast("bigint")
    return (
        per.withColumn("_tc", F.sum("_c").over(wt))
        .crossJoin(F.broadcast(grand))
        .select("_id", "_c", bits.alias("_bits"))
        .groupBy("_id")
        .agg(
            F.sum("_c").alias("ntok"),
            F.sum(F.col("_c") * F.col("_bits")).alias("_wb"),
        )
        .select(
            F.col("_id").alias(id_col),
            "ntok",
            int_div(F.col("_wb") * 10000, F.col("ntok")).alias("bits_bp"),
        )
    )


def cross_split_pairs(
    pairs: DataFrame,
    splits: DataFrame,
    id_col: str,
    split_col: str = "split",
) -> DataFrame:
    """Train/test leakage report: duplicate (or near-duplicate) pairs
    whose two members landed in *different* splits — the
    decontamination check run after :func:`hash_split` (a near-copy of
    a test document sitting in train silently inflates eval scores).
    ``pairs`` carries ``(id_a, id_b, ...)`` from any dedup pipeline;
    ``splits`` maps ``id_col`` -> ``split_col``. Extra pair columns
    (jaccard, overlap, ...) pass through.

    Shape at scale: the split map is projected to (id, split) — two
    narrow columns, scan-side md5 arithmetic if it comes straight from
    ``hash_split`` — and equi-joined twice on the pair ids. The pairs
    side is the *output* of a dedup pipeline (orders of magnitude
    smaller than the corpus), so AQE broadcasts it; nothing wide ever
    shuffles."""
    s = splits.select(F.col(id_col), F.col(split_col))
    return (
        pairs.join(
            s.select(
                F.col(id_col).alias("id_a"),
                F.col(split_col).alias("split_a"),
            ),
            "id_a",
        )
        .join(
            s.select(
                F.col(id_col).alias("id_b"),
                F.col(split_col).alias("split_b"),
            ),
            "id_b",
        )
        .filter(F.col("split_a") != F.col("split_b"))
    )


def retention_funnel(
    df: DataFrame,
    id_col: str,
    source_col: str,
    text_col: str,
    *,
    min_score_bp: int,
) -> DataFrame:
    """Per-source curation retention funnel: how many documents each
    source contributes in total, after the quality filter, after exact
    dedup (keep the min-id doc per identical text), and after both —
    the report a pipeline operator reads before shipping a corpus.

    Shape at scale: ONE window shuffle on md5(text) decides keepers
    (16-byte keys, never the text), the quality score is scan-side
    integer arithmetic, and the funnel itself is a partial-agg'd
    groupBy(source) of four conditional counters."""
    from kaflow_spark.functions.textstats import quality_score_bp

    w = Window.partitionBy("_h")
    flags = df.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("_id"),
        (quality_score_bp(F.col(text_col)) >= min_score_bp).alias("_okq"),
        F.md5(F.col(text_col)).alias("_h"),
    ).select(
        "source",
        "_okq",
        (F.col("_id") == F.min("_id").over(w)).alias("_keep"),
    )
    cnt = lambda c: F.sum(c.cast("bigint")).alias  # noqa: E731
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            cnt(F.col("_okq"))("n_quality"),
            cnt(F.col("_keep"))("n_unique"),
            cnt(F.col("_okq") & F.col("_keep"))("n_final"),
        )
        .orderBy("source")
    )


def split_counts_exact(df: DataFrame, split_col: str = "split") -> DataFrame:
    """Sanity aggregate for :func:`hash_split`: rows per split (used
    by tests and ops dashboards)."""
    return df.groupBy(split_col).agg(F.count(F.lit(1)).alias("n"))


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int = 8,
    seed: str = "42",
) -> DataFrame:
    """Deterministic corpus shuffle + shard assignment, the write-side
    plan for reproducible training shards: every engine (and every
    rerun) agrees on which shard a document lands in and at which
    position, with no global sort and no single-task global
    row_number.

    Shard id = a band of the leading md5 hex nibble (16 must divide
    evenly into ``n_shards`` bands), so assignment is a pure per-row
    expression of the seeded hash — md5 uniformity concentrates shard
    sizes at N/n_shards. Position = row_number windowed BY SHARD over
    (hash, id), so each shard numbers independently in parallel; the
    only shuffle carries (shard, 32-char hash, id) rows. At 100 TB the
    natural continuation is ``write.partitionBy("shard")``.
    """
    if 16 % n_shards != 0:
        raise ValueError("n_shards must divide 16 (hex-nibble bands)")
    band = 16 // n_shards
    hx = F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(seed)))
    nib = F.instr(F.lit("0123456789abcdef"), F.substring(F.col("_hx"), 1, 1))
    shard = F.floor((nib - 1) / F.lit(band)).cast("bigint")
    w = Window.partitionBy("shard").orderBy(F.col("_hx"), F.col(id_col))
    return (
        df.select(F.col(id_col), hx.alias("_hx"))
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select("shard", "pos", id_col)
    )


def word_gram_array(words_col: str, n: int) -> F.Column:
    """Array of space-joined word n-grams from an ALREADY-MATERIALIZED
    words-array column. The array must be its own projection before
    this is applied — an inline split inside the lambda re-evaluates
    per element (the measured 19x trap, see word_ngrams above). Docs
    with fewer than ``n`` words yield an empty array."""
    w = words_col
    terms = ", ".join(f"{w}[i + {k - 1}]" for k in range(1, n + 1))
    return F.expr(
        f"CASE WHEN size({w}) >= {n} THEN "
        f"transform(sequence(0, size({w}) - {n}), i -> concat_ws(' ', {terms})) "
        "ELSE array() END"
    )


def ngram_surprisal(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Per-document mean word-n-gram surprisal in integer basis points
    — the n-gram-LM generalization of :func:`unigram_surprisal` (n=2
    is the classic bigram LM quality signal: documents whose word
    PAIRS are corpus-rare score high even when every individual word
    is common — garbled or shuffled text lights up here). Surprisal
    per gram is the EXACT floor-log2 of corpus-total/gram-count
    (``length(bin(total // count)) - 1`` — pure integer arithmetic,
    bit-identical across engines, no libm log). Emits
    ``(id, ngrams, bits_bp)`` for documents with >= 1 n-gram;
    ``bits_bp = sum(count * bits) * 10000 // ngrams``.

    Shape at scale (r14 rewrite, measured): ONE explode — the same
    window formulation as :func:`unigram_surprisal`. The original
    joined a per-gram totals aggregate back onto the postings frame;
    isnotnull(gram) inference de-canonicalized the diamond and the
    explode re-ran three times (static plan: 3 Generates). The
    per-gram corpus total is now a WINDOW sum over the single
    postings frame and the grand total a 1-row broadcast off the same
    exchange; the fan-out keeps the gram build parallel on a
    single-split scan (trap 11). Interleaved best-of-5 on sf0.1
    (two runs): 1.44/1.55 s → 1.14/1.23 s, and the vocabulary-sized
    aggregate + join are gone. Shuffled rows are (id, gram, count)
    triples, never text."""
    from kaflow_spark.functions.textstats import int_div

    per = (
        fan_out(df, id_col)
        .select(F.col(id_col).alias("_id"), _tokens(text_col).alias("_w"))
        .select("_id", F.explode(word_gram_array("_w", n)).alias("gram"))
        .groupBy("_id", "gram")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    wt = Window.partitionBy("gram")
    # least(_c, 2^62) == _c but blocks the sum-over-count collapse
    # that would rewrite the grand total as count(*) straight off the
    # explode, splitting the diamond (trap 15 family — see
    # unigram_surprisal).
    grand = per.agg(
        F.sum(F.least(F.col("_c"), F.lit(1 << 62))).alias("_g")
    )
    bits = (
        F.length(F.bin(int_div(F.col("_g"), F.col("_tc")))) - 1
    ).cast("bigint")
    return (
        per.withColumn("_tc", F.sum("_c").over(wt))
        .crossJoin(F.broadcast(grand))
        .select("_id", "_c", bits.alias("_bits"))
        .groupBy("_id")
        .agg(
            F.sum("_c").alias("ngrams"),
            F.sum(F.col("_c") * F.col("_bits")).alias("_wb"),
        )
        .select(
            F.col("_id").alias(id_col),
            "ngrams",
            int_div(F.col("_wb") * 10000, F.col("ngrams")).alias("bits_bp"),
        )
    )


def ngram_diversity(
    df: DataFrame, group_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Per-group n-gram diversity: distinct word-n-grams over total
    word-n-grams in integer basis points — the standard
    repetitiveness/mode-collapse check run per source or per model
    snapshot (a self-BLEU-style signal without the pairwise BLEU
    cost). Low diversity_bp = the group keeps repeating the same
    phrases.

    Shape at scale: explode grams scan-side, then ONE groupBy(group)
    with count + two-phase count_distinct — Spark expands the
    distinct aggregate into (group, gram) partial dedup before the
    final count, so the shuffle carries distinct pairs, never text or
    repeated grams."""
    from kaflow_spark.functions.textstats import int_div

    words = df.select(F.col(group_col), _tokens(text_col).alias("_w"))
    grams = words.select(
        group_col, F.explode(word_gram_array("_w", n)).alias("gram")
    )
    return grams.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("total_ngrams"),
        F.count_distinct(F.col("gram")).cast("bigint").alias("distinct_ngrams"),
        int_div(
            F.count_distinct(F.col("gram")) * 10000, F.count(F.lit(1))
        ).alias("diversity_bp"),
    )


def lexical_retrieval_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    text_col: str,
    qid_col: str,
    qtext_col: str,
    k: int = 3,
) -> DataFrame:
    """Sparse lexical retrieval: top-``k`` corpus documents per query
    by an integer-exact TF-IDF dot product — the text-side analog of
    cosine top-k (and the retrieval step behind lexical decontam /
    RAG-style nearest-text lookups). Per shared term t the
    contribution is ``qtf(t) * dtf(t) * bits(t)^2`` with
    ``bits(t) = length(bin(ndocs // df(t)))`` — an exact floor-log2
    idf (+1), so scores are pure bigint and rank ties break on doc id.
    Self-matches (same id on both sides) are excluded.

    Shape at scale: the corpus postings aggregate (id, token, tf) is
    built once; its exchange feeds BOTH the document-frequency rollup
    and the scoring join (ReusedExchange — the join's token key is
    null-safe so constraint inference cannot split the diamond). The
    query side is assumed small (a benchmark / probe set): its
    weighted postings BROADCAST into the corpus postings, scoring is
    partial-agg'd map-side to (qid, doc_id, score), and the final
    top-k is one window per query id. The corpus never shuffles text
    — only (id, token, tf) triples move."""
    from kaflow_spark.functions.textstats import int_div

    # r15 (guide §3.2/§3.4 — prune the big side before it shuffles):
    # every output value depends only on tokens that appear in a QUERY
    # (scores sum over shared terms; df(t) is read only for those t
    # and its per-token value is corpus-global either way), so a
    # broadcast LEFT SEMI of the corpus token stream against the raw
    # query token instances — BELOW the postings aggregate — drops
    # non-query terms before the corpus's only exchange without
    # changing a single score. The build side is the small probe set's
    # unaggregated tokens (a hash build dedups keys; no distinct
    # needed, which would add an exchange and a trap-15b collapse
    # hazard). The semi-join sits in the SHARED dpost subtree, so the
    # dfreq/scoring diamond still canonicalizes to one exchange.
    qtok = queries.select(F.explode(_tokens(qtext_col)).alias("token"))
    dpost = (
        corpus.filter(F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("_did"), F.explode(_tokens(text_col)).alias("token"))
        .join(F.broadcast(qtok), "token", "left_semi")
        .groupBy("_did", "token")
        .agg(F.count(F.lit(1)).alias("_dtf"))
    )
    # sum(least(_dtf, 1)) == count(*) here (tf >= 1 by construction),
    # but unlike count it makes _dtf's VALUE load-bearing, so the
    # optimizer cannot prune the count function out of the shared
    # dpost aggregate — a pruned keys-only aggregate in this branch
    # would differ canonically from the scoring branch's and the
    # documents explode would run twice (count(_dtf) is rewritten to
    # count(1) and pruned the same way; same failure family as q132's
    # narrow-projection rule; asserted in test_plans).
    dfreq = dpost.groupBy("token").agg(
        F.sum(F.least(F.col("_dtf"), F.lit(1))).alias("_df")
    )
    ndocs = corpus.agg(F.count(F.lit(1)).alias("_ndocs"))
    qpost = (
        queries.select(
            F.col(qid_col).alias("_qid"), F.explode(_tokens(qtext_col)).alias("token")
        )
        .groupBy("_qid", "token")
        .agg(F.count(F.lit(1)).alias("_qtf"))
    )
    bits = F.length(F.bin(int_div(F.col("_ndocs"), F.col("_df")))).cast("bigint")
    qw = (
        # Null-safe on the DFREQ side: a bare token equality would
        # infer isnotnull(token) below dfreq's aggregate and into its
        # copy of dpost, de-canonicalizing the diamond. With the
        # expression on dfreq's side, inference lands on the (cheap,
        # separate-scan) qpost attribute instead.
        qpost.join(
            dfreq.withColumn("_tokf", F.coalesce(F.col("token"), F.lit(""))).drop(
                "token"
            ),
            F.col("_tokf") == F.col("token"),
        )
        .crossJoin(F.broadcast(ndocs))
        .select("_qid", "token", (F.col("_qtf") * bits * bits).alias("_qw"))
    )
    w = Window.partitionBy("_qid").orderBy(F.col("score").desc(), F.col("_did"))
    return (
        dpost.withColumn("_tok", F.coalesce(F.col("token"), F.lit("")))
        .join(
            F.broadcast(qw.withColumn("_tok", F.coalesce(F.col("token"), F.lit("")))).drop(
                "token"
            ),
            "_tok",
        )
        .filter(F.col("_did") != F.col("_qid"))
        .groupBy("_qid", "_did")
        .agg(F.sum(F.col("_qw") * F.col("_dtf")).alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias("query_id"),
            F.col("rank").cast("bigint").alias("rank"),
            F.col("_did").alias(id_col),
            F.col("score").cast("bigint").alias("score"),
        )
    )


def basket_pairs(
    df: DataFrame, basket_col: str, item_col: str
) -> DataFrame:
    """Within-basket item-pair counts — the enumeration stage of
    market-basket / co-occurrence analysis (q145 layers supports and
    lift on top; the scale probe measures this stage directly).
    Distinct (basket, item) rows self-join ON THE BASKET KEY, so the
    pair enumeration is co-partitioned and bounded by basket size
    squared; emits ``(p1, p2, n_both)`` with ``p1 < p2``. A
    pathological basket would need a per-basket cap (the MinHash
    ``max_bucket`` pattern) before this join."""
    dp = (
        df.filter(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .select(F.col(basket_col).alias("_o"), F.col(item_col).alias("_p"))
        .distinct()
    )
    a = dp.select("_o", F.col("_p").alias("p1"))
    b = dp.select("_o", F.col("_p").alias("p2"))
    return (
        a.join(b, "_o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )


__all__ = [
    "contamination_overlaps",
    "quota_per_key",
    "hash_split",
    "hash_split_sql",
    "pack_greedy",
    "pii_scrub",
    "pii_scrub_sql",
    "stratified_sample",
    "stratified_sample_sql",
    "temperature_fractions",
    "repetition_stats",
    "vocab_stats",
    "top_ngrams",
    "chunk_with_overlap",
    "doc_frequency",
    "retention_funnel",
    "tfidf_top_terms",
    "unigram_surprisal",
    "word_gram_array",
    "ngram_surprisal",
    "ngram_diversity",
    "lexical_retrieval_topk",
    "basket_pairs",
    "cross_split_pairs",
    "split_counts_exact",
    "shuffle_shards",
    "PII_PATTERNS",
    "group_shingle_overlap",
    "quantile_normalize",
    "histogram_drift_l1",
    "histogram_drift_vs_ref",
    "winsorized_stats",
    "decontaminate",
    "feature_bucket",
    "dsir_importance",
    "score_separation_auc",
    "k_anonymity_cells",
    "anonymity_generalization",
    "capped_waterfill",
    "benford_deviation",
    "BENFORD_BP",
    "gini_bp",
    "ks_drift_bp",
    "weighted_median",
    "deterministic_sample_k",
    "pmi_collocations",
]


def group_shingle_overlap(
    df: DataFrame, group_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """Exact pairwise Jaccard (integer basis points) between every two
    groups' distinct char-``k``-gram shingle sets — the corpus-overlap
    matrix a mixture audit runs before assigning sampling weights
    (q157). The (group, shingle-hash) frame contracts map-side via
    DISTINCT partial aggregation; one equi-join on the 16-byte
    two-seed hash identity (char_shingle_pairs128, two LONG columns); a
    shingle shared by f groups fans out f² rows with f bounded by the
    number of groups, so total work is linear in corpus size times a
    bounded constant. Returns (group_a, group_b, shared, jaccard_bp)
    for pairs sharing at least one shingle.

    Session side effect: planning this operator sets
    ``spark.sql.mapKeyDedupPolicy=LAST_WIN`` for the WHOLE session
    (see :func:`contamination_overlaps` for the rationale); callers
    relying on the default EXCEPTION policy are affected."""
    g = F.col(group_col)
    # 128-bit two-seed shingle identity: the shared/jaccard counts are
    # REPORTED numbers aggregated over every corpus shingle, so 64-bit
    # birthday collisions would inflate them at ~1e11 distinct
    # shingles (same class as the q96->q124 span-id fix). Carried as
    # TWO long columns end-to-end; per-doc dedup is the O(n) map
    # build (see char_shingle_pairs128 for kernel rationale).
    ensure_map_last_win(df)
    # round-robin fan-out: group_col is LOW-cardinality (sources), so
    # hashing it would collapse the fan-out to |groups| live partitions
    tok = (
        fan_out(df)
        .select(
            g.alias("_grp"),
            F.explode(char_shingle_pairs128(text_col, k)).alias("_h"),
        )
        .select("_grp", F.col("_h.key").alias("_h1"), F.col("_h.value").alias("_h2"))
        .distinct()
    )
    n = tok.groupBy("_grp").agg(F.count("*").alias("_n"))
    a = tok.select(F.col("_grp").alias("group_a"), "_h1", "_h2")
    b = tok.select(F.col("_grp").alias("group_b"), "_h1", "_h2")
    shared = (
        a.join(b, ["_h1", "_h2"])
        .filter(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count("*").alias("shared"))
    )
    na = n.select(F.col("_grp").alias("group_a"), F.col("_n").alias("n_a"))
    nb = n.select(F.col("_grp").alias("group_b"), F.col("_n").alias("n_b"))
    return (
        shared.join(F.broadcast(na), "group_a")
        .join(F.broadcast(nb), "group_b")
        .select(
            "group_a",
            "group_b",
            "shared",
            F.expr("shared * 10000 div (n_a + n_b - shared)").alias(
                "jaccard_bp"
            ),
        )
    )


def quantile_normalize(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Cross-group quantile normalization MAPPING at (group, value)
    grain (q156): a row at its group's p-th percentile is assigned the
    GLOBAL value at that percentile. Returns (group, value,
    src_pct_bp, calib) — callers reattach row-level frames by
    (group, value) equi-join.

    Scale-safe like q136's selector: every rank comes from the bounded
    (group, value) count table, never a global row sort; the
    group-local position maps to a global order-statistic index in
    exact integers ((cume * N) div n + 1), and the global range lookup
    is a broadcast interval join against the tiny global count
    table."""
    from pyspark.sql.window import Window

    cnt = df.groupBy(
        F.col(group_col).alias("_grp"), F.col(value_col).alias("_v")
    ).agg(F.count("*").alias("_c"))
    w_src = (
        Window.partitionBy("_grp")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = cnt.select(
        "_grp",
        "_v",
        (F.sum("_c").over(w_src) - F.col("_c")).alias("_cume"),
        F.sum("_c").over(Window.partitionBy("_grp")).alias("_n"),
    )
    g = cnt.groupBy("_v").agg(F.sum("_c").alias("_gc"))
    w_g = Window.orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gg = g.select(
        "_v",
        "_gc",
        (F.sum("_gc").over(w_g) - F.col("_gc")).alias("_gcume"),
        F.sum("_gc").over(Window.partitionBy()).alias("_gt"),
    )
    s2 = s.join(gg.select("_v", "_gt"), "_v").select(
        "_grp",
        "_v",
        F.expr("(_cume * 10000) div _n").alias("src_pct_bp"),
        F.expr("(_cume * _gt) div _n + 1").alias("_gpos"),
    )
    lookup = gg.select(
        F.col("_v").alias("calib"),
        "_gcume",
        (F.col("_gcume") + F.col("_gc")).alias("_ghi"),
    )
    return (
        s2.join(
            F.broadcast(lookup),
            (F.col("_gpos") > F.col("_gcume"))
            & (F.col("_gpos") <= F.col("_ghi")),
        )
        .select(
            F.col("_grp").alias(group_col),
            F.col("_v").alias(value_col),
            "src_pct_bp",
            "calib",
        )
    )


def histogram_drift_l1(
    df: DataFrame, group_col: str, value_col: str, bucket_width: int = 64
) -> DataFrame:
    """Per-group L1 distance (integer basis points) between the
    group's value histogram and the global one (q158) — the
    distribution-drift monitor for mixture weights. The grid is
    |groups| x |buckets| (both bounded — buckets by the value range,
    not corpus size), built by broadcast cross join so missing
    (group, bucket) cells contribute their full global share instead
    of silently dropping out. Returns (group, n_docs, l1_bp)."""
    b = df.groupBy(
        F.col(group_col).alias("_grp"),
        F.expr(f"`{value_col}` div {bucket_width}").alias("_bucket"),
    ).agg(F.count("*").alias("_c"))
    s = b.groupBy("_grp").agg(F.sum("_c").alias("_t"))
    g = b.groupBy("_bucket").agg(F.sum("_c").alias("_gc"))
    tot = b.agg(F.sum("_c").alias("_gn"))
    grid = (
        s.crossJoin(F.broadcast(g))
        .crossJoin(F.broadcast(tot))
        .join(b, ["_grp", "_bucket"], "left")
        .select(
            "_grp",
            "_t",
            F.coalesce(F.col("_c"), F.lit(0)).alias("_c"),
            "_gc",
            "_gn",
        )
    )
    return (
        grid.groupBy("_grp", "_t")
        .agg(
            F.sum(
                F.abs(
                    F.expr("_c * 10000 div _t") - F.expr("_gc * 10000 div _gn")
                )
            ).alias("_l1")
        )
        .select(
            F.col("_grp").alias(group_col),
            F.col("_t").cast("bigint").alias("n_docs"),
            F.col("_l1").cast("bigint").alias("l1_bp"),
        )
    )


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo_pct: int = 5,
    hi_pct: int = 95,
) -> DataFrame:
    """Per-group winsorized mean (q163): clamp values to the exact
    [p_lo, p_hi] order statistics before averaging — the robust-mean
    companion to the MAD outlier filter (q138), standard for quality
    metrics whose tails are crawl garbage. Returns
    ``(group, n_docs, lo, hi, wmean_c)`` with ``wmean_c`` the clamped
    mean scaled x100, all exact integers.

    Scale shape (the q136/q148 bounded-selector family): every rank
    comes from the (group, value) count table — cumulative windows run
    over that bounded table, the clamp bounds join back to it, and the
    clamped sum is Σ clamp(v)·count — the raw rows are touched exactly
    once, by the initial partial-agg'd groupBy."""
    cnt = df.groupBy(
        F.col(group_col).alias("_grp"), F.col(value_col).alias("_v")
    ).agg(F.count("*").alias("_c"))
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("_grp")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c2 = cnt.select(
        "_grp",
        "_v",
        "_c",
        F.sum("_c").over(w).alias("_cum"),
        F.sum("_c").over(Window.partitionBy("_grp")).alias("_n"),
    )
    # k = ceil(pct * n / 100) as pure integers, 1-based rank
    k_lo = F.expr(f"({lo_pct} * _n + 99) div 100")
    k_hi = F.expr(f"({hi_pct} * _n + 99) div 100")
    bounds = c2.groupBy("_grp").agg(
        F.max("_n").alias("_n"),
        F.min(F.when(F.col("_cum") >= k_lo, F.col("_v"))).alias("_lo"),
        F.min(F.when(F.col("_cum") >= k_hi, F.col("_v"))).alias("_hi"),
    )
    clamped = (
        cnt.join(F.broadcast(bounds), "_grp")
        .groupBy("_grp", "_n", "_lo", "_hi")
        .agg(
            F.sum(
                F.greatest(F.col("_lo"), F.least(F.col("_hi"), F.col("_v")))
                * F.col("_c")
            ).alias("_s")
        )
    )
    return clamped.select(
        F.col("_grp").alias(group_col),
        F.col("_n").cast("bigint").alias("n_docs"),
        F.col("_lo").cast("bigint").alias("lo"),
        F.col("_hi").cast("bigint").alias("hi"),
        F.expr("(_s * 100) div _n").cast("bigint").alias("wmean_c"),
    )


def histogram_drift_vs_ref(
    df: DataFrame,
    ref_hist: DataFrame,
    value_col: str,
    bucket_width: int = 64,
) -> DataFrame:
    """One-row L1 distance (integer bp) between ``df``'s value
    histogram and a PRECOMPUTED reference histogram ``(bucket, rc)``
    — the against-a-baseline sibling of :func:`histogram_drift_l1`
    (which compares groups to their own global). This is the kernel
    the streaming drift monitor runs per micro-batch: the reference
    is computed once from the corpus the mixture weights were fitted
    on, then every arriving batch is scored against it. Buckets
    present on only one side contribute their full share (full outer
    grid). Returns ``(n_docs, l1_bp)``."""
    b = df.groupBy(
        F.expr(f"`{value_col}` div {bucket_width}").alias("_bucket")
    ).agg(F.count("*").alias("_c"))
    r = ref_hist.select(
        F.col("bucket").alias("_bucket"), F.col("rc").alias("_rc")
    )
    grid = b.join(r, ["_bucket"], "full_outer").select(
        F.coalesce(F.col("_c"), F.lit(0)).alias("_c"),
        F.coalesce(F.col("_rc"), F.lit(0)).alias("_rc"),
    )
    tot = grid.agg(
        F.sum("_c").alias("_t"), F.sum("_rc").alias("_rn")
    )
    return (
        grid.crossJoin(F.broadcast(tot))
        .agg(
            F.max("_t").alias("_t"),
            F.sum(
                F.abs(
                    F.expr("_c * 10000 div greatest(_t, 1)")
                    - F.expr("_rc * 10000 div greatest(_rn, 1)")
                )
            ).alias("_l1"),
        )
        .select(
            F.col("_t").cast("bigint").alias("n_docs"),
            F.col("_l1").cast("bigint").alias("l1_bp"),
        )
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    bench_id_col: str,
    bench_text_col: str,
    *,
    method: str = "wordgram",
    min_overlap: int = 8,
    remove: bool = True,
) -> DataFrame:
    """One-call benchmark decontamination — the companion entry point
    to ``dedup.dedup_corpus``: flag (or remove) corpus documents that
    collide with a benchmark suite, by ``method``:

    - ``'chargram'`` — exact char-8-gram inverted-index screen
      (q68's operator; the strictest surface-form match)
    - ``'wordgram'`` — exact word-8-gram screen (q95; the GPT-3-style
      detection semantics, ~6x fewer join rows)

    ``min_overlap`` is the shared-distinct-gram threshold. With
    ``remove=True`` (default) returns ``docs`` minus every flagged
    document (one LEFT ANTI join against the flagged-id set — the
    benchmark side is broadcast throughout, the corpus never
    shuffles); with ``remove=False`` returns the flag frame
    ``(id, bench_id, overlap)`` for reporting. For fuzzy
    (near-miss) decontamination compose a near-dup candidate
    generator with side predicates instead (the q140 pattern:
    ``dedup.minhash_lsh_candidates(side_a=..., side_b=...)`` +
    ``ngram_jaccard_pairs``)."""
    if method == "chargram":
        flags = contamination_overlaps(
            docs, bench, id_col, text_col, bench_id_col, bench_text_col,
            k=8, min_overlap=min_overlap,
        )
    elif method == "wordgram":
        flags = contamination_overlaps_wordgrams(
            docs, bench, id_col, text_col, bench_id_col, bench_text_col,
            n=8, min_overlap=min_overlap,
        )
    else:
        raise ValueError(
            f"unknown method {method!r}: expected chargram|wordgram"
        )
    if not remove:
        return flags
    return docs.join(
        flags.select(id_col).distinct(), [id_col], "left_anti"
    )


def feature_bucket(col: F.Column, buckets: int) -> F.Column:
    """Cross-engine-stable hashed feature id in [0, buckets): the
    first 8 md5 hex chars parsed as an integer, mod ``buckets``.
    md5 (not xxhash64) because the SAME bucket ids must be computable
    in any engine with a lowercase-hex md5() — DuckDB's twin is
    ``CAST('0x' || substring(md5(x), 1, 8) AS BIGINT) % buckets``.
    Pure scan-side projection."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")
        % F.lit(buckets)
    )


def dsir_importance(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: F.Column,
    *,
    n: int = 2,
    buckets: int = 4096,
) -> DataFrame:
    """DSIR-style hashed-n-gram importance weights (Xie et al. 2023,
    *Data Selection for Language Models via Importance Resampling*),
    made integer-exact. ``target`` is a boolean column marking the
    rows that define the target distribution; every document gets a
    weight saying how much more plausible its hashed word-n-gram
    features are under the target distribution than under the rest
    ("raw") — positive = resample toward, negative = away.

    Exactness: per-bucket log-likelihood ratios are quantized to the
    floor-log2 integer idiom (``length(bin(N // c)) - 1``, Laplace
    add-one smoothing) so the weight is pure integer arithmetic —
    deterministic and bit-identical across engines, at 1-bit
    granularity per feature (the resampling RANKING this feeds is
    insensitive to sub-bit precision). Emits ``(id, ngrams,
    dsir_bits, dsir_milli)`` for documents with >= 1 n-gram, where
    ``dsir_bits = sum over gram occurrences of (bits_raw -
    bits_target)`` and ``dsir_milli = dsir_bits * 1000 div ngrams``
    (truncating integer division — identical in Spark ``div`` and
    DuckDB ``//``, CLAUDE.md trap 6).

    Shape at scale: grams explode scan-side into (id, bucket) counts
    — the only large shuffle, short rows, partial-agg'd; the
    per-bucket distribution table is bounded by ``buckets`` (4096
    default) and broadcast back, so the corpus text never shuffles
    and no join side grows with the corpus."""
    from kaflow_spark.functions.textstats import int_div

    words = df.select(
        F.col(id_col).alias("_id"),
        target.alias("_tgt"),
        _tokens(text_col).alias("_w"),
    )
    per = (
        words.select(
            "_id",
            "_tgt",
            F.explode(word_gram_array("_w", n)).alias("_gram"),
        )
        .select("_id", "_tgt", feature_bucket(F.col("_gram"), buckets).alias("_b"))
        .groupBy("_id", "_tgt", "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # Corpus totals ride a single-partition window over the BOUNDED
    # bucket table (<= ``buckets`` rows — the RFM-quintile idiom), not
    # a separate aggregation branch: a third consumer of the gram
    # pipeline would re-run the whole explode/hash chain, because the
    # global-agg branch gets no isnotnull(_b) inference from the join
    # and so de-canonicalizes out of ReusedExchange (the q136 trap).
    # With the window, the plan is one gram chain + one bounded table.
    wtot = Window.partitionBy(F.lit(1))
    dist = (
        per.groupBy(F.col("_b").alias("_b2"))
        .agg(
            F.sum(F.when(F.col("_tgt"), F.col("_c")).otherwise(F.lit(0))).alias(
                "_ct"
            ),
            F.sum(F.when(~F.col("_tgt"), F.col("_c")).otherwise(F.lit(0))).alias(
                "_cr"
            ),
        )
        .withColumn("_nt", F.sum("_ct").over(wtot))
        .withColumn("_nr", F.sum("_cr").over(wtot))
    )

    def _bits(total: F.Column, c: F.Column) -> F.Column:
        return (
            F.length(F.bin(int_div(total + F.lit(buckets), c + F.lit(1)))) - 1
        ).cast("bigint")

    # Null-safe equi-join (the q100/q136 coalesce idiom): _b is never
    # null, but a plain equality makes InferFiltersFromConstraints add
    # isnotnull(_b) to the PROBE branch only (it cannot push below the
    # build side's window), de-canonicalizing the shared gram subtree
    # out of ReusedExchange — the whole explode/hash chain would then
    # run twice. coalesce keeps both subtrees identical; the join stays
    # a broadcast hash join on the coalesced key.
    scored = (
        per.join(
            F.broadcast(dist),
            F.coalesce(F.col("_b"), F.lit(-1))
            == F.coalesce(F.col("_b2"), F.lit(-1)),
        )
        .select(
            "_id",
            "_tgt",
            "_c",
            (_bits(F.col("_nr"), F.col("_cr")) - _bits(F.col("_nt"), F.col("_ct")))
            .alias("_d"),
        )
    )
    return (
        scored.groupBy("_id")
        .agg(
            # a document sits wholly on one side, so max == its flag;
            # emitting it here saves consumers (q175's AUC audit, any
            # resampler) a re-join against the corpus — which would
            # also push isnotnull inference into one branch of the
            # shared gram subtree and double the scan (q136 trap)
            F.max("_tgt").alias("is_target"),
            F.sum("_c").alias("ngrams"),
            F.sum(F.col("_c") * F.col("_d")).alias("dsir_bits"),
        )
        .select(
            F.col("_id").alias(id_col),
            "is_target",
            "ngrams",
            "dsir_bits",
            F.expr("dsir_bits * 1000 div ngrams").alias("dsir_milli"),
        )
    )


def score_separation_auc(
    scores: DataFrame, score_col: str, flag_col: str
) -> DataFrame:
    """Exact Mann-Whitney AUC (midrank tie handling) of an INTEGER
    score separating ``flag_col`` = true rows from false rows, in
    basis points: ``auc_bp = (2*n_gt + n_eq) * 10000 div (2*T*R)``
    where n_gt counts (true, false) pairs with score_true >
    score_false and n_eq ties. AUC 5000 = no separation, 10000 =
    perfect. Pure integer arithmetic over the bounded per-score
    count table — the pairwise O(T*R) definition collapses to one
    groupBy(score) plus a cumulative sum, so the cost is the score
    cardinality, not the pair count. The single-partition window
    runs over that bounded count table only (the RFM-quintile idiom),
    never over row-level data. Emits one row ``(n_flagged, n_rest,
    auc_bp)``."""
    s = F.col(score_col)
    cnt = scores.groupBy(s.alias("_s")).agg(
        F.sum(F.when(F.col(flag_col), 1).otherwise(0)).alias("_t"),
        F.sum(F.when(~F.col(flag_col), 1).otherwise(0)).alias("_r"),
    )
    w = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    cum = cnt.withColumn("_rb", F.coalesce(F.sum("_r").over(w), F.lit(0)))
    return cum.agg(
        F.sum("_t").cast("bigint").alias("n_flagged"),
        F.sum("_r").cast("bigint").alias("n_rest"),
        F.expr(
            "(2 * sum(_t * _rb) + sum(_t * _r)) * 10000"
            " div (2 * sum(_t) * sum(_r))"
        ).alias("auc_bp"),
    )


def k_anonymity_cells(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    k: int = 10,
) -> DataFrame:
    """k-anonymity audit (Sweeney 2002): group the population by its
    quasi-identifier combination and report every cell with fewer than
    ``k`` members — the cells where a QI tuple links to few enough
    individuals to re-identify. Each risky cell also carries the
    l-diversity of ``sensitive_col`` (distinct sensitive values inside
    the cell — a cell can be k-anonymous yet 1-diverse, which leaks
    the sensitive value outright).

    One aggregation over the QI grain (partial-agg'd; the distinct
    count expands to per-cell distinct pairs before the final agg —
    short rows, no text); output is the risky subset only, bounded by
    the QI-space size, never the population."""
    n = F.count(F.lit(1)).alias("n_people")
    l = F.countDistinct(F.col(sensitive_col)).alias("l_distinct")
    return (
        df.groupBy(*qi_cols)
        .agg(n, l)
        .filter(F.col("n_people") < k)
    )


def anonymity_generalization(
    df: DataFrame,
    qi_cols: list[str],
    k: int = 10,
) -> DataFrame:
    """Generalization ladder for k-anonymity repair: for every full-QI
    cell, the minimal suffix-truncation of the quasi-identifier list
    (drop the LAST column first — order ``qi_cols`` most-to-least
    public) at which the cell's population reaches ``k``. Level 0 =
    already k-anonymous at full grain, level i = k reached after
    dropping the last i columns, level ``len(qi_cols)`` = only the
    whole population is big enough.

    Plan: ONE population aggregation to the bounded full-QI cell
    table, then one window sum per coarser grain OVER THAT TABLE —
    the coarser counts never rescan the population (the bounded-table
    window idiom; the widest window is a single partition over the
    cell table, not the data)."""
    cells = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("n_0"))
    out = cells
    for i in range(1, len(qi_cols) + 1):
        keep = qi_cols[:-i]
        w = Window.partitionBy(*keep) if keep else Window.partitionBy(F.lit(1))
        out = out.withColumn(f"n_{i}", F.sum("n_0").over(w))
    level = F.when(F.col("n_0") >= k, 0)
    for i in range(1, len(qi_cols) + 1):
        level = level.when(F.col(f"n_{i}") >= k, i)
    return out.select(
        *qi_cols,
        F.col("n_0").alias("n_people"),
        level.otherwise(len(qi_cols)).cast("int").alias("anon_level"),
    )


def capped_waterfill(
    df: DataFrame,
    key_col: str,
    cap_col: str,
    weight_col: str,
    budget: F.Column,
) -> DataFrame:
    """Capped proportional allocation (water-filling): split an integer
    ``budget`` across the rows proportionally to ``weight_col``, never
    exceeding any row's ``cap_col``. The classic mixture/token-budget
    allocator (and the max-min fairness rule in resource schedulers):
    rows whose fair share exceeds their capacity get exactly their
    capacity, and the freed budget re-spreads over the rest.

    Closed form, no iteration: sorted ascending by cap/weight, the
    capped set is a PREFIX (waterfill monotonicity), so one prefix-sum
    window decides each row's side — ``cap * W_k <= (B - pre_cap) *
    w`` compared by integer cross-multiplication (exact; the only
    float is the IEEE-754 sort ratio, which both engines round
    identically). Uncapped rows get ``(B - sum_capped) * w div
    W_uncapped`` (truncating); the sub-|rows| remainder is reported
    by the caller as slack, never silently re-spread.

    The frame must be BOUNDED (a per-source/per-group stats table,
    not row-level data): every window here is a single partition over
    it — the bounded-table idiom. Keep ``cap * total_weight`` under
    2^63 (rescale weights if capacities are astronomical; ANSI mode
    fails loudly rather than corrupting).

    Emits the input columns plus ``allocation`` and ``capped``."""
    ratio = (F.col(cap_col).cast("double") / F.col(weight_col)).alias("_r")
    d = df.withColumn("_r", ratio).withColumn("_budget", budget)
    order = [F.col("_r"), F.col(key_col)]
    prev = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    whole = Window.partitionBy(F.lit(1))
    d = (
        d.withColumn("_pre_cap", F.coalesce(F.sum(cap_col).over(prev), F.lit(0)))
        .withColumn("_w_from_here",
                    F.sum(weight_col).over(whole)
                    - F.coalesce(F.sum(weight_col).over(prev), F.lit(0)))
        .withColumn(
            "capped",
            F.col(cap_col) * F.col("_w_from_here")
            <= (F.col("_budget") - F.col("_pre_cap")) * F.col(weight_col),
        )
    )
    d = d.withColumn(
        "_capped_c",
        F.coalesce(
            F.sum(F.when(F.col("capped"), F.col(cap_col))).over(whole), F.lit(0)
        ),
    ).withColumn(
        "_w_free",
        F.coalesce(
            F.sum(F.when(~F.col("capped"), F.col(weight_col))).over(whole),
            F.lit(0),
        ),
    )
    alloc = F.when(F.col("capped"), F.col(cap_col)).otherwise(
        F.expr(
            f"(_budget - _capped_c) * {weight_col} div greatest(_w_free, 1)"
        )
    )
    return d.withColumn("allocation", alloc.cast("bigint")).drop(
        "_r", "_budget", "_pre_cap", "_w_from_here", "_capped_c", "_w_free"
    )


# floor(log10(1 + 1/d) * 10^4) for d = 1..9 — Benford's law expected
# first-significant-digit shares in truncated basis points. Constants,
# so both engines use identical integers (no libm log anywhere).
BENFORD_BP: tuple[int, ...] = (3010, 1760, 1249, 969, 791, 669, 579, 511, 457)


def benford_deviation(
    df: DataFrame, group_col: str, cents_col: str
) -> DataFrame:
    """Benford's-law conformance audit per group: L1 distance (in
    basis points) between the group's first-significant-digit
    distribution over positive integer ``cents_col`` amounts and the
    Benford expectation — the classic fraud / fabricated-data screen
    for wide-range financial quantities. First digit extracted from
    the integer's STRING form (exact — no float log10 to drift
    between engines); shares are truncating-integer basis points;
    the expectation is the constant table ``BENFORD_BP``.

    One partial-agg'd aggregation to the bounded (group, digit) count
    table; the digit-share arithmetic runs over that table only."""
    digit = F.substring(F.col(cents_col).cast("string"), 1, 1).cast("int")
    counts = (
        df.filter(F.col(cents_col) > 0)
        .select(F.col(group_col), digit.alias("_d"))
        .groupBy(group_col, "_d")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # densify to the full (group x digit 1-9) grid over the BOUNDED
    # count table: a digit absent from a group still contributes its
    # whole expected share to the distance (share 0), which a join on
    # observed digits alone would silently drop
    grid = (
        counts.groupBy(group_col)
        .agg(F.sum("_c").alias("_n"))
        .select(
            group_col,
            "_n",
            F.explode(F.sequence(F.lit(1), F.lit(9))).alias("_d"),
        )
    )
    shares = grid.join(counts, [group_col, "_d"], "left").withColumn(
        "_share_bp", F.expr("coalesce(_c, 0) * 10000 div _n")
    )
    bench = F.element_at(
        F.array(*[F.lit(v) for v in BENFORD_BP]), F.col("_d")
    )
    return (
        shares.withColumn("_dev", F.abs(F.col("_share_bp") - bench))
        .groupBy(group_col)
        .agg(
            F.max("_n").alias("n_amounts"),
            F.sum("_dev").alias("l1_bp"),
        )
        .select(group_col, "n_amounts", "l1_bp")
    )


def gini_bp(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """Exact Gini coefficient (basis points) of ``value_col`` across
    the members of each group — the inequality audit for corpus
    composition (a source whose token mass sits in a few giant
    documents behaves differently from an even one under sampling,
    chunking, and dedup). Uses the rank formulation
    ``G = (2*sum(i*x_(i)) - (n+1)*sum(x)) / (n*sum(x))`` over values
    sorted ascending with ``id_col`` as the deterministic tie-break —
    pure integer arithmetic until one truncating basis-point
    division.

    Shape: one rank window per group (the same per-group ordered
    shuffle every ranking op pays) over (group, value, id) rows —
    value and id only, never payloads; per-group sums ride the same
    partitioning."""
    wr = Window.partitionBy(group_col).orderBy(value_col, id_col)
    wg = Window.partitionBy(group_col)
    d = (
        df.select(group_col, id_col, value_col)
        .withColumn("_i", F.row_number().over(wr))
        .withColumn("_n", F.count(F.lit(1)).over(wg))
        .withColumn("_t", F.sum(value_col).over(wg))
        .withColumn("_ix", F.sum(F.col("_i") * F.col(value_col)).over(wg))
    )
    return (
        d.groupBy(group_col)
        .agg(
            F.max("_n").alias("n_members"),
            F.max("_t").alias("total_value"),
            F.max("_ix").alias("_ixs"),
        )
        .select(
            group_col,
            "n_members",
            "total_value",
            F.expr(
                "(2 * _ixs - (n_members + 1) * total_value) * 10000"
                " div (n_members * total_value)"
            ).alias("gini_bp"),
        )
    )


def ks_drift_bp(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic (basis points)
    between each group's ``value_col`` distribution and the REST of
    the population — the bucket-free leave-one-out drift check beside
    a fixed-bucket L1 (the KS max is reached at a step of either
    ECDF, so evaluating on the union value grid is exact, no binning
    choice to defend). The statistic is computed cross-multiplied —
    ``D = max |cum_g * n_rest - cum_rest * n_g|`` over the grid,
    reported as ``ks_bp = D * 10000 div (n_g * n_rest)`` — pure
    integers end to end.

    Shape: ONE population aggregation to the (group, value) count
    table; the (group x distinct-value) grid is densified from that
    bounded table (groups x value cardinality, never rows), and the
    cumulative windows partition per group over it."""
    counts = df.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    # densified grid: every group x every distinct value, 0 where absent
    values = counts.select(value_col).distinct()
    groups = counts.groupBy(group_col).agg(F.sum("_c").alias("_ng"))
    grid = groups.crossJoin(F.broadcast(values)).join(
        counts, [group_col, value_col], "left"
    ).withColumn("_c", F.coalesce(F.col("_c"), F.lit(0)))
    # global cumulative over the same value order, from the bounded
    # per-value totals (sum over groups at each value)
    per_value = counts.groupBy(value_col).agg(F.sum("_c").alias("_cv"))
    wv = (
        Window.orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_all = per_value.withColumn("_cum_all", F.sum("_cv").over(wv)).drop("_cv")
    wg = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    n_total = F.sum("_c").over(Window.partitionBy(F.lit(1)))
    stepped = (
        grid.withColumn("_cum_g", F.sum("_c").over(wg))
        .join(F.broadcast(cum_all), value_col)
        .withColumn("_n", n_total)
    )
    d = stepped.withColumn(
        "_d",
        F.abs(
            F.col("_cum_g") * (F.col("_n") - F.col("_ng"))
            - (F.col("_cum_all") - F.col("_cum_g")) * F.col("_ng")
        ),
    )
    return (
        d.groupBy(group_col)
        .agg(
            F.max("_ng").alias("n_group"),
            F.max(F.col("_n") - F.col("_ng")).alias("n_rest"),
            F.max("_d").alias("_dmax"),
        )
        .select(
            group_col,
            "n_group",
            "n_rest",
            F.expr("_dmax * 10000 div (n_group * n_rest)").alias("ks_bp"),
        )
    )


def parallel_cum_weights(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    bucket_div: int = 1 << 16,
) -> DataFrame:
    """Exact per-group INCLUSIVE cumulative weight ordered by value,
    computed bucket-parallel — the shared kernel behind
    :func:`weighted_median` and the r14 wide-grid order-statistic
    rewrites (q265/q247): ``sum(w) over (partition by g order by v)``
    funnels every row of a group through ONE task (a straggler by
    construction on near-unique value domains — orders cents are
    99.8% distinct), whereas this splits the sum into a parallel
    intra-bucket window on ``(group, value div bucket_div)`` plus a
    carry-in from the bounded per-bucket totals grid, broadcast back
    onto the window output (which REUSES the window's exchange — a
    groupBy on the raw rows instead plans its partial agg under a
    second exchange: measured 2 full scans; eqNullSafe on both carry
    keys keeps isnotnull inference from de-canonicalizing the
    diamond, q100/q190).

    Returns the input rows plus ``_cum`` (exact inclusive per-group
    cumulative weight; rows tied on ``value_col`` receive an
    arbitrary-order partial cumulative — consume it only through
    tie-robust selectors, see the equivalence argument in
    :func:`weighted_median`), ``_tw`` (group total weight) and
    ``_tn`` (group row count). Weights must be NON-NEGATIVE (bucket
    totals are read as ``max`` of the monotone cumulative);
    ``value_col`` must be integral (``div`` bucketing — truncation is
    monotone, so negative values order correctly)."""
    bk = F.expr(f"`{value_col}` div {int(bucket_div)}")
    rows = df.withColumn("_bk", bk)
    win = (
        Window.partitionBy(group_col, "_bk")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cw = rows.withColumn("_cw", F.sum(weight_col).over(win))
    bkt = cw.groupBy(group_col, "_bk").agg(
        F.max("_cw").alias("_bw"),
        F.count(F.lit(1)).alias("_bn"),
    )
    wcb = (
        Window.partitionBy(group_col)
        .orderBy("_bk")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wag = Window.partitionBy(group_col)
    carries = (
        bkt.withColumn("_bcum", F.sum("_bw").over(wcb))
        .withColumn("_tw", F.sum("_bw").over(wag))
        .withColumn("_tn", F.sum("_bn").over(wag))
        .select(
            F.col(group_col).alias("_cg"),
            F.col("_bk").alias("_cbk"),
            (F.col("_bcum") - F.col("_bw")).alias("_carry"),
            "_tw",
            "_tn",
        )
    )
    j = cw.join(
        F.broadcast(carries),
        F.col(group_col).eqNullSafe(F.col("_cg"))
        & F.col("_bk").eqNullSafe(F.col("_cbk")),
    )
    return j.select(
        *df.columns,
        (F.col("_cw") + F.col("_carry")).alias("_cum"),
        "_tw",
        "_tn",
    )


def weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    bucket_div: int = 1 << 16,
    grid: bool = False,
) -> DataFrame:
    """Exact weighted median per group, percentile_disc-style: the
    smallest value whose CUMULATIVE WEIGHT reaches half the group's
    total weight (``2*cum_w >= total_w``, integer cross-multiplied —
    no halving division, no interpolation, so the result is an actual
    data value and cannot drift between engines). The volume-weighted
    generalization of the q53 selector.

    Shape (r14 rewrite, measured): the original "(group, value) grid
    rollup + cumulative window per group" paid twice on near-unique
    values — lineitem cents are ~99% distinct, so the grid groupBy was
    a full-table hash aggregate + exchange that contracted NOTHING
    (593,702 grid rows from ~600k inputs), and the per-group window
    then funneled every row into |groups| single tasks (3 for q148 —
    29 of 32 cores idle). This version splits the cumulative sum into
    a PARALLEL intra-bucket window (partitionBy(group, value div
    bucket_div) — one exchange, spread over all cores) plus a
    carry-in computed from the bounded per-bucket totals grid (a few
    hundred rows; its single-task window is trivial) broadcast back.
    Equivalence: intra-bucket cum + carry == global row-grain cum, and
    the row-grain selector picks the same value as the grid selector
    (a partial tie-run prefix crossing the threshold implies the full
    run crosses; min(value) is unchanged) — asserted value-equal on
    lineitem and by the hand/property tests. Interleaved best-of-5 on
    q185's input: grid 2.57 s / row-grain 1.68 s / this 1.41 s; B is
    insensitive 2^16..2^22 locally (1.22-1.31 s). At 100 TB the old
    shape is a straggler by construction (billions of rows through
    |groups| tasks); here no task ever sees more than one bucket.

    Weights must be NON-NEGATIVE (true of every caller: quantities,
    counts, durations) — the carry derivation reads each bucket's
    weight sum as ``max`` of its cumulative sum, which requires a
    monotone cumulative. ``bucket_div`` is the value-domain width per
    parallel bucket —
    keep it a power of two sized so the expected value range spans
    hundreds-to-thousands of buckets (cents and epoch-second domains
    both land well with the 2^16 default); a degenerate single-bucket
    group degrades gracefully to the row-grain shape, never to the
    grid's extra exchange.

    ``grid=True`` keeps the r13 one-exchange shape — a partial-agg'd
    (group, value) weight rollup, then the cumulative window per group
    over the CONTRACTED table. Use it when the caller knows the
    (group, value) domain contracts strongly (q188's (type, gap-secs)
    cells: ~1M gap rows collapse to a small grid, so the per-group
    window input is bounded and the bucket-parallel machinery is pure
    overhead — measured 0.54-0.75x at 10x/30x bench volume in the r15
    scale A/B, while the near-unique lineitem cents domain shows the
    OPPOSITE at 30x: grid old-shape tails of 44-66 s vs 29 s worst for
    the bucket-parallel, OPTIMIZATION_r15.md item 1). Identical
    values either way (both asserted against the same oracles)."""
    if grid:
        counts = df.groupBy(group_col, value_col).agg(
            F.sum(weight_col).alias("_w"),
            F.count(F.lit(1)).alias("_n"),
        )
        wg = Window.partitionBy(group_col)
        wc = (
            Window.partitionBy(group_col)
            .orderBy(value_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = (
            counts.withColumn("_tw", F.sum("_w").over(wg))
            .withColumn("_tn", F.sum("_n").over(wg))
            .withColumn("_cum", F.sum("_w").over(wc))
        )
        return (
            cum.filter(F.col("_cum") * 2 >= F.col("_tw"))
            .groupBy(group_col)
            .agg(
                F.min(value_col).alias("wmedian"),
                F.max("_tn").alias("n_rows"),
                F.max("_tw").alias("total_weight"),
            )
            .select(group_col, "n_rows", "total_weight", "wmedian")
        )
    cum = parallel_cum_weights(
        df.select(group_col, value_col, weight_col),
        group_col,
        value_col,
        weight_col,
        bucket_div,
    )
    return (
        cum.filter(F.col("_cum") * 2 >= F.col("_tw"))
        .groupBy(group_col)
        .agg(
            F.min(value_col).alias("wmedian"),
            F.max("_tn").alias("n_rows"),
            F.max("_tw").alias("total_weight"),
        )
        .select(group_col, "n_rows", "total_weight", "wmedian")
    )


def deterministic_sample_k(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """EXACTLY-k-per-group uniform sample without replacement,
    deterministic and engine-reproducible: rank rows inside each
    group by the md5 of (salt || id) — a uniform random permutation
    under the random-oracle view of md5, frozen by the salt — and
    keep the first ``k``. The fixed-SIZE companion to the hash-
    threshold samplers (stratified_sample's keep-fraction is
    binomial per group; audits and eval sets usually want exactly k).
    Re-running with the same salt reproduces the sample on any
    engine with a lowercase-hex md5; changing the salt redraws it.
    Groups smaller than ``k`` keep all rows.

    Shape: one rank window per group over (group, id) rows — the
    ranking shuffle carries ids only; no RNG state, no seed plumbing,
    no driver involvement."""
    pri = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(pri, id_col)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def weighted_priority_sample_k(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """EXACTLY-k-per-group WEIGHTED sample without replacement,
    deterministic and engine-reproducible — priority / sequential
    Poisson sampling (Ohlsson 1998; Duffield, Lund & Thorup 2007):
    each row draws a salt-frozen uniform u_i (a 60-bit integer off
    md5(salt || id)) and is ranked by the priority key u_i / w_i
    ascending; the k smallest per group win. Inclusion probability is
    approximately proportional to weight (πps) with the exactly-k
    guarantee — the weighted companion to
    :func:`deterministic_sample_k`, and the drawer for the per-source
    budgets the q178 mixture allocator computes.

    Why priority sampling and not Efraimidis–Spirakis A-ES
    (u^(1/w)): A-ES keys need exp(ln(u)/w), and ``ln`` is NOT
    correctly rounded — a measured 1-ULP libm divergence between
    engines (CLAUDE.md trap 13) could flip the rank of two
    near-equal keys. The priority key is ONE IEEE division of exact
    integers (correctly rounded, bit-identical everywhere), so the
    selected set hash-matches across engines with no quantization.
    Rows with weight <= 0 or NULL are excluded (they carry no mass).

    Shape: one hash + divide per row, one rank window per group over
    (group, id, weight) rows — no RNG state, no driver involvement;
    ties (impossible-ish for distinct ids) break on id."""
    # Column API, not an expr() f-string: salt is a bound literal, so a
    # quote inside it cannot break or inject the expression (ADVICE r13)
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    key = u.cast("double") / F.col(weight_col).cast("double")
    w = Window.partitionBy(group_col).orderBy(key, id_col)
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def pmi_collocations(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_count: int = 5,
    top_k: int = 20,
) -> DataFrame:
    """Top positively-associated word bigrams by pointwise mutual
    information — the collocation miner behind tokenizer-merge
    seeding and phrase-vocabulary audits. PMI = log2(p(xy) /
    (p(x) p(y))) with p(xy) = n_xy/M over bigram positions and
    p(x) = n_x/N over token positions; reported as the EXACT
    floor-log2 of the probability ratio (the q89/q133 integer idiom:
    ``length(bin(q)) - 1`` over the exact integral quotient), with
    only positive-PMI pairs (ratio >= 2, i.e. pmi_bits >= 1) emitted
    — the standard collocation report; negative PMI needs a
    different (inverse-ratio) encoding and a different use case.

    Exactness at scale: the ratio's numerator ``n_xy * N^2`` and
    denominator ``M * n_x * n_y`` outgrow int64 around 1e9 tokens, so
    both sides compute in DECIMAL(38,0) (128-bit in both engines;
    Spark's ``div`` on decimals returns the exact integral quotient,
    DuckDB's HUGEINT ``//`` likewise — verified equal).

    Shape at scale (r14 rewrite, measured): ONE explode. The old
    shape exploded the corpus twice (unigram positions and bigram
    strings) and every totals/vocabulary branch re-ran its own copy
    (isnotnull inference on the plain equi-joins de-canonicalized the
    diamond: 4 Generates in the static plan). Now one
    token-with-successor explode (the last token of a document pairs
    with NULL) feeds ONE (t1, t2, count) cell aggregation; unigram
    counts, N and M are all derived FROM that bounded cell table
    (n_x = sum of c over t1 including the null-successor row; M
    drops it), with three guards keeping the diamond canonical:
    ``least(_c, 2^62)`` blocks aggregate-function pruning (trap 15),
    the support filter is the single predicate ``when(t2 notnull, c)
    else 0 >= min_count`` — referencing the aggregated count so it
    cannot push below the cell aggregate and split the explode — and
    the vocabulary joins are null-safe (``<=>``, trap 12) so no
    branch gets an inferred isnotnull on a group key. ``min_count``
    keeps the emitted table support-bounded; ordering (pmi_bits
    DESC, n_xy DESC, w1, w2) is total, so ``top_k`` is
    deterministic."""
    from kaflow_spark.operators.parallelism import fan_out

    words = fan_out(df, id_col).select(
        F.col(id_col).alias("_id"), _tokens(text_col).alias("_w")
    )
    cells = (
        words.select(
            F.explode(
                F.expr(
                    "transform(_w, (x, i) ->"
                    " struct(x AS t1, try_element_at(_w, i + 2) AS t2))"
                )
            ).alias("_p")
        )
        .select(F.col("_p.t1").alias("w1"), F.col("_p.t2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    big = F.lit(1 << 62)
    tot = cells.agg(
        F.sum(F.least(F.col("_c"), big)).alias("_n"),
        F.sum(
            F.when(F.col("w2").isNotNull(), F.least(F.col("_c"), big)).otherwise(
                F.lit(0)
            )
        ).alias("_m"),
    )
    uni = cells.groupBy("w1").agg(
        F.sum(F.least(F.col("_c"), big)).alias("_nw")
    )
    pairs = cells.filter(
        F.when(F.col("w2").isNotNull(), F.col("_c")).otherwise(F.lit(0))
        >= min_count
    ).select("w1", "w2", F.col("_c").alias("n_xy"))
    u1 = uni.select(F.col("w1").alias("_t1k"), F.col("_nw").alias("_n1"))
    u2 = uni.select(F.col("w1").alias("_t2k"), F.col("_nw").alias("_n2"))
    scored = (
        pairs.join(F.broadcast(u1), F.col("w1").eqNullSafe(F.col("_t1k")))
        .join(F.broadcast(u2), F.col("w2").eqNullSafe(F.col("_t2k")))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "_q",
            F.expr(
                "(CAST(n_xy AS DECIMAL(38,0)) * _n * _n)"
                " div (CAST(_m AS DECIMAL(38,0)) * _n1 * _n2)"
            ),
        )
        .filter(F.col("_q") >= 2)
        .select(
            "w1",
            "w2",
            "n_xy",
            (F.length(F.bin(F.col("_q"))) - 1).cast("bigint").alias("pmi_bits"),
        )
    )
    return scored.orderBy(
        F.col("pmi_bits").desc(), F.col("n_xy").desc(), "w1", "w2"
    ).limit(top_k)
