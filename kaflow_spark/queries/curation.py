"""Declared dataset-curation queries (q68-q72, q76-q78, q81-q82,
q84-q90, q95, q98).

The curation stages a training-data pipeline runs between raw corpus
and tokenizer: benchmark-contamination screening, per-domain quota
caps, deterministic train/val/test splitting, sequence packing, PII
scrubbing, Gopher-style repetition filters, corpus vocabulary stats,
top-k n-grams, deterministic stratified sampling, binary metadata,
temperature resampling, context-window chunking, document-frequency /
stopword discovery, the per-source retention funnel, TF-IDF top
terms, unigram-surprisal quality scoring, and the train/test near-dup
leakage report. All are exact/deterministic, so each carries a full
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kaflow_spark.catalog import load
from kaflow_spark.operators.curation import (
    contamination_overlaps,
    contamination_overlaps_wordgrams,
    hash_split,
    hash_split_sql,
    pack_greedy,
    pii_scrub,
    pii_scrub_sql,
    quota_per_key,
    stratified_sample_sql,
)
from kaflow_spark.queries.base import declare

# Fixture benchmark suite: every 97th document stands in for "the
# benchmark questions" — deterministic, ~1% of the corpus, and it
# naturally contains real contamination because the fixture seeds
# near-duplicate documents.
_BENCH_PRED = "doc_id % 97 = 0"
_MIN_OVERLAP = 50


@declare(
    "q68_benchmark_contamination",
    oracle=f"""
    WITH bench AS (
        SELECT doc_id AS bench_id, text FROM documents WHERE {_BENCH_PRED}),
    bg AS (
        SELECT DISTINCT bench_id, substring(text, CAST(i AS INT), 8) AS g
        FROM (SELECT bench_id, text,
                     unnest(range(1, greatest(length(text)-7, 1)+1)) AS i
              FROM bench)),
    dg AS (
        SELECT DISTINCT doc_id, substring(text, CAST(i AS INT), 8) AS g
        FROM (SELECT doc_id, text,
                     unnest(range(1, greatest(length(text)-7, 1)+1)) AS i
              FROM documents))
    SELECT doc_id, bench_id, CAST(COUNT(*) AS BIGINT) AS overlap
    FROM dg JOIN bg USING (g)
    WHERE doc_id <> bench_id
    GROUP BY doc_id, bench_id
    HAVING COUNT(*) >= {_MIN_OVERLAP}
    ORDER BY doc_id, bench_id
    """,
    doc="Benchmark-contamination screen: corpus docs sharing >= 50 "
    "distinct 8-grams with any benchmark item (fixture benchmark = "
    "every 97th doc). Inverted-index join with the benchmark side "
    "broadcast — the corpus never shuffles; the oracle joins raw gram "
    "strings while the plan joins xxhash64 gram hashes (the overlap "
    "count is hash-invariant).",
    tags=("curation", "dedup"),
)
def q68(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    bench = d.filter(F.expr(_BENCH_PRED)).select(
        F.col("doc_id").alias("bench_id"), F.col("text").alias("btext")
    )
    return (
        contamination_overlaps(
            d, bench, "doc_id", "text", "bench_id", "btext",
            k=8, min_overlap=_MIN_OVERLAP,
        )
        .filter(F.col("doc_id") != F.col("bench_id"))
        .orderBy("doc_id", "bench_id")
    )


_WGRAM_N = 8
_WGRAM_MIN = 3  # >= 3 shared 8-word spans (distinct grams)


def _wordgram_sql(id_expr: str, rel: str) -> str:
    """DuckDB word-8-gram relation: same tokenization (trim +
    whitespace split) and gram construction as
    operators/curation.word_ngrams."""
    return f"""
        SELECT DISTINCT {id_expr} AS id, g FROM (
            SELECT {id_expr},
                   unnest(list_transform(
                       range(1, greatest(len(words)-{_WGRAM_N - 1}, 1)+1),
                       j -> array_to_string(
                              list_slice(words, j, j+{_WGRAM_N - 1}), ' '))) AS g
            FROM (SELECT {id_expr},
                         string_split_regex(trim(text), '\\s+') AS words
                  FROM {rel}))"""


@declare(
    "q95_contamination_wordgrams",
    oracle=f"""
    WITH bench AS (
        SELECT doc_id, text FROM documents WHERE {_BENCH_PRED}),
    bg AS ({_wordgram_sql("doc_id", "bench")}),
    dg AS ({_wordgram_sql("doc_id", "documents")})
    SELECT dg.id AS doc_id, bg.id AS bench_id,
           CAST(COUNT(*) AS BIGINT) AS overlap
    FROM dg JOIN bg USING (g)
    WHERE dg.id <> bg.id
    GROUP BY dg.id, bg.id
    HAVING COUNT(*) >= {_WGRAM_MIN}
    ORDER BY doc_id, bench_id
    """,
    doc="Word-8-gram contamination screen (the GPT-3-style n-gram "
    "decontamination shape): both sides explode one gram per WORD "
    "position instead of per character position, ~6x fewer join rows "
    "than exact q68 at the detection semantics the decontamination "
    "literature uses. Hash-free JVM split/slice/join expressions; the "
    "oracle reproduces the exact gram set.",
    tags=("curation", "dedup"),
)
def q95(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    bench = d.filter(F.expr(_BENCH_PRED)).select(
        F.col("doc_id").alias("bench_id"), F.col("text").alias("btext")
    )
    return (
        contamination_overlaps_wordgrams(
            d, bench, "doc_id", "text", "bench_id", "btext",
            n=_WGRAM_N, min_overlap=_WGRAM_MIN,
        )
        .filter(F.col("doc_id") != F.col("bench_id"))
        .orderBy("doc_id", "bench_id")
    )


@declare(
    "q69_quota_per_source",
    oracle="""
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents)
    WHERE rn <= 20 ORDER BY doc_id
    """,
    doc="Per-domain quota sampling: keep the first 20 docs per source "
    "(deterministic doc_id order) — the 'at most N documents per "
    "domain' curation rule as one window shuffle.",
    tags=("curation",),
)
def q69(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").select("doc_id", "source")
    return quota_per_key(d, "source", "doc_id", 20).orderBy("doc_id")


_SPLIT_WEIGHTS = {"train": 0.96, "val": 0.02, "test": 0.02}


@declare(
    "q70_hash_split",
    oracle=f"""
    SELECT doc_id,
           {hash_split_sql("doc_id", _SPLIT_WEIGHTS)} AS split
    FROM documents ORDER BY doc_id
    """,
    doc="Deterministic train/val/test split (96/2/2) off the md5 of "
    "the doc id: stable across runs, engines, partitionings and "
    "cluster sizes — a pure scan-side projection, no shuffle and no "
    "RNG. The oracle runs the portable SQL twin of the same "
    "hex-threshold comparison.",
    tags=("curation",),
)
def q70(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").select("doc_id")
    return hash_split(d, "doc_id", _SPLIT_WEIGHTS).orderBy("doc_id")


@declare(
    "q71_sequence_packing",
    oracle="""
    WITH t AS (
        SELECT doc_id, source,
               CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS ntok
        FROM documents)
    SELECT doc_id, source, ntok,
           CAST(COALESCE(SUM(ntok) OVER (
                    PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                // 2048 AS BIGINT) AS bin_id
    FROM t ORDER BY doc_id
    """,
    doc="Sequence packing: assign docs to ~2048-token training bins, "
    "filling per-source in doc_id order (bin = prefix-sum-before DIV "
    "budget — the deterministic streaming-packing contract). Packing "
    "per shard keeps the window parallel; a global running sum would "
    "serialize one task at 100 TB.",
    tags=("curation",),
)
def q71(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.functions.textstats import quality_components

    d = load(spark, sf, "documents").select(
        "doc_id",
        "source",
        quality_components(F.col("text"))["ntok"].alias("ntok"),
    )
    return pack_greedy(d, "source", "doc_id", "ntok", 2048).orderBy("doc_id")


@declare(
    "q72_pii_scrub",
    oracle=f"""
    SELECT doc_id, {pii_scrub_sql("text")} AS clean_text
    FROM documents ORDER BY doc_id
    """,
    doc="PII scrubbing: emails, IPv4s and phone-like digit runs "
    "replaced by typed placeholders via engine-portable regexes (no "
    "lookaround/backrefs, so Java regex and RE2 agree). Pure "
    "scan-side regexp_replace chain, codegen'd.",
    tags=("curation", "text"),
)
def q72(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "documents")
        .select("doc_id", pii_scrub("text").alias("clean_text"))
        .orderBy("doc_id")
    )


@declare(
    "q76_repetition_stats",
    oracle="""
    WITH tk AS (
        SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS t
        FROM documents),
    pt AS (SELECT doc_id, t, COUNT(*) AS c FROM tk GROUP BY doc_id, t),
    pd AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS ntok,
                  CAST(COUNT(*) AS BIGINT) AS ndistinct,
                  CAST(MAX(c) AS BIGINT) AS top_count
           FROM pt GROUP BY doc_id)
    SELECT doc_id, ntok, ndistinct, top_count,
           (ndistinct * 10000) // GREATEST(ntok, 1) AS distinct_bp,
           (top_count * 10000) // GREATEST(ntok, 1) AS top_bp
    FROM pd ORDER BY doc_id
    """,
    doc="Gopher-style repetition filters: per-doc token count, "
    "distinct tokens, most-frequent-token count, and integer-bp "
    "ratios ('drop docs whose top token exceeds X% of the text'). "
    "Explode + two partial-agg'd groupBys; bp arithmetic keeps it "
    "hash-exact.",
    tags=("curation", "text"),
)
def q76(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.curation import repetition_stats

    d = load(spark, sf, "documents")
    return repetition_stats(d, "doc_id", "text").orderBy("doc_id")


@declare(
    "q77_vocab_stats",
    oracle="""
    WITH tk AS (
        SELECT unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents),
    pt AS (SELECT t, COUNT(*) AS c FROM tk GROUP BY t)
    SELECT CAST(SUM(c) AS BIGINT) AS total_tokens,
           CAST(COUNT(*) AS BIGINT) AS distinct_tokens,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           CAST(MAX(c) AS BIGINT) AS top_token_count
    FROM pt
    """,
    doc="Corpus vocabulary statistics (total/distinct/hapax/top token "
    "counts): the word-count shape — one explode, one token-hash "
    "partitioned groupBy, then a global fold of four counters.",
    tags=("curation", "text"),
)
def q77(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.curation import vocab_stats

    return vocab_stats(load(spark, sf, "documents"), "text")


@declare(
    "q78_top_bigrams",
    oracle="""
    WITH tk AS (
        SELECT regexp_extract_all(text, '\\S+') AS ts FROM documents),
    g AS (
        SELECT unnest(list_transform(range(1, GREATEST(len(ts)-1, 0)+1),
                                     i -> ts[i] || ' ' || ts[i+1])) AS gram
        FROM tk)
    SELECT gram, CAST(COUNT(*) AS BIGINT) AS n
    FROM g GROUP BY gram ORDER BY n DESC, gram LIMIT 20
    """,
    doc="Corpus-wide top-20 word bigrams under a total order (count "
    "DESC, gram ASC — ties at the boundary cannot flap). Bigrams form "
    "JVM-side (arrays_zip of slices, no interpreted lambda); the "
    "corpus shuffles only partial gram counts and the top-k is "
    "TakeOrderedAndProject, never a global sort.",
    tags=("curation", "text"),
)
def q78(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.curation import top_ngrams

    return top_ngrams(load(spark, sf, "documents"), "text", n=2, k=20)


_STRATA_FRACTIONS = {"src0": 0.9, "src1": 0.5, "src2": 0.1}


@declare(
    "q81_stratified_sample",
    oracle=f"""
    SELECT doc_id, source FROM documents
    WHERE {stratified_sample_sql("source", "doc_id", _STRATA_FRACTIONS,
                                 default_fraction=0.25)}
    ORDER BY doc_id
    """,
    doc="Deterministic stratified sampling: per-source keep fractions "
    "(90/50/10%, default 25%) decided by the md5 of the doc id — the "
    "reproducible alternative to sampleBy whose RNG draw depends on "
    "partitioning. Scan-side filter, no shuffle; growing the corpus "
    "never churns previously-kept ids. The oracle runs the portable "
    "SQL twin of the same hex-threshold predicate.",
    tags=("curation",),
)
def q81(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.curation import stratified_sample

    d = load(spark, sf, "documents").select("doc_id", "source")
    return stratified_sample(
        d, "source", "doc_id", _STRATA_FRACTIONS, default_fraction=0.25
    ).orderBy("doc_id")


@declare(
    "q82_binary_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS nbytes,
           md5(CAST(encode(text) AS VARCHAR)) AS payload_md5,
           substring(hex(encode(text)), 1, 16) AS head8_hex
    FROM documents ORDER BY doc_id
    """,
    doc="Binary-column metadata extraction (the oracle-attestable "
    "slice of the multimodal surface): byte length, payload md5, and "
    "the first 8 bytes as hex over an opaque binary payload — here "
    "derived from text with encode() so both engines hold identical "
    "bytes. The real media decode stages (operators/multimodal) run "
    "the same binary columns through mapInPandas and stay "
    "engine-tested; this query attests the JVM-side binary handling "
    "(octet_length/md5/hex never leave codegen).",
    tags=("curation", "multimodal"),
)
def q82(spark: SparkSession, sf: str) -> DataFrame:
    bin_col = F.encode("text", "UTF-8")
    return (
        load(spark, sf, "documents")
        .select(
            "doc_id",
            F.octet_length(bin_col).alias("nbytes"),
            F.md5(bin_col).alias("payload_md5"),
            F.substring(F.hex(bin_col), 1, 16).alias("head8_hex"),
        )
        .orderBy("doc_id")
    )


_CHUNK, _STRIDE = 16, 12


@declare(
    "q85_chunk_overlap",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts FROM documents),
    c AS (
        SELECT doc_id, ts, CAST(len(ts) AS BIGINT) AS n,
               unnest(range(0,
                   (GREATEST(len(ts) - {_CHUNK}, 0) + {_STRIDE - 1})
                   // {_STRIDE} + 1)) AS i
        FROM t)
    SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
           CAST(LEAST({_CHUNK}, n - i*{_STRIDE}) AS BIGINT) AS ntok,
           array_to_string(
               list_slice(ts, CAST(i*{_STRIDE} + 1 AS INT),
                          CAST(i*{_STRIDE} + {_CHUNK} AS INT)), ' ')
               AS chunk_text
    FROM c ORDER BY doc_id, chunk_idx
    """,
    doc=f"Context-window chunking: {_CHUNK}-token chunks every "
    f"{_STRIDE} tokens ({_CHUNK - _STRIDE}-token overlap) — the "
    "pre-tokenization split for long documents. Pure scan-side "
    "generate (tokenize once, explode(sequence), JVM slice); no "
    "shuffle, no UDF.",
    tags=("curation", "text"),
)
def q85(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.curation import chunk_with_overlap

    d = load(spark, sf, "documents")
    return chunk_with_overlap(
        d, "doc_id", "text", chunk_tokens=_CHUNK, stride=_STRIDE
    ).orderBy("doc_id", "chunk_idx")


@declare(
    "q86_doc_frequency",
    oracle="""
    WITH tk AS (
        SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token
        FROM documents),
    per AS (SELECT token, doc_id, COUNT(*) AS c FROM tk GROUP BY token, doc_id),
    freq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df_docs,
                    CAST(SUM(c) AS BIGINT) AS total_count
             FROM per GROUP BY token),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS ndocs FROM documents)
    SELECT token, df_docs, total_count, (df_docs*10000) // ndocs AS df_bp
    FROM freq, tot WHERE df_docs * 10000 >= 2500 * ndocs
    ORDER BY df_docs DESC, token
    """,
    doc="Token document-frequency table filtered to tokens present in "
    ">= 25% of documents — corpus-driven stopword discovery, and the "
    "IDF side of a TF-IDF scorer. Explode + two partial-agg'd "
    "groupBys; the corpus-size denominator is a 1-row broadcast, not "
    "a driver round-trip.",
    tags=("curation", "text"),
)
def q86(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.curation import doc_frequency

    d = load(spark, sf, "documents")
    return doc_frequency(d, "doc_id", "text", min_doc_bp=2500).orderBy(
        F.col("df_docs").desc(), "token"
    )


_FUNNEL_MIN_BP = 8500


def _score_sql(stop_pat: str) -> str:
    return (
        "(len(regexp_extract_all(text, '[A-Za-z]'))*10000)"
        " // GREATEST(LENGTH(text), 1)"
        f" + (len(regexp_extract_all(lower(text), '{stop_pat}'))*10000)"
        " // GREATEST(len(regexp_extract_all(text, '\\S+')), 1)"
        " - (len(regexp_extract_all(text, '[.,!?;:]'))*10000)"
        " // GREATEST(LENGTH(text), 1)"
        " - (len(regexp_extract_all(text, '[0-9]'))*10000)"
        " // GREATEST(LENGTH(text), 1)"
    )


def _funnel_oracle() -> str:
    from kaflow_spark.functions.textstats import LANG_STOPWORDS

    return f"""
    WITH f AS (
        SELECT source,
               ({_score_sql(LANG_STOPWORDS["en"])}) >= {_FUNNEL_MIN_BP} AS okq,
               doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep
        FROM documents)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN okq THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
           CAST(SUM(CASE WHEN okq AND keep THEN 1 ELSE 0 END) AS BIGINT)
               AS n_final
    FROM f GROUP BY source ORDER BY source
    """


@declare(
    "q87_retention_funnel",
    oracle=_funnel_oracle(),
    doc="Per-source curation retention funnel: total docs, docs "
    "passing the quality filter (score_bp >= 8500 — the corpus "
    "median), docs surviving exact dedup (min-id keeper per identical "
    "text), and the intersection — the report read before shipping a "
    "corpus. One window shuffle on md5(text) (16-byte keys, never the "
    "text), then a partial-agg'd groupBy(source) of four conditional "
    "counters.",
    tags=("curation", "text", "dedup"),
)
def q87(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.curation import retention_funnel

    d = load(spark, sf, "documents")
    return retention_funnel(
        d, "doc_id", "source", "text", min_score_bp=_FUNNEL_MIN_BP
    )


def _q84_fractions(sf: str) -> dict[str, float]:
    """Per-source counts read driver-side (pyarrow) -> temperature
    fractions. In production the counts come from yesterday's stats
    table; the fixture derives them from the corpus the same way
    _fixture_query_vec derives the ANN query vector. Counts are
    sorted by source so the float sum of shares accumulates in the
    same order as the oracle's list_aggregate fold."""
    from collections import Counter

    import pyarrow.dataset as ds

    from kaflow_spark.operators.curation import temperature_fractions

    t = ds.dataset(f"{sf}/documents.parquet").to_table(columns=["source"])
    counts = Counter(t["source"].to_pylist())
    return temperature_fractions(
        dict(sorted(counts.items())), alpha=0.5, target_total=len(t) // 2
    )


@declare(
    "q84_temperature_resample",
    oracle="""
    WITH cnt AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cnt),
    z AS (SELECT list_aggregate(list(POWER(CAST(c AS DOUBLE), 0.5)
                                     ORDER BY source), 'sum') AS z
          FROM cnt),
    th AS (
        SELECT source,
               printf('%08x', CAST(FLOOR(
                   LEAST(1.0,
                         POWER(CAST(c AS DOUBLE), 0.5) / z.z
                         * CAST(n // 2 AS DOUBLE) / CAST(c AS DOUBLE))
                   * 4294967296.0) AS BIGINT)) AS t
        FROM cnt, z, tot)
    SELECT d.doc_id, d.source
    FROM documents d JOIN th USING (source)
    WHERE substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < th.t
    ORDER BY d.doc_id
    """,
    doc="Temperature-based mixture resampling (count^0.5 shares, "
    "target = half the corpus): the LLM data-mixing trick that "
    "up-weights small domains. Per-source keep fractions are plain "
    "driver arithmetic over the (tiny) per-source counts, then the "
    "resample is the deterministic md5-threshold stratified_sample — "
    "shuffle-free and stable across runs. The oracle recomputes the "
    "identical fractions in SQL with the share sum folded in the "
    "same sorted-source order, so even the float arithmetic agrees.",
    tags=("curation",),
)
def q84(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.curation import stratified_sample

    d = load(spark, sf, "documents").select("doc_id", "source")
    return stratified_sample(
        d, "source", "doc_id", _q84_fractions(sf), default_fraction=0.0
    ).orderBy("doc_id")


@declare(
    "q88_tfidf_top_terms",
    oracle="""
    WITH tk AS (
        SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token
        FROM documents),
    per AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS c
            FROM tk GROUP BY doc_id, token),
    nt AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS ntok
           FROM per GROUP BY doc_id),
    dfq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS dfd
            FROM per GROUP BY token),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS ndocs FROM documents),
    sc AS (
        SELECT per.doc_id, per.token,
               (per.c * tot.ndocs * 10000) // (nt.ntok * dfq.dfd)
                   AS tfidf_bp
        FROM per JOIN nt USING (doc_id) JOIN dfq USING (token), tot),
    rk AS (
        SELECT doc_id, token, tfidf_bp,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf_bp DESC, token)
                   AS term_rank
        FROM sc)
    SELECT doc_id, CAST(term_rank AS BIGINT) AS term_rank, token, tfidf_bp
    FROM rk WHERE term_rank <= 3 ORDER BY doc_id, term_rank
    """,
    doc="Top-3 TF-IDF terms per document — the keyword signal a "
    "curation pipeline attaches before domain bucketing. Score is "
    "integer-exact (count*ndocs*10000 // (doc_tokens*df_docs), raw "
    "idf ratio instead of log-idf) so it hash-matches across engines. "
    "One explode; the (id, token) count frame feeds both rollups; "
    "corpus size is a 1-row broadcast; top-k is one window.",
    tags=("curation", "text"),
)
def q88(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.curation import tfidf_top_terms

    d = load(spark, sf, "documents")
    return tfidf_top_terms(d, "doc_id", "text", k=3).orderBy(
        "doc_id", "term_rank"
    )


@declare(
    "q89_unigram_surprisal",
    oracle="""
    WITH tk AS (
        SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token
        FROM documents),
    per AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS c
            FROM tk GROUP BY doc_id, token),
    tc AS (SELECT token, CAST(SUM(c) AS BIGINT) AS tc
           FROM per GROUP BY token),
    g AS (SELECT CAST(SUM(tc) AS BIGINT) AS g FROM tc),
    b AS (
        SELECT per.doc_id, per.c,
               CAST(LENGTH(bin(g.g // tc.tc)) - 1 AS BIGINT) AS bits
        FROM per JOIN tc USING (token), g)
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS ntok,
           (CAST(SUM(c * bits) AS BIGINT) * 10000)
               // CAST(SUM(c) AS BIGINT) AS bits_bp
    FROM b GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Per-document mean unigram surprisal (basis points) — the "
    "Shannon-style rarity/quality signal: rare-token documents score "
    "high, boilerplate low. Token surprisal is the EXACT floor-log2 "
    "of corpus_total/token_count via length(bin(total // count)) - 1 "
    "— pure integer arithmetic, no libm log to drift between "
    "engines. (id, token) counts computed once; grand total is a "
    "1-row broadcast.",
    tags=("curation", "text"),
)
def q89(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.curation import unigram_surprisal

    d = load(spark, sf, "documents")
    return unigram_surprisal(d, "doc_id", "text").orderBy("doc_id")


# Leakage-check split: coarser than q70's 96/2/2 so the fixture's
# ~25 near-dup pairs actually cross splits (P(cross) = 1 - 0.5^2 -
# 0.25^2 - 0.25^2 = 0.625 per pair vs 0.078 under 96/2/2).
_LEAK_WEIGHTS = {"train": 0.50, "val": 0.25, "test": 0.25}


def _q90_oracle() -> str:
    from kaflow_spark.queries.llm import EXACT_JACCARD_CTE

    split_expr = hash_split_sql("doc_id", _LEAK_WEIGHTS)
    return f"""
    WITH {EXACT_JACCARD_CTE},
    s AS (SELECT doc_id, {split_expr} AS split FROM documents)
    SELECT p.id_a, p.id_b, sa.split AS split_a, sb.split AS split_b
    FROM p
    JOIN s sa ON p.id_a = sa.doc_id
    JOIN s sb ON p.id_b = sb.doc_id
    WHERE p.jaccard >= 0.9 AND sa.split <> sb.split
    ORDER BY id_a, id_b
    """


@declare(
    "q90_split_leakage",
    oracle=_q90_oracle(),
    doc="Train/test near-dup leakage: verified near-duplicate pairs "
    "(q41's MinHash-LSH + exact >= 0.9 Jaccard verify) whose members "
    "hash_split into different splits — the decontamination report "
    "run after splitting. The split map is scan-side md5 arithmetic; "
    "the pair frame (a dedup pipeline's output, tiny vs the corpus) "
    "joins it twice on ids, so AQE broadcasts the pairs and nothing "
    "wide shuffles. Oracle = brute-force O(n²) Jaccard + the same "
    "portable split CASE.",
    tags=("quadratic-oracle", "curation", "dedup"),
)
def q90(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.curation import cross_split_pairs
    from kaflow_spark.operators.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
        shingle_frame,
    )

    d = load(spark, sf, "documents")
    sh = shingle_frame(d, "doc_id", "text", 5)
    cand = (
        minhash_lsh_candidates(d, "doc_id", "text", min_bands=2, shingles=sh)
        .filter(F.col("est_jaccard") >= 0.7)
        .select("id_a", "id_b")
    )
    pairs = (
        ngram_jaccard_pairs(d, cand, "doc_id", "text", shingles=sh)
        .filter(F.col("jaccard") >= 0.9)
        .select("id_a", "id_b")
    )
    splits = hash_split(d.select("doc_id"), "doc_id", _LEAK_WEIGHTS)
    return cross_split_pairs(pairs, splits, "doc_id").select(
        "id_a", "id_b", "split_a", "split_b"
    ).orderBy("id_a", "id_b")


@declare(
    "q98_length_histogram",
    oracle="""
    WITH n AS (
        SELECT source,
               CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS ntok
        FROM documents)
    SELECT source,
           CAST(LENGTH(bin(ntok)) - 1 AS BIGINT) AS log2_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(ntok) AS BIGINT) AS min_tok,
           CAST(MAX(ntok) AS BIGINT) AS max_tok,
           CAST(SUM(ntok) AS BIGINT) AS tok_sum
    FROM n GROUP BY source, log2_bucket ORDER BY source, log2_bucket
    """,
    doc="Sequence-length distribution: per-source histogram of "
    "whitespace token counts in power-of-two buckets (exact floor-log2 "
    "via length(bin(n))-1, the q89 integer trick) — the pre-packing / "
    "pre-training length diagnostic that sizes context windows and "
    "packing budgets. One partial-agg'd groupBy; shuffle volume is "
    "|sources| x |buckets|, independent of corpus size.",
    tags=("curation", "text"),
)
def q98(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.functions.textstats import token_count_ws

    d = load(spark, sf, "documents")
    ntok = token_count_ws("text").cast("bigint")
    bucket = (F.length(F.bin(ntok)) - 1).cast("bigint")
    return (
        d.select("source", ntok.alias("ntok"), bucket.alias("log2_bucket"))
        .groupBy("source", "log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("ntok").alias("min_tok"),
            F.max("ntok").alias("max_tok"),
            F.sum("ntok").alias("tok_sum"),
        )
        .orderBy("source", "log2_bucket")
    )


@declare(
    "q120_shuffle_shards",
    oracle="""
    WITH h AS (
        SELECT doc_id,
               md5(CAST(doc_id AS VARCHAR) || ':42') AS hx
        FROM documents),
    s AS (
        SELECT doc_id, hx,
               CAST(floor((strpos('0123456789abcdef',
                                  substring(hx, 1, 1)) - 1) / 2)
                    AS BIGINT) AS shard
        FROM h)
    SELECT shard,
           CAST(row_number() OVER (PARTITION BY shard
                                   ORDER BY hx, doc_id) AS BIGINT) AS pos,
           doc_id
    FROM s ORDER BY shard, pos
    """,
    doc="Deterministic corpus shuffle + 8-way shard assignment (the "
    "reproducible data-loader permutation): shard = leading-nibble "
    "band of a seeded md5, a pure per-row expression; position = "
    "row_number windowed BY SHARD over (hash, id) so shards number "
    "independently in parallel. No global sort, no single-task "
    "window; the one shuffle carries (shard, hash, id) rows. md5 hex "
    "agrees byte-for-byte between Spark and DuckDB.",
    tags=("curation", "training"),
)
def q120(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.curation import shuffle_shards

    d = load(spark, sf, "documents")
    return shuffle_shards(d, "doc_id", n_shards=8, seed="42").orderBy(
        "shard", "pos"
    )


@declare(
    "q133_bigram_surprisal",
    oracle="""
    WITH w AS (
        SELECT doc_id, regexp_extract_all(text, '\\S+') AS w
        FROM documents),
    bi AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w)),
                                     i -> w[i] || ' ' || w[i + 1])) AS gram
        FROM w WHERE len(w) >= 2),
    per AS (SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS c
            FROM bi GROUP BY doc_id, gram),
    tc AS (SELECT gram, CAST(SUM(c) AS BIGINT) AS tc
           FROM per GROUP BY gram),
    g AS (SELECT CAST(SUM(tc) AS BIGINT) AS g FROM tc),
    b AS (
        SELECT per.doc_id, per.c,
               CAST(LENGTH(bin(g.g // tc.tc)) - 1 AS BIGINT) AS bits
        FROM per JOIN tc USING (gram), g)
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS ngrams,
           (CAST(SUM(c * bits) AS BIGINT) * 10000)
               // CAST(SUM(c) AS BIGINT) AS bits_bp
    FROM b GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Per-document mean BIGRAM surprisal (basis points) — the "
    "2-gram-LM quality signal q89 can't see: shuffled or garbled "
    "text whose individual words are common still has corpus-rare "
    "word PAIRS, so it scores high here. Same exact floor-log2 "
    "integer formulation (length(bin(total // count)) - 1, no libm); "
    "bigrams are built map-side from the materialized words array "
    "(inline split in the lambda would re-split per element — the "
    "measured 19x trap). The (id, gram) count frame feeds both the "
    "corpus totals and the per-doc rollup; shuffles carry (gram, "
    "count) pairs, never text.",
    tags=("curation", "text"),
)
def q133(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.curation import ngram_surprisal

    d = load(spark, sf, "documents")
    return ngram_surprisal(d, "doc_id", "text", n=2).orderBy("doc_id")


@declare(
    "q134_ngram_diversity",
    oracle="""
    WITH w AS (
        SELECT source, regexp_extract_all(text, '\\S+') AS w
        FROM documents),
    tri AS (
        SELECT source,
               unnest(list_transform(range(1, len(w) - 1),
                      i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS gram
        FROM w WHERE len(w) >= 3)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS total_ngrams,
           CAST(COUNT(DISTINCT gram) AS BIGINT) AS distinct_ngrams,
           (CAST(COUNT(DISTINCT gram) AS BIGINT) * 10000) // COUNT(*)
               AS diversity_bp
    FROM tri GROUP BY source ORDER BY source
    """,
    doc="Per-source word-3-gram diversity (distinct/total in basis "
    "points) — the repetitiveness / mode-collapse check run per "
    "source or per generator snapshot; a self-BLEU-style signal "
    "without the O(n²) pairwise cost. Plan: grams explode scan-side, "
    "then one groupBy(source) whose count_distinct expands to a "
    "(source, gram) partial dedup before the final count — the "
    "shuffle carries distinct pairs, never repeated grams or text.",
    tags=("curation", "text"),
)
def q134(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.curation import ngram_diversity

    d = load(spark, sf, "documents")
    return ngram_diversity(d, "source", "text", n=3).orderBy("source")


@declare(
    "q135_lexical_retrieval_topk",
    oracle="""
    WITH dpost AS (
        SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS dtf
        FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token
              FROM documents) t
        GROUP BY doc_id, token),
    dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
              FROM dpost GROUP BY token),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS ndocs FROM documents),
    qpost AS (
        SELECT doc_id AS qid, token, CAST(COUNT(*) AS BIGINT) AS qtf
        FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token
              FROM documents WHERE doc_id % 97 = 0) t
        GROUP BY doc_id, token),
    qw AS (
        SELECT qid, qpost.token,
               qtf * CAST(LENGTH(bin(nd.ndocs // df)) AS BIGINT)
                   * CAST(LENGTH(bin(nd.ndocs // df)) AS BIGINT) AS qwt
        FROM qpost JOIN dfreq USING (token), nd),
    sc AS (
        SELECT qid, dpost.doc_id, CAST(SUM(qwt * dtf) AS BIGINT) AS score
        FROM dpost JOIN qw USING (token)
        WHERE dpost.doc_id <> qid
        GROUP BY qid, dpost.doc_id),
    r AS (SELECT qid, doc_id, score,
                 ROW_NUMBER() OVER (PARTITION BY qid
                                    ORDER BY score DESC, doc_id) AS rnk
          FROM sc)
    SELECT qid AS query_id, CAST(rnk AS BIGINT) AS rank, doc_id, score
    FROM r WHERE rnk <= 3
    ORDER BY query_id, rank
    """,
    doc="Sparse lexical retrieval (BM25-family): top-3 corpus docs per "
    "probe query by an integer-exact TF-IDF dot product — the "
    "text-side analog of q38's cosine top-k and the retrieval step "
    "behind lexical decontamination and RAG-style lookups. Term "
    "weight = exact floor-log2 idf squared; scores are pure bigint "
    "(rank ties break on doc_id), so the oracle hashes exactly. "
    "Plan: corpus postings aggregate built ONCE (its exchange feeds "
    "both the document-frequency rollup and the scoring join — "
    "null-safe token key keeps the diamond canonical), and (r15) the "
    "corpus token stream is pruned to QUERY terms by a broadcast "
    "LEFT SEMI below that exchange — score-preserving, since scores "
    "and the df reads only ever touch shared terms; the small "
    "query side broadcasts weighted postings into the corpus, "
    "scoring partial-aggs map-side to (query, doc, score), one "
    "window per query for the top-k. Corpus text never shuffles.",
    tags=("curation", "text", "similarity"),
)
def q135(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.curation import lexical_retrieval_topk

    d = load(spark, sf, "documents")
    q = d.filter(F.col("doc_id") % 97 == 0)
    return lexical_retrieval_topk(d, q, "doc_id", "text", "doc_id", "text", k=3).orderBy(
        "query_id", "rank"
    )


@declare(
    "q142_readability_grade",
    oracle="""
    WITH c AS (
        SELECT doc_id, source,
               GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+'))
                             AS BIGINT), 1) AS sentences,
               GREATEST(CAST(len(regexp_extract_all(text, '\\S+'))
                             AS BIGINT), 1) AS words,
               CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
                    AS BIGINT) AS syllables
        FROM documents),
    g AS (SELECT doc_id, source,
                 390 * (words // sentences)
                 + 11800 * (syllables // words) - 15590 AS grade_milli
          FROM c)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(grade_milli) AS BIGINT) AS min_grade_milli,
           CAST(MAX(grade_milli) AS BIGINT) AS max_grade_milli,
           CAST(SUM(grade_milli) AS BIGINT) AS sum_grade_milli
    FROM g GROUP BY source ORDER BY source
    """,
    doc="Per-source readability profile — Flesch-Kincaid-style grade "
    "level as the education/complexity curation signal (the "
    "FineWeb-Edu-style filter axis), in the q35 exactness "
    "discipline: regexp run counts + exact floor division only, so "
    "the integer grade is engine-reproducible (a floor-biased "
    "variant of the float FK formula, identically biased on both "
    "engines). The per-source rollup reports exact (n, min, max, "
    "sum) — mean = sum/n is the caller's one division. Plan: one "
    "scan-side projection of three regexp counts, one partial-agg'd "
    "groupBy of |sources| rows.",
    tags=("curation", "text"),
)
def q142(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.functions.textstats import readability_grade_milli

    d = load(spark, sf, "documents")
    return (
        d.select("source", readability_grade_milli(F.col("text")).alias("g"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("g").cast("bigint").alias("min_grade_milli"),
            F.max("g").cast("bigint").alias("max_grade_milli"),
            F.sum("g").cast("bigint").alias("sum_grade_milli"),
        )
        .orderBy("source")
    )
