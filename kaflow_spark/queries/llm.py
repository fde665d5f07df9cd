"""Declared LLM-data-pipeline queries (SURVEY §2B north-star set).

Deterministic operators carry full DuckDB oracles (token counting,
quality scoring, language id, fingerprinting, brute-force cosine
top-k, as-of join). The LSH-approximate operators (MinHash, SimHash,
embedding near-dup, ANN) are declared rows-only — their semantics are
engine-tested in tests/test_operators.py instead (SURVEY marks them
not-oracle-checked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kaflow_spark.catalog import load
from kaflow_spark.functions.textstats import (
    BPE_PATTERN,
    LANG_STOPWORDS,
    fingerprint,
    lang_id,
    quality_components,
    quality_score_bp,
    token_count_bpe,
)
from kaflow_spark.operators.asof import asof_join
from kaflow_spark.operators.dedup import (
    embedding_near_dups,
    minhash_lsh_candidates,
    simhash_near_dups,
)
from kaflow_spark.operators.similarity import ann_topk, cosine_topk
from kaflow_spark.queries.base import declare

_SQL_BPE = BPE_PATTERN.replace("'", "''")


@declare(
    "q34_token_count_bpe",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_SQL_BPE}')) AS INT) AS ntok_bpe
    FROM documents ORDER BY doc_id
    """,
    doc="BPE-ish token counting via a GPT-2-style regex, JVM-side.",
    tags=("text",),
)
def q34(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "documents")
        .select("doc_id", token_count_bpe("text").alias("ntok_bpe"))
        .orderBy("doc_id")
    )


def _quality_oracle() -> str:
    stop = LANG_STOPWORDS["en"].replace("\\", "\\")
    return f"""
    WITH c AS (
      SELECT doc_id,
             CAST(LENGTH(text) AS BIGINT) AS nch,
             CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS ntok,
             CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS alpha,
             CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digit,
             CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS punct,
             CAST(len(regexp_extract_all(lower(text), '{stop}')) AS BIGINT) AS stop
      FROM documents)
    SELECT doc_id, nch, ntok, alpha, digit, punct, stop,
           CAST( (alpha*10000) // GREATEST(nch,1)
               + (stop*10000)  // GREATEST(ntok,1)
               - (punct*10000) // GREATEST(nch,1)
               - (digit*10000) // GREATEST(nch,1) AS BIGINT) AS score_bp
    FROM c ORDER BY doc_id
    """


@declare(
    "q35_text_quality",
    oracle=_quality_oracle(),
    doc="Document quality heuristic: integer-basis-point arithmetic "
    "(no float division) so the oracle reproduces it exactly.",
    tags=("text",),
)
def q35(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    comps = quality_components(F.col("text"))
    return d.select(
        "doc_id",
        *[c.alias(n) for n, c in comps.items()],
        quality_score_bp(F.col("text")).alias("score_bp"),
    ).orderBy("doc_id")


def _langid_oracle() -> str:
    structs = ", ".join(
        "{'score': CAST(len(regexp_extract_all(lower(text), '%s')) AS BIGINT),"
        " 'lang': '%s'}" % (pat, lang)
        for lang, pat in sorted(LANG_STOPWORDS.items())
    )
    return f"""
    SELECT doc_id,
           CASE WHEN (list_aggregate([{structs}], 'max')).score <= 0 THEN 'und'
                ELSE (list_aggregate([{structs}], 'max')).lang END AS lang_pred
    FROM documents ORDER BY doc_id
    """


@declare(
    "q36_lang_id",
    oracle=_langid_oracle(),
    doc="Stopword-heuristic language id (argmax over per-language hit "
    "counts, struct-max tie-break).",
    tags=("text",),
)
def q36(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "documents")
        .select("doc_id", lang_id("text").alias("lang_pred"))
        .orderBy("doc_id")
    )


@declare(
    "q37_doc_fingerprint",
    oracle="""
    SELECT doc_id,
           CASE WHEN LENGTH(text) < 8 THEN md5(text)
                ELSE list_aggregate(
                       list_transform(range(1, GREATEST(LENGTH(text)-7,1)+1),
                                      i -> md5(substring(text, i::int, 8))),
                       'min') END AS fp
    FROM documents ORDER BY doc_id
    """,
    doc="Document fingerprint: lexicographic-min md5 over char 8-grams "
    "(1-permutation MinHash; md5 is identical in both engines).",
    tags=("text", "dedup"),
)
def q37(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "documents")
        .select("doc_id", fingerprint("text", 8).alias("fp"))
        .orderBy("doc_id")
    )


@declare(
    "q38_cosine_topk",
    oracle="""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1)
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]), 6) AS score
    FROM embeddings e, q
    ORDER BY score DESC, e.vec_id LIMIT 10
    """,
    doc="Brute-force cosine top-k against the vec_id=1 embedding: one "
    "scan + TakeOrderedAndProject, no shuffle; scores double-precision "
    "left-to-right (matches DuckDB), rounded for stable ordering.",
    tags=("similarity",),
)
def q38(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "embeddings")
    query = [float(x) for x in e.filter(F.col("vec_id") == 1).first()["embedding"]]
    return cosine_topk(e, "embedding", "vec_id", query, k=10, round_digits=6)


@declare(
    "q39_argmax",
    oracle="""
    SELECT c_mktsegment, arg_max(c_name, c_custkey) AS top_name
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="max_by/arg_max over a unique ordering key (dialect split: "
    "Spark max_by == DuckDB arg_max).",
    tags=("agg",),
)
def q39(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "customer")
        .groupBy("c_mktsegment")
        .agg(F.max_by("c_name", "c_custkey").alias("top_name"))
        .orderBy("c_mktsegment")
    )


@declare(
    "q40_asof_join",
    oracle="""
    WITH cutoffs AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS cutoff
        FROM events)
    SELECT c.user_id, c.cutoff, MAX(e.ts) AS last_ts
    FROM cutoffs c LEFT JOIN events e
      ON e.user_id = c.user_id AND e.ts <= c.cutoff
    GROUP BY c.user_id, c.cutoff ORDER BY c.user_id, c.cutoff
    """,
    doc="True as-of join (union+window composition, operators.asof): "
    "for each per-user day cutoff, the latest event at-or-before. The "
    "oracle states the same semantics as a range join + group-max.",
    tags=("join", "asof"),
)
def q40(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    cutoffs = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("cutoff")
    ).distinct()
    joined = asof_join(
        cutoffs,
        e.select("user_id", "ts"),
        on="user_id",
        left_ts="cutoff",
        right_ts="ts",
        value_cols=["ts"],
    )
    return joined.select(
        "user_id", "cutoff", F.col("ts_right").alias("last_ts")
    ).orderBy("user_id", "cutoff")


# ---- approximate operators: declared rows-only (engine-tested) --------


@declare(
    "q41_minhash_near_dup",
    oracle=None,
    doc="MinHash-LSH near-duplicate candidate pairs on documents "
    "(64 hashes, 16 bands); approx => rows-only check.",
    tags=("dedup", "approx"),
)
def q41(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    return (
        minhash_lsh_candidates(d, "doc_id", "text")
        .filter(F.col("est_jaccard") >= 0.5)
        .orderBy("id_a", "id_b")
    )


@declare(
    "q42_simhash_near_dup",
    oracle=None,
    doc="SimHash near-duplicate pairs (hamming <= 3 of 64 bits), "
    "16-bit-chunk blocked; approx => rows-only check.",
    tags=("dedup", "approx"),
)
def q42(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    return simhash_near_dups(d, "doc_id", "text").orderBy("id_a", "id_b")


@declare(
    "q43_embedding_near_dup",
    oracle=None,
    doc="Embedding near-duplicates via hyperplane-LSH buckets + exact "
    "cosine >= 0.9; approx => rows-only check.",
    tags=("dedup", "similarity", "approx"),
)
def q43(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "embeddings")
    return (
        embedding_near_dups(e, "vec_id", "embedding", threshold=0.9, num_planes=8)
        .orderBy("id_a", "id_b")
    )


@declare(
    "q44_ann_topk",
    oracle=None,
    doc="LSH-bucketed approximate nearest neighbours (multi-probe "
    "hamming<=1) for the vec_id=1 embedding; approx => rows-only.",
    tags=("similarity", "approx"),
)
def q44(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "embeddings")
    query = [float(x) for x in e.filter(F.col("vec_id") == 1).first()["embedding"]]
    return ann_topk(e, "embedding", "vec_id", query, k=10, num_planes=10)


@declare(
    "q63_ivf_topk",
    oracle=None,
    doc="IVF approximate nearest neighbours: k-means coarse quantizer "
    "(sampled, driver-side) + nprobe-list pruned exact rerank; the "
    "scale path when the corpus is stored partitioned by list id. "
    "Approx => rows-only.",
    tags=("similarity", "approx"),
)
def q63(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.similarity import ivf_topk

    e = load(spark, sf, "embeddings")
    query = [float(x) for x in e.filter(F.col("vec_id") == 1).first()["embedding"]]
    return ivf_topk(
        e, "embedding", "vec_id", query, k=10, n_lists=8, nprobe=3
    )
