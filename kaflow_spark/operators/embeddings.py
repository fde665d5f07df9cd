"""Exact embedding analytics: distributed centroids and
nearest-centroid purity, in pure integer arithmetic.

Float vector aggregation across rows is shuffle-order-dependent
(double addition is not associative), which would break cross-engine
hash attestation AND make production runs non-reproducible. These
operators quantize each component to integer micro-units
(``round(v * 1e6)`` — exact in both Spark and DuckDB for float32
inputs) so every downstream sum/mean/distance is exact bigint
algebra: deterministic under any partitioning, any cluster size, any
engine.

Scale shape: a centroid over n vectors of d dims shuffles at most
(groups × d) partial-sum rows (partial-agg'd groupBy), and
nearest-centroid assignment joins a BROADCAST (k × d) centroid table
— the corpus never shuffles. Exact all-centroid assignment is the
small-k path (quality reports, cluster purity); for large k use the
IVF operators in :mod:`kaflow_spark.operators.similarity`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

MICRO = 1_000_000


def _quantized_dims(
    df: DataFrame, vec_col: str, keep: list[str]
) -> DataFrame:
    """posexplode the vector into (dim, q) rows with q = component in
    exact integer micro-units.

    Deliberately NOT fanned out (operators/parallelism.py): measured
    interleaved A/B at sf0.1 — q91 0.22→0.67 s, q92 1.19→1.47 s with
    a pre-explode repartition. The downstream groupBy's own exchange
    already parallelizes the aggregation, and shuffling raw vector
    rows (round-robin locally sorts them first) costs more than the
    single-task explode saves."""
    return df.select(
        *keep, F.posexplode(vec_col).alias("dim", "_v")
    ).select(
        *keep,
        F.col("dim").cast("bigint").alias("dim"),
        F.round(F.col("_v").cast("double") * MICRO)
        .cast("bigint")
        .alias("_q"),
    )


def label_centroids(
    df: DataFrame, label_col: str, vec_col: str
) -> DataFrame:
    """Per-label centroid in long format: one row per (label, dim)
    with the exact integer mean component ``centroid_micro`` (micro-
    units, division truncates toward zero like DuckDB's ``//``) plus
    the exact ``sum_micro`` and member count ``n`` so callers can
    re-aggregate (centroids are mergeable: sums add).

    Shape at scale: posexplode to (label, dim, q) and ONE partial-
    agg'd groupBy — shuffle volume is labels × dims partial rows per
    partition, independent of vector count."""
    return (
        _quantized_dims(df, vec_col, [label_col])
        .groupBy(label_col, "dim")
        .agg(
            F.sum("_q").alias("sum_micro"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.col(label_col),
            "dim",
            F.expr("sum_micro div n").alias("centroid_micro"),
            "sum_micro",
            "n",
        )
    )


def nearest_centroid_purity(
    df: DataFrame, id_col: str, label_col: str, vec_col: str
) -> DataFrame:
    """Cluster-purity report: assign every vector to its nearest
    per-label centroid (exact squared L2 distance in integer micro²
    units, ties broken by smallest label) and report per label:
    member count ``n``, how many members' nearest centroid is their
    own label ``n_self``, and ``purity_bp`` (basis points) — the
    embedding-quality check a semantic-dedup pipeline runs before
    trusting cluster-level decisions.

    Shape at scale: the centroid table (k × d rows — tiny) is
    BROADCAST into the per-dim join, so the corpus side never
    shuffles for assignment; per-(vector, candidate-label) distances
    are a partial-agg'd groupBy over (id, label_c) keys, then one
    row_number window picks the argmin. Cost is O(n · d · k) compute
    spread across executors with no wide shuffle — the exact-report
    path for small k; large-k assignment belongs to IVF."""
    cent = label_centroids(df, label_col, vec_col).select(
        F.col(label_col).alias("_lc"), "dim", "centroid_micro"
    )
    dims = _quantized_dims(df, vec_col, [id_col, label_col])
    diff = F.col("_q") - F.col("centroid_micro")
    dist = (
        dims.join(F.broadcast(cent), "dim")
        .groupBy(id_col, label_col, "_lc")
        .agg(F.sum(diff * diff).alias("_d2"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_d2"), F.col("_lc"))
    assigned = (
        dist.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(label_col),
            (F.col("_lc") == F.col(label_col)).alias("_self"),
        )
    )
    return assigned.groupBy(label_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_self").cast("bigint")).alias("n_self"),
        F.expr("(sum(cast(_self as bigint)) * 10000) div count(1)").alias(
            "purity_bp"
        ),
    )


def squared_silhouette(
    df: DataFrame, id_col: str, label_col: str, vec_col: str
) -> DataFrame:
    """Centroid-based (simplified) silhouette per label, exact: for
    every vector, ``a`` = squared L2 distance (integer micro² units)
    to its OWN label's centroid and ``b`` = min squared distance to
    any OTHER label's centroid; the per-vector score is
    ``s_bp = (b - a) * 10000 div max(a, b)`` (basis points in
    [-10000, 10000]; 0 when both distances are 0). Per label:
    member count ``n``, ``n_neg`` (members closer to a foreign
    centroid — the misplacement count), and ``mean_s_bp`` (integer
    floor mean). Uses SQUARED distances rather than the classic
    euclidean form — monotone-equivalent per vector for the sign and
    ranking, and it keeps the whole statistic in exact bigint
    algebra (sqrt of an integer is irrational; any float mean would
    be shuffle-order-dependent). The simplified (centroid) variant
    is the standard O(n·k·d) scale path — the textbook silhouette's
    mean pairwise distance is O(n²·d).

    Scale shape: identical to :func:`nearest_centroid_purity` — the
    (k × d) centroid table broadcasts into the per-dim join, the
    corpus never shuffles, per-(vector, label) distances are one
    partial-agg'd groupBy, and both a and b come off that table in
    ONE conditional aggregation (no second pass, no window)."""
    cent = label_centroids(df, label_col, vec_col).select(
        F.col(label_col).alias("_lc"), "dim", "centroid_micro"
    )
    dims = _quantized_dims(df, vec_col, [id_col, label_col])
    diff = F.col("_q") - F.col("centroid_micro")
    dist = (
        dims.join(F.broadcast(cent), "dim")
        .groupBy(id_col, label_col, "_lc")
        .agg(F.sum(diff * diff).alias("_d2"))
    )
    ab = dist.groupBy(id_col, label_col).agg(
        F.max(
            F.when(F.col("_lc") == F.col(label_col), F.col("_d2"))
        ).alias("_a"),
        F.min(
            F.when(F.col("_lc") != F.col(label_col), F.col("_d2"))
        ).alias("_b"),
    )
    scored = ab.select(
        F.col(label_col),
        F.expr(
            "CASE WHEN greatest(_a, _b) = 0 THEN CAST(0 AS BIGINT) "
            "ELSE (_b - _a) * 10000 div greatest(_a, _b) END"
        ).alias("_s_bp"),
    )
    return scored.groupBy(label_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("_s_bp") < 0, F.lit(1)).otherwise(F.lit(0))
        ).alias("n_neg"),
        F.expr("sum(_s_bp) div count(1)").alias("mean_s_bp"),
    )


def gram_matrix(
    df: DataFrame, vec_col: str, scale: int = MICRO
) -> DataFrame:
    """Exact integer second-moment (gram) matrix of an embedding
    column: for every dim pair (i, j), the sum over all vectors of
    q_i * q_j with q = round(component * scale) — the input PCA /
    whitening / covariance needs, computed as bigint algebra so the
    distributed sum is deterministic under any partitioning (a float
    gram would be shuffle-order-dependent).

    Shape at scale: each row expands to its d^2 quantized products
    MAP-SIDE via nested array transforms (no self-join, no shuffle of
    vectors); the partial-agg'd groupBy means the one shuffle carries
    at most d^2 rows per map partition. Overflow bound: |q| <= scale,
    so |sum| <= n * scale^2 — with the default micro scale that holds
    to ~9.2M vectors per int64; at larger corpus sizes pass
    scale=1_000 (milli) or shard + re-aggregate (sums are mergeable).
    """
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * scale).cast("bigint"),
    )
    # own projection first: an inline qv inside the nested lambdas
    # would re-quantize the whole vector once per (i, j) pair.
    # Fanned out: the d^2 struct expansion is map-side work on what is
    # otherwise a single-split scan (unlike _quantized_dims, whose
    # next stage is already an exchange, the expansion here IS the
    # cost — interleaved A/B: q126 2.4s -> 0.8s at sf0.1).
    from kaflow_spark.operators.parallelism import fan_out

    q = fan_out(df).select(qv.alias("_qv"))
    # symmetry: expand only the upper triangle (j >= i) — half the
    # map-side structs — and mirror AFTER aggregation, where the
    # reflection costs d^2 rows instead of n * d^2
    prods = F.flatten(
        F.transform(
            F.col("_qv"),
            lambda xi, i: F.transform(
                F.slice(
                    F.col("_qv"), i + 1, F.size(F.col("_qv")) - i
                ),
                lambda xj, jo: F.struct(
                    i.cast("bigint").alias("i"),
                    (i + jo).cast("bigint").alias("j"),
                    (xi * xj).alias("p"),
                ),
            ),
        )
    )
    upper = (
        q.select(F.explode(prods).alias("_e"))
        .select(
            F.col("_e.i").alias("dim_i"),
            F.col("_e.j").alias("dim_j"),
            F.col("_e.p").alias("_p"),
        )
        .groupBy("dim_i", "dim_j")
        .agg(
            F.sum("_p").alias("sum_prod"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    mirrored = upper.filter(F.col("dim_i") != F.col("dim_j")).select(
        F.col("dim_j").alias("dim_i"),
        F.col("dim_i").alias("dim_j"),
        "sum_prod",
        "n",
    )
    return upper.unionByName(mirrored)


__all__ = ["label_centroids", "nearest_centroid_purity", "gram_matrix", "pca_project", "MICRO"]


def pca_project(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    scale: int = MICRO,
) -> DataFrame:
    """PCA dimensionality reduction for embedding columns — the
    shrink-before-ANN step of a vector pipeline: fit the d x d
    second-moment matrix DISTRIBUTED (gram_matrix — exact, one
    bounded-size shuffle), eigendecompose it driver-side (d x d is
    tiny — 64 x 64 here; same bounded-driver-linear-algebra pattern
    as the IVF k-means fit in operators/similarity.py), then project
    every vector onto the top-k components as a broadcast
    expression — the corpus streams through one scan, nothing
    shuffles.

    Mean-centering uses the exact integer dim means (micro-units);
    the centered covariance is reconstructed from the gram sums:
    cov = (sum_prod/n) - mean_i * mean_j. Eigenvector SIGN is fixed
    deterministically (largest-|component| entry made positive) so
    repeated fits agree; eigenvalues/vectors are float64 — this
    operator is pytest-attested (invariants: orthonormal components,
    descending explained variance, reconstruction bound) rather than
    DuckDB-oracle-hashed, like the other driver-fit path (q63 IVF).

    Returns (id, proj: array<double> length k)."""
    import numpy as np

    g = gram_matrix(df, vec_col, scale=scale)
    rows = g.collect()  # d^2 rows — bounded by dim^2, never corpus size
    if not rows:
        return df.select(
            F.col(id_col), F.array().cast("array<double>").alias("proj")
        ).limit(0)
    d = max(r["dim_i"] for r in rows) + 1
    n = rows[0]["n"]
    s = np.zeros((d, d))
    for r in rows:
        s[r["dim_i"], r["dim_j"]] = r["sum_prod"]
    # exact integer dim sums ride the diagonal pass: recompute means
    # from a second tiny aggregation (d rows)
    sums = (
        df.select(F.posexplode(vec_col).alias("dim", "_v"))
        .groupBy("dim")
        .agg(
            F.sum(F.round(F.col("_v").cast("double") * scale).cast("bigint"))
            .alias("s")
        )
        .collect()
    )
    mu = np.zeros(d)
    for r in sums:
        mu[r["dim"]] = r["s"] / n
    cov = s / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][: int(k)]
    comps = vecs[:, order]  # d x k
    # deterministic sign: make the largest-magnitude entry positive
    for c in range(comps.shape[1]):
        j = int(np.argmax(np.abs(comps[:, c])))
        if comps[j, c] < 0:
            comps[:, c] = -comps[:, c]
    mu_unit = mu / scale  # back to input units

    proj_cols = []
    for c in range(comps.shape[1]):
        expr = None
        for j in range(d):
            term = (F.element_at(F.col(vec_col), j + 1).cast("double")
                    - F.lit(float(mu_unit[j]))) * F.lit(float(comps[j, c]))
            expr = term if expr is None else expr + term
        proj_cols.append(expr)
    return df.select(F.col(id_col), F.array(*proj_cols).alias("proj"))


def int8_quantization_audit(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector int8 absmax scalar-quantization audit (q155): the
    SQ8 compression step vector stores apply before ANN serving.
    Returns (id, sum_q, l1_q, n_sat): quantized checksum, L1 mass and
    saturation count (|q| = 127; a nonzero vector's argmax element
    always saturates — (v*127)/v is exactly 127 in IEEE — while the
    all-zero vector quantizes to all zeros).

    Determinism across engines: float32 widens to float64 exactly,
    the scale expression is the literal ``(x * 127) / amax`` double
    computation, and rounding is spelled floor(y+0.5)/ceil(y-0.5) so
    no engine round() tie-semantics can diverge. Scale posture: one
    narrow per-row projection, zero shuffles, zero UDFs; ``amax`` is
    materialized as its own projection so the per-element lambda
    references an attribute, not a re-evaluated subtree (trap 1)."""
    v = df.select(
        F.col(id_col).cast("bigint").alias(id_col),
        F.expr(f"transform(`{vec_col}`, x -> CAST(x AS DOUBLE))").alias("_v"),
    )
    a = v.select(
        id_col,
        "_v",
        F.expr("array_max(transform(_v, x -> abs(x)))").alias("_amax"),
    )
    s = a.select(
        id_col,
        F.expr(
            "transform(_v, x -> CASE WHEN _amax = 0.0D THEN 0.0D"
            " ELSE (x * 127.0D) / _amax END)"
        ).alias("_sv"),
    )
    q = s.select(
        id_col,
        F.expr(
            "transform(_sv, y -> CASE WHEN y >= 0.0D"
            " THEN CAST(FLOOR(y + 0.5D) AS BIGINT)"
            " ELSE CAST(CEIL(y - 0.5D) AS BIGINT) END)"
        ).alias("_qv"),
    )
    return q.select(
        id_col,
        F.expr("aggregate(_qv, CAST(0 AS BIGINT), (a, x) -> a + x)").alias(
            "sum_q"
        ),
        F.expr(
            "aggregate(_qv, CAST(0 AS BIGINT), (a, x) -> a + abs(x))"
        ).alias("l1_q"),
        F.expr("CAST(size(filter(_qv, x -> abs(x) = 127)) AS BIGINT)").alias(
            "n_sat"
        ),
    )
